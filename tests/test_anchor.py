"""Anchor (two-wave) kernel: exact agreement with the exhaustive turbo
kernel on clean, erroneous, N-containing, and junction-spanning reads."""

import numpy as np
import pytest

from kallisto_tpu.ops.anchor import (
    n_anchors_for,
    pseudoalign_pair_anchor,
    pseudoalign_single_anchor,
)
from kallisto_tpu.ops.pseudoalign import device_index_from_host, unflatten_ck_host
from kallisto_tpu.ops.turbo import (
    make_aux,
    pseudoalign_pair_turbo,
    pseudoalign_single_turbo,
)


@pytest.fixture(scope="module")
def didx(test_index):
    return device_index_from_host(test_index)


def _sim_reads(test_index, n, rlen, seed, err=0.005, n_rate=0.005,
               junk_rate=0.02):
    """Reads sampled from the transcriptome with errors, Ns, and pure junk
    (never-mapping) rows."""
    rng = np.random.default_rng(seed)
    codes = np.empty((n, rlen), np.uint8)
    pool = test_index.target_seq
    off = test_index.target_seq_off
    T = off.shape[0] - 1
    for i in range(n):
        if rng.random() < junk_rate:
            codes[i] = rng.integers(0, 4, rlen)
            continue
        t = int(rng.integers(0, T))
        L = int(off[t + 1] - off[t])
        if L <= rlen:
            codes[i] = rng.integers(0, 4, rlen)
            continue
        s = int(rng.integers(0, L - rlen))
        r = pool[off[t] + s : off[t] + s + rlen].copy()
        if rng.random() < 0.5:
            r = np.where(r < 4, 3 - r, r)[::-1].copy()
        ne = rng.binomial(rlen, err)
        if ne:
            pos = rng.integers(0, rlen, ne)
            r[pos] = (r[pos] + rng.integers(1, 4, ne)) % 4
        nn = rng.binomial(rlen, n_rate)
        if nn:
            r[rng.integers(0, rlen, nn)] = 4
        codes[i] = r
    return codes


def _pack(codes, Lp):
    from kallisto_tpu.ops.pseudoalign import pack_codes_host

    B, L = codes.shape
    if Lp > L:
        codes = np.concatenate(
            [codes, np.full((B, Lp - L), 4, np.uint8)], axis=1
        )
    packed, nmask, _ = pack_codes_host(codes)
    return packed, nmask


def _exc_from_codes(codes, Bp, side, Lp):
    r, c = np.nonzero(codes == 4)
    return (side * Bp + r.astype(np.int64)) * Lp + c


def _norm_ck(ck):
    uniq_h, occ, first_idx, flags, n_uniq = unflatten_ck_host(np.asarray(ck))
    m = occ > 0
    order = np.argsort(first_idx[m])
    return (uniq_h[m][order].tolist(), occ[m][order].tolist(),
            first_idx[m][order].tolist(), flags[m][order].tolist())


@pytest.mark.parametrize("rlen", [50, 62])
def test_pair_anchor_matches_turbo(test_index, didx, rlen):
    k = 31
    B = 1024
    Lp = ((rlen + 7) // 8) * 8
    c1 = _sim_reads(test_index, B, rlen, seed=1)
    c2 = _sim_reads(test_index, B, rlen, seed=2)
    p1, _ = _pack(c1, Lp)
    p2, _ = _pack(c2, Lp)
    exc = np.concatenate([
        _exc_from_codes(np.pad(c1, ((0, 0), (0, Lp - rlen)),
                               constant_values=4)[:, :Lp], B, 0, Lp),
        _exc_from_codes(np.pad(c2, ((0, 0), (0, Lp - rlen)),
                               constant_values=4)[:, :Lp], B, 1, Lp),
    ])
    # only in-read Ns are exceptions; padding is masked by rlen
    exc = exc[(exc % Lp) < rlen]
    aux = make_aux(B, rlen, exc)
    t1, t2, ckt = pseudoalign_pair_turbo(didx, p1, p2, aux, k=k, L=Lp)
    na = n_anchors_for(Lp, k)
    # wave2_denom=1: every failing read fits the wave-2 sub-batch, so
    # per-read outputs are directly comparable (denom>1 budgets are covered
    # by the overflow test below)
    a1, a2, cka = pseudoalign_pair_anchor(
        didx, p1, p2, aux, k=k, L=Lp, n_anchors=na, wave2_denom=1
    )
    # per-read row sets + flags identical
    for f in ("rows", "n_rows", "has_hits", "overflow"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a1, f)), np.asarray(getattr(t1, f)), err_msg=f
        )
        np.testing.assert_array_equal(
            np.asarray(getattr(a2, f)), np.asarray(getattr(t2, f)), err_msg=f
        )
    assert _norm_ck(cka) == _norm_ck(ckt)


def test_single_anchor_matches_turbo(test_index, didx):
    k = 31
    B = 2048
    rlen = 50
    Lp = 56
    c1 = _sim_reads(test_index, B, rlen, seed=3)
    p1, _ = _pack(c1, Lp)
    exc = _exc_from_codes(
        np.pad(c1, ((0, 0), (0, Lp - rlen)), constant_values=4)[:, :Lp],
        B, 0, Lp,
    )
    exc = exc[(exc % Lp) < rlen]
    aux = make_aux(B, rlen, exc)
    t1, ckt = pseudoalign_single_turbo(didx, p1, aux, k=k, L=Lp)
    a1, cka = pseudoalign_single_anchor(
        didx, p1, aux, k=k, L=Lp, n_anchors=n_anchors_for(Lp, k),
        wave2_denom=1,
    )
    for f in ("rows", "n_rows", "has_hits", "overflow"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a1, f)), np.asarray(getattr(t1, f)), err_msg=f
        )
    assert _norm_ck(cka) == _norm_ck(ckt)


def test_anchor_wave2_overflow_flags_batch(test_index, didx):
    """All-junk reads overflow the wave-2 budget -> n_uniq > max_keys."""
    k = 31
    B = 256
    rlen = 50
    Lp = 56
    rng = np.random.default_rng(9)
    c1 = rng.integers(0, 4, (B, rlen)).astype(np.uint8)
    p1, _ = _pack(c1, Lp)
    aux = make_aux(B, rlen, np.empty(0, np.int64))
    _, cka = pseudoalign_single_anchor(
        didx, p1, aux, k=k, L=Lp, n_anchors=2, wave2_denom=4,
        max_keys=1024,
    )
    *_rest, n_uniq = unflatten_ck_host(np.asarray(cka))
    assert n_uniq > 1024
