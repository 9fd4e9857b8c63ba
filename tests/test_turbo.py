"""Turbo kernels (aux-padded slim upload) vs the legacy per-read path.

The turbo steady-state kernels share the device core with the legacy
kernels but take padded batches + an aux vector (uniform length, real-read
count, sparse N exceptions).  They must be semantically identical: same
distinct-EC-row sets, same hit/overflow flags, and bit-identical 128-bit
key hashes (the host resolver cache is shared across both paths).
"""

import numpy as np
import pytest

from kallisto_tpu.io.fastx import read_fasta
from kallisto_tpu.native import PackedBatch
from kallisto_tpu.ops.pseudoalign import (
    device_index_from_host,
    pack_codes_host,
    pair_key_hash,
    pseudoalign_batch_packed,
    unflatten_ck_host,
)
from kallisto_tpu.ops.turbo import (
    make_aux,
    pseudoalign_pair_turbo,
    pseudoalign_pair_turbo_varlen,
    pseudoalign_single_turbo,
)
from kallisto_tpu.quant.pipeline import (
    _bucket_size,
    _pad_rows,
    _turbo_exceptions,
    _uniform_len,
)

INT32_MAX = 2**31 - 1


def _random_reads(index, data_dir, n, L, rng, n_frac=0.02, varlen=False):
    """Reads sampled from the transcriptome + noise, with sprinkled Ns."""
    seqs = [s for _, s in read_fasta(f"{data_dir}/transcripts.fasta.gz")]
    code = {"A": 0, "C": 1, "G": 2, "T": 3}
    codes = np.full((n, L), 4, np.uint8)
    lens = np.full(n, L, np.int32)
    for i in range(n):
        li = L if not varlen else int(rng.integers(31, L + 1))
        lens[i] = li
        if rng.random() < 0.1:
            codes[i, :li] = rng.integers(0, 4, li)  # noise read
        else:
            t = seqs[rng.integers(0, len(seqs))]
            if len(t) <= li:
                s = t
            else:
                off = rng.integers(0, len(t) - li)
                s = t[off : off + li]
            arr = np.array([code.get(c, 4) for c in s], np.uint8)
            codes[i, : arr.shape[0]] = arr
            lens[i] = arr.shape[0]
        nn = rng.binomial(lens[i], n_frac)
        if nn:
            pos = rng.choice(lens[i], nn, replace=False)
            codes[i, pos] = 4
    codes[np.arange(L)[None, :] >= lens[:, None]] = 4
    packed, nmask, _ = pack_codes_host(codes)
    return PackedBatch(packed, nmask, lens, L)


def _legacy_side(didx, b, k):
    r = pseudoalign_batch_packed(didx, b.packed, b.nmask, b.lens, k=k, L=b.Lp)
    return (
        np.asarray(r.rows),
        np.asarray(r.has_hits),
        np.asarray(r.overflow),
        r,
    )


@pytest.mark.parametrize("varlen", [False, True])
def test_turbo_pair_matches_legacy(test_index, data_dir, varlen):
    rng = np.random.default_rng(7)
    didx = device_index_from_host(test_index)
    k = test_index.k
    n, L = 1000, 56
    b1 = _random_reads(test_index, data_dir, n, L, rng, varlen=varlen)
    b2 = _random_reads(test_index, data_dir, n, L, rng, varlen=varlen)

    rows1, hits1, ovf1, lr1 = _legacy_side(didx, b1, k)
    rows2, hits2, ovf2, lr2 = _legacy_side(didx, b2, k)
    legacy_h = np.asarray(pair_key_hash(lr1, lr2))

    Bp = _bucket_size(n, lo=256)
    exc = _turbo_exceptions((b1, b2), Bp)
    assert exc is not None
    rl = _uniform_len(b1, b2)
    aux = make_aux(n, rl or 0, exc)
    if rl is not None:
        t1, t2, ckflat = pseudoalign_pair_turbo(
            didx, _pad_rows(b1.packed, Bp), _pad_rows(b2.packed, Bp),
            aux, k=k, L=L,
        )
    else:
        lens = np.concatenate([
            _pad_rows(b1.lens.astype(np.uint16), Bp),
            _pad_rows(b2.lens.astype(np.uint16), Bp),
        ])
        t1, t2, ckflat = pseudoalign_pair_turbo_varlen(
            didx, _pad_rows(b1.packed, Bp), _pad_rows(b2.packed, Bp),
            aux, lens, k=k, L=L,
        )

    np.testing.assert_array_equal(np.asarray(t1.rows)[:n], rows1)
    np.testing.assert_array_equal(np.asarray(t2.rows)[:n], rows2)
    np.testing.assert_array_equal(np.asarray(t1.has_hits)[:n], hits1)
    np.testing.assert_array_equal(np.asarray(t2.has_hits)[:n], hits2)
    np.testing.assert_array_equal(np.asarray(t1.overflow)[:n], ovf1)
    np.testing.assert_array_equal(np.asarray(t2.overflow)[:n], ovf2)

    # key histogram covers exactly the legacy per-read hashes; padded reads
    # all collapse onto the (at most one) no-hit key
    uniq_h, occ, first_idx, flags, n_uniq = unflatten_ck_host(
        np.asarray(ckflat)
    )
    assert n_uniq <= occ.shape[0]
    got = {}
    for qi in np.flatnonzero(occ > 0):
        got[(int(uniq_h[qi, 0]), int(uniq_h[qi, 1]))] = int(occ[qi])
    want = {}
    for b in range(n):
        kk = (int(legacy_h[b, 0]), int(legacy_h[b, 1]))
        want[kk] = want.get(kk, 0) + 1
    for kk, cnt in want.items():
        assert got.get(kk, 0) >= cnt
    assert sum(got.values()) == Bp
    extra = {kk: got[kk] - want.get(kk, 0) for kk in got}
    assert sum(extra.values()) == Bp - n
    assert sum(1 for v in extra.values() if v > 0) <= 1


def test_turbo_single_matches_legacy(test_index, data_dir):
    rng = np.random.default_rng(11)
    didx = device_index_from_host(test_index)
    k = test_index.k
    n, L = 777, 56
    b1 = _random_reads(test_index, data_dir, n, L, rng)
    rows1, hits1, ovf1, _ = _legacy_side(didx, b1, k)

    Bp = _bucket_size(n, lo=256)
    exc = _turbo_exceptions((b1,), Bp)
    aux = make_aux(n, int(b1.lens[0]), exc)
    t1, ckflat = pseudoalign_single_turbo(
        didx, _pad_rows(b1.packed, Bp), aux, k=k, L=L
    )
    np.testing.assert_array_equal(np.asarray(t1.rows)[:n], rows1)
    np.testing.assert_array_equal(np.asarray(t1.has_hits)[:n], hits1)
    np.testing.assert_array_equal(np.asarray(t1.overflow)[:n], ovf1)


def test_turbo_overflow_flag(test_index, data_dir):
    """max_rows=1 forces multi-row reads to flag overflow like legacy."""
    rng = np.random.default_rng(3)
    didx = device_index_from_host(test_index)
    k = test_index.k
    n, L = 256, 56
    b1 = _random_reads(test_index, data_dir, n, L, rng, n_frac=0.0)
    r = pseudoalign_batch_packed(
        didx, b1.packed, b1.nmask, b1.lens, k=k, L=b1.Lp, max_rows=1
    )
    exc = _turbo_exceptions((b1,), 256)
    aux = make_aux(n, L, exc)
    t1, _ = pseudoalign_single_turbo(
        didx, b1.packed, aux, k=k, L=L, max_rows=1
    )
    np.testing.assert_array_equal(
        np.asarray(t1.overflow), np.asarray(r.overflow)
    )
    np.testing.assert_array_equal(np.asarray(t1.rows), np.asarray(r.rows))
