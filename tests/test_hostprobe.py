"""Host wave-1 probe (native/ktio.cpp ktio_wave1 + ops/hostprobe.py):
soundness of host verification against the exhaustive device evaluation,
and end-to-end quant parity with the probe on vs off."""

import os

import numpy as np
import pytest

from kallisto_tpu.native import PackedBatch, available
from kallisto_tpu.ops.pseudoalign import (
    device_index_from_host,
    pseudoalign_batch_packed,
)

from test_anchor import _pack, _sim_reads

pytestmark = pytest.mark.skipif(
    not available(), reason="native ktio unavailable"
)


def _batch(codes, Lp):
    packed, nmask = _pack(codes, Lp)
    lens = np.full(codes.shape[0], codes.shape[1], np.int32)
    return PackedBatch(packed, nmask, lens, Lp)


def _device_truth(test_index, b, k):
    didx = device_index_from_host(test_index)
    r = pseudoalign_batch_packed(
        didx, b.packed, b.nmask, b.lens, k=k, L=b.Lp
    )
    return {f: np.asarray(getattr(r, f)) for f in r._fields}


@pytest.mark.parametrize("tail_mode", ["none", "strand", "pos"])
def test_hostprobe_pair_sound_vs_device(test_index, tail_mode):
    """Every host-VERIFIED pair's key content must equal what the
    exhaustive device evaluation produces for that read (the stretch
    theorem made testable); occurrence counts must partition the batch."""
    from kallisto_tpu.ops.hostprobe import HostProbe

    k, rlen, B = 31, 50, 2048
    Lp = 56
    c1 = _sim_reads(test_index, B, rlen, seed=11)
    c2 = _sim_reads(test_index, B, rlen, seed=12)
    b1, b2 = _batch(c1, Lp), _batch(c2, Lp)
    sk = tail_mode in ("strand", "pos")
    pk = tail_mode == "pos"
    hp = HostProbe(
        test_index, strand_key=sk, pos_key=pk, pos_fl=180 if pk else -1,
    )
    hk = hp.probe_pair(b1, b2, rlen)

    t1 = _device_truth(test_index, b1, k)
    t2 = _device_truth(test_index, b2, k)
    R = hp.R
    fail = np.zeros(B, bool)
    fail[hk.fail_idx] = True
    assert int(hk.occ.sum()) + int(fail.sum()) == B
    assert fail.sum() < B  # some reads verify

    # reconstruct the expected exemplar for each key's first-seen read
    # from the DEVICE truth and compare (verified => full-eval identical)
    for kk in range(hk.h128.shape[0]):
        i = int(hk.first_idx[kk])
        assert not fail[i]
        ex = hk.exemplars[kk]
        np.testing.assert_array_equal(ex[:R], t1["rows"][i], err_msg="rows1")
        np.testing.assert_array_equal(
            ex[R : 2 * R], t2["rows"][i], err_msg="rows2"
        )
        flags = int(ex[2 * R])
        assert (flags & 1) == int(t1["has_hits"][i])
        assert (flags & 2) == 2 * int(t2["has_hits"][i])
        assert (flags & 12) == 0
        o = 2 * R + 1
        if sk or pk:
            assert ex[o] == t1["f_block"][i]
            assert ex[o + 1] == int(t1["f_strand"][i])
            assert ex[o + 2] == t2["f_block"][i]
            assert ex[o + 3] == int(t2["f_strand"][i])
            o += 4
        if pk:
            assert ex[o] == t1["f_upos"][i]
            assert ex[o + 1] == t1["f_rpos"][i]
            assert ex[o + 2] == t2["f_upos"][i]
            assert ex[o + 3] == t2["f_rpos"][i]

    # dedup is exact: grouping the device truth of verified reads by key
    # content reproduces the host histogram
    def key_of(i):
        return (
            t1["rows"][i].tobytes(), t2["rows"][i].tobytes(),
            int(t1["has_hits"][i]), int(t2["has_hits"][i]),
            (int(t1["f_block"][i]), int(t1["f_strand"][i]),
             int(t2["f_block"][i]), int(t2["f_strand"][i])) if sk or pk
            else 0,
            (int(t1["f_upos"][i]), int(t2["f_upos"][i])) if pk else 0,
        )

    groups = {}
    for i in range(B):
        if fail[i]:
            continue
        groups.setdefault(key_of(i), []).append(i)
    assert len(groups) == hk.h128.shape[0]
    host_hist = {
        (int(hk.first_idx[kk])): int(hk.occ[kk])
        for kk in range(hk.h128.shape[0])
    }
    for idxs in groups.values():
        assert host_hist[min(idxs)] == len(idxs)


def test_hostprobe_single_sound_vs_device(test_index):
    from kallisto_tpu.ops.hostprobe import HostProbe

    k, rlen, B = 31, 50, 2048
    Lp = 56
    c1 = _sim_reads(test_index, B, rlen, seed=13)
    b1 = _batch(c1, Lp)
    hp = HostProbe(test_index)
    hk = hp.probe_single(b1, rlen)
    t1 = _device_truth(test_index, b1, k)
    R = hp.R
    fail = np.zeros(B, bool)
    fail[hk.fail_idx] = True
    assert int(hk.occ.sum()) + int(fail.sum()) == B
    for kk in range(hk.h128.shape[0]):
        i = int(hk.first_idx[kk])
        assert not fail[i]
        np.testing.assert_array_equal(hk.exemplars[kk][:R], t1["rows"][i])
        assert (int(hk.exemplars[kk][R]) & 1) == int(t1["has_hits"][i])


@pytest.mark.parametrize("mode", ["paired_pos", "single_strand"])
def test_quant_hw1_parity_end_to_end(tmp_path, data_dir, mode, monkeypatch):
    """run_quant with the host probe ON vs OFF: bit-identical outputs
    (counts, EC sets/order, est_counts) through filter configurations."""
    from kallisto_tpu.common import Options
    from kallisto_tpu.index import build_index
    from kallisto_tpu.quant.pipeline import run_quant

    index = build_index(
        [os.path.join(data_dir, "transcripts.fasta.gz")], k=31
    )
    if mode == "paired_pos":
        opt = Options(
            files=[os.path.join(data_dir, "reads_1.fastq.gz"),
                   os.path.join(data_dir, "reads_2.fastq.gz")],
            fld_mean=180.0, fld_sd=20.0, plaintext=True,
        )
    else:
        opt = Options(
            files=[os.path.join(data_dir, "reads_1.fastq.gz")],
            single_end=True, fld_mean=180.0, fld_sd=20.0,
            single_overhang=True, strand="fr", plaintext=True,
        )

    res = {}
    for hw in ("0", "1"):
        monkeypatch.setenv("KALLISTO_TPU_HOST_WAVE1", hw)
        res[hw] = run_quant(opt, index=index)
    a, b = res["0"], res["1"]
    np.testing.assert_array_equal(a.counts, b.counts)
    assert len(a.ec_sets) == len(b.ec_sets)
    for sa, sb in zip(a.ec_sets, b.ec_sets):
        np.testing.assert_array_equal(sa, sb)
    np.testing.assert_array_equal(a.est_counts, b.est_counts)
    assert a.num_pseudoaligned == b.num_pseudoaligned


def test_halffail_kernel_matches_turbo(test_index):
    """pseudoalign_pair_halffail (failed mate packed + verified-mate
    summary) produces the same per-read side results and key histogram as
    the exhaustive both-mate turbo evaluation."""
    from kallisto_tpu.ops.hostprobe import HostProbe
    from kallisto_tpu.ops.turbo import (
        make_aux,
        pseudoalign_pair_halffail,
        pseudoalign_pair_turbo,
    )
    from test_anchor import _norm_ck

    k, rlen, B = 31, 50, 2048
    Lp = 56
    # heavy errors -> plenty of half-fail pairs
    c1 = _sim_reads(test_index, B, rlen, seed=31, err=0.02)
    c2 = _sim_reads(test_index, B, rlen, seed=32, err=0.02)
    b1, b2 = _batch(c1, Lp), _batch(c2, Lp)
    hp = HostProbe(test_index)
    hk = hp.probe_pair(b1, b2, rlen)
    half = np.flatnonzero(hk.fail_side != 3)
    assert half.size > 50  # the fixture exercises the path
    sub = hk.fail_idx[half]
    side = hk.fail_side[half]
    n = sub.shape[0]

    m1 = (side == 1)[:, None]
    pkf = np.where(m1, b1.packed[sub], b2.packed[sub])
    nmf = np.where(m1, b1.nmask[sub], b2.nmask[sub])
    Lpx = Lp
    bits = np.unpackbits(nmf, axis=1, bitorder="little")[:, :Lpx]
    bits[:, rlen:] = 0
    r, c = np.nonzero(bits)
    exc = r.astype(np.int64) * Lpx + c
    aux = make_aux(n, rlen, exc)
    h1, h2, ckh = pseudoalign_pair_halffail(
        didx := __import__(
            "kallisto_tpu.ops.pseudoalign", fromlist=["device_index_from_host"]
        ).device_index_from_host(test_index),
        pkf, hk.fail_vsum[half], side.astype(np.int32), aux, k=k, L=Lp,
        rl=rlen,
    )

    # exhaustive truth on the same pairs
    bits1 = np.unpackbits(b1.nmask[sub], axis=1, bitorder="little")[:, :Lpx]
    bits1[:, rlen:] = 0
    bits2 = np.unpackbits(b2.nmask[sub], axis=1, bitorder="little")[:, :Lpx]
    bits2[:, rlen:] = 0
    r1n, c1n = np.nonzero(bits1)
    r2n, c2n = np.nonzero(bits2)
    exc2 = np.concatenate([
        r1n.astype(np.int64) * Lpx + c1n,
        (n + r2n.astype(np.int64)) * Lpx + c2n,
    ])
    aux2 = make_aux(n, rlen, exc2)
    t1, t2, ckt = pseudoalign_pair_turbo(
        didx, b1.packed[sub], b2.packed[sub], aux2, k=k, L=Lp, rl=rlen,
    )
    for f in ("rows", "n_rows", "has_hits", "f_block", "f_upos", "f_rpos",
              "f_strand", "rng"):
        np.testing.assert_array_equal(
            np.asarray(getattr(h1, f)), np.asarray(getattr(t1, f)),
            err_msg=f"r1.{f}",
        )
        np.testing.assert_array_equal(
            np.asarray(getattr(h2, f)), np.asarray(getattr(t2, f)),
            err_msg=f"r2.{f}",
        )
    assert _norm_ck(ckh) == _norm_ck(ckt)
