"""Hexamer bias correction tests.

No reference goldens exist for --bias: kallisto 0.51.1's
KmerIndex::loadTranscriptSequences is a stub that loads nothing
(reference: src/KmerIndex.cpp:2315-2323), so `kallisto quant --bias`
segfaults in update_eff_lens.  This module instead validates our
implementation against direct scalar transcriptions of the reference
formulas (src/weights.cpp:81-218, src/MinCollector.cpp:653-766).
"""

import os

import numpy as np
import pytest

from kallisto_tpu.common import Options
from kallisto_tpu.quant.bias import (
    MIN_ALPHA,
    NUM_6MERS,
    TranscriptHexamers,
    update_eff_lens,
)
from kallisto_tpu.quant.pipeline import run_quant


def _hexamer_int(codes, revcomp):
    """Scalar port of hexamerToInt (src/MinCollector.cpp:653-678)."""
    hex_ = 0
    if not revcomp:
        for i in range(6):
            hex_ = (hex_ << 2) + int(codes[i])
    else:
        for i in range(6):
            hex_ += (3 - int(codes[i])) << (2 * i)
    return hex_


def _update_eff_lens_scalar(means, bias5, index, alpha, eff_lens, strand):
    """Direct per-transcript transcription of src/weights.cpp:101-218."""
    strand_specific = strand in ("fr", "rf")
    T = index.num_trans
    dbias5 = np.zeros(NUM_6MERS)
    off = index.target_seq_off
    bias_data_norm = float(bias5.sum())
    for i in range(T):
        if int(index.target_lens[i]) < means[i] or alpha[i] < MIN_ALPHA:
            continue
        contrib = (1.0 if strand_specific else 0.5) * alpha[i] / eff_lens[i]
        cs = index.target_seq[off[i]:off[i + 1]]
        seqlen = cs.shape[0]
        if not strand_specific or strand == "fr":
            fwlimit = int(max(seqlen - means[i] - 6, 0.0))
            for j in range(fwlimit):
                dbias5[_hexamer_int(cs[j:j + 6], False)] += contrib
        if not strand_specific or strand == "rf":
            bwlimit = int(max(means[i] - 6, 0.0))
            for j in range(bwlimit, seqlen - 6):
                dbias5[_hexamer_int(cs[j:j + 6], True)] += contrib
    bias_alpha_norm = float(dbias5.sum())
    biaslens = np.zeros(T)
    for i in range(T):
        efflen = 0.0
        if int(index.target_lens[i]) >= means[i] and alpha[i] >= MIN_ALPHA:
            cs = index.target_seq[off[i]:off[i + 1]]
            seqlen = cs.shape[0]
            if not strand_specific or strand == "fr":
                fwlimit = int(max(seqlen - means[i] - 6, 0.0))
                for j in range(fwlimit):
                    h = _hexamer_int(cs[j:j + 6], False)
                    efflen += bias5[h] / dbias5[h]
            if not strand_specific or strand == "rf":
                bwlimit = int(max(means[i] - 6, 0.0))
                for j in range(bwlimit, seqlen - 6):
                    h = _hexamer_int(cs[j:j + 6], True)
                    efflen += bias5[h] / dbias5[h]
            if not strand_specific:
                efflen *= 0.5 * bias_alpha_norm / bias_data_norm
            else:
                efflen *= bias_alpha_norm / bias_data_norm
        biaslens[i] = efflen if efflen > means[i] else eff_lens[i]
    return biaslens, dbias5


@pytest.mark.parametrize("strand", [None, "fr", "rf"])
def test_update_eff_lens_matches_scalar_port(test_index, strand):
    rng = np.random.default_rng(7)
    T = test_index.num_trans
    alpha = rng.random(T) * 1000
    alpha[0] = 0.0  # below MIN_ALPHA: skipped
    lens = test_index.target_lens.astype(np.float64)
    means = np.minimum(178.02, lens)  # typical conditional means
    eff_lens = lens - means + 1
    bias5 = rng.integers(0, 50, NUM_6MERS).astype(np.int64)

    hx = TranscriptHexamers(test_index)
    got, got_db = update_eff_lens(
        means, bias5, hx, test_index.target_lens, alpha, eff_lens, strand
    )
    want, want_db = _update_eff_lens_scalar(
        means, bias5, test_index, alpha, eff_lens, strand
    )
    np.testing.assert_allclose(got_db, want_db, rtol=1e-12)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_quant_bias_end_to_end(test_index, data_dir, tmp_path):
    files = [
        os.path.join(data_dir, "reads_1.fastq.gz"),
        os.path.join(data_dir, "reads_2.fastq.gz"),
    ]
    plain = run_quant(Options(files=files, output_dir=""), index=test_index)
    biased = run_quant(
        Options(files=files, output_dir="", bias=True), index=test_index
    )
    # pseudoalignment itself is unchanged
    assert biased.num_pseudoaligned == plain.num_pseudoaligned
    np.testing.assert_array_equal(biased.counts, plain.counts)
    # bias correction changed the effective lengths and abundances
    assert not np.allclose(biased.eff_lens, plain.eff_lens)
    assert np.all(np.isfinite(biased.eff_lens)) and np.all(biased.eff_lens > 0)
    assert np.all(np.isfinite(biased.tpm))
    np.testing.assert_allclose(biased.tpm.sum(), 1e6, rtol=1e-9)
    # counts mass is conserved by the EM
    np.testing.assert_allclose(
        biased.est_counts.sum(), plain.est_counts.sum(), rtol=1e-6
    )


def test_device_hexamers_match_host_port(test_index, data_dir):
    import jax.numpy as jnp

    from kallisto_tpu.io.fastx import packed_paired_batches
    from kallisto_tpu.ops.pseudoalign import (
        bias_hexamers,
        bias_tables_from_host,
        device_index_from_host,
        pseudoalign_batch_packed,
    )

    k = test_index.k
    didx = device_index_from_host(test_index)
    bt = bias_tables_from_host(test_index)
    b1, b2 = next(packed_paired_batches(
        os.path.join(data_dir, "reads_1.fastq.gz"),
        os.path.join(data_dir, "reads_2.fastq.gz"), 2000, k,
    ))
    r1 = pseudoalign_batch_packed(didx, b1.packed, b1.nmask, b1.lens, k=k, L=b1.Lp)
    r2 = pseudoalign_batch_packed(didx, b2.packed, b2.nmask, b2.lens, k=k, L=b2.Lp)
    hx = np.asarray(bias_hexamers(bt, r1, r2.has_hits, k=k))

    f_uid = np.asarray(r1.f_uid)
    f_block = np.asarray(r1.f_block)
    f_upos = np.asarray(r1.f_upos)
    f_rpos = np.asarray(r1.f_rpos)
    f_strand = np.asarray(r1.f_strand)
    ok = np.asarray(r1.has_hits) & np.asarray(r2.has_hits)

    pre, post = 2, 4
    useq, uoff = test_index.unitig_seq, test_index.unitig_seq_off
    n_checked = 0
    for r in range(b1.n):
        # scalar port of getPreSeq (src/MinCollector.cpp:688-721)
        want = -1
        if ok[r]:
            cstart = int(test_index.block_start[f_block[r]])
            clen = int(test_index.block_end[f_block[r]]) - cstart
            pos = int(f_upos[r]) - cstart
            p = int(f_rpos[r])
            seq = useq[uoff[f_uid[r]]:uoff[f_uid[r] + 1]]
            if f_strand[r] and pos - p >= pre:
                s = cstart + pos - p - pre
                want = _hexamer_int(seq[s:s + 6], True)
            elif (not f_strand[r]) and (clen - 1 - pos - p) >= pre:
                s = cstart + (pos + p) + k - post
                want = _hexamer_int(seq[s:s + 6], False)
        assert hx[r] == want, r
        n_checked += 1 if want >= 0 else 0
    assert n_checked > 500  # the fixture data must actually exercise this
