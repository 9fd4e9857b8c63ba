"""FLD position filter on the compact fast path: byte-exact goldens.

With an explicit -l (and --single-overhang off) the reference drops
transcripts whose implied fragment overhangs the transcript end, using the
first mapping k-mer's position -- for single-end reads and for paired
reads where exactly one mate mapped (reference: ProcessReads.cpp:1094-1136
+ KmerIndex::findPosition, src/KmerIndex.cpp:2174-2292).

Here the filter rides the compact per-key path: the key carries the
read's RANK among its first-hit block's position thresholds
(ops/pseudoalign.py pos_filter_rank), so reads sharing a key provably
share the filtered set.  These tests pin the whole construction against
reference-binary goldens:

- quant_halfmapped:    paired -l 180 -s 20, mate 2 = shuffled bases
  (unmapped), so every aligned fragment takes the one-mate path
- quant_halfmapped_fr: same + --fr-stranded (position filter FIRST, then
  strand filter -- reference order)
- quant_single_r2:     single-end -l 150 -s 25 on reads_2 (reverse-strand
  heavy; exercises the g+ = upos + rpos threshold table)
"""

import os

import numpy as np
import pytest

from kallisto_tpu.common import Options
from kallisto_tpu.quant.pipeline import run_quant


def _quant(data_dir, index, out, **kw):
    opt = Options(output_dir=out, **kw)
    return run_quant(opt, index=index)


def test_halfmapped_paired_pos_filter(test_index, data_dir, golden_dir, tmp_path):
    out = str(tmp_path / "hm")
    _quant(
        data_dir, test_index, out,
        files=[
            os.path.join(data_dir, "reads_1.fastq.gz"),
            os.path.join(data_dir, "halfmapped_2.fastq.gz"),
        ],
        fld_mean=180, fld_sd=20,
    )
    mine = open(os.path.join(out, "abundance.tsv")).read()
    gold = open(
        os.path.join(golden_dir, "quant_halfmapped", "abundance.tsv")
    ).read()
    assert mine == gold


def test_halfmapped_paired_pos_plus_strand(
    test_index, data_dir, golden_dir, tmp_path
):
    out = str(tmp_path / "hmfr")
    _quant(
        data_dir, test_index, out,
        files=[
            os.path.join(data_dir, "reads_1.fastq.gz"),
            os.path.join(data_dir, "halfmapped_2.fastq.gz"),
        ],
        fld_mean=180, fld_sd=20, strand="fr",
    )
    mine = open(os.path.join(out, "abundance.tsv")).read()
    gold = open(
        os.path.join(golden_dir, "quant_halfmapped_fr", "abundance.tsv")
    ).read()
    assert mine == gold


def test_single_end_reverse_heavy(test_index, data_dir, golden_dir, tmp_path):
    out = str(tmp_path / "se2")
    _quant(
        data_dir, test_index, out,
        files=[os.path.join(data_dir, "reads_2.fastq.gz")],
        single_end=True, fld_mean=150, fld_sd=25,
    )
    mine = open(os.path.join(out, "abundance.tsv")).read()
    gold = open(
        os.path.join(golden_dir, "quant_single_r2", "abundance.tsv")
    ).read()
    assert mine == gold


def test_single_end_compact_equals_full(test_index, data_dir, tmp_path):
    """The compact per-key pos filter must agree with the per-read path
    (forced via --union-like full mode? no -- via bias-free full mode
    using do_union=False but the full path through pseudobam)."""
    out_a = str(tmp_path / "a")
    res_a = _quant(
        data_dir, test_index, out_a,
        files=[os.path.join(data_dir, "reads_1.fastq.gz")],
        single_end=True, fld_mean=180, fld_sd=20,
    )
    # pseudobam forces the per-read full path (same filters applied on
    # host arrays), without changing counting semantics
    out_b = str(tmp_path / "b")
    res_b = _quant(
        data_dir, test_index, out_b,
        files=[os.path.join(data_dir, "reads_1.fastq.gz")],
        single_end=True, fld_mean=180, fld_sd=20, pseudobam=True,
    )
    np.testing.assert_array_equal(res_a.counts, res_b.counts)
    np.testing.assert_allclose(res_a.est_counts, res_b.est_counts, rtol=0, atol=0)
