"""Golden parity tests vs reference kallisto 0.51.1 outputs.

The goldens in tests/golden/ were produced by the reference binary (built
from /root/reference) on the bundled test data with -t 1.  Our outputs are
expected to be BYTE-IDENTICAL for abundance.tsv and counts.txt.
"""

import os

import numpy as np
import pytest

from kallisto_tpu.common import Options
from kallisto_tpu.quant.pipeline import run_quant


@pytest.fixture(scope="module")
def paired_result(test_index, data_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("quant_paired"))
    opt = Options(
        files=[
            os.path.join(data_dir, "reads_1.fastq.gz"),
            os.path.join(data_dir, "reads_2.fastq.gz"),
        ],
        output_dir=out,
        write_index=True,
        batch_size=4096,  # multiple batches on purpose
    )
    return run_quant(opt, index=test_index), out


def test_paired_abundance_byte_exact(paired_result, golden_dir):
    _, out = paired_result
    mine = open(os.path.join(out, "abundance.tsv")).read()
    golden = open(os.path.join(golden_dir, "quant_paired", "abundance.tsv")).read()
    assert mine == golden


def test_paired_counts_byte_exact(paired_result, golden_dir):
    _, out = paired_result
    mine = open(os.path.join(out, "counts.txt")).read()
    golden = open(os.path.join(golden_dir, "quant_paired_wi", "counts.txt")).read()
    assert mine == golden


def test_paired_run_stats(paired_result):
    res, _ = paired_result
    # golden run_info.json: n_processed 10000, n_pseudoaligned 9413, n_unique 7174
    assert res.num_processed == 10000
    assert res.num_pseudoaligned == 9413
    assert res.num_unique == 7174


def test_single_end_abundance_byte_exact(test_index, data_dir, golden_dir, tmp_path):
    out = str(tmp_path / "quant_single")
    opt = Options(
        files=[os.path.join(data_dir, "reads_1.fastq.gz")],
        output_dir=out,
        single_end=True,
        fld_mean=180,
        fld_sd=20,
        batch_size=4096,
    )
    res = run_quant(opt, index=test_index)
    mine = open(os.path.join(out, "abundance.tsv")).read()
    golden = open(os.path.join(golden_dir, "quant_single", "abundance.tsv")).read()
    assert mine == golden
    assert res.num_pseudoaligned == 9034  # golden run_info.json
    assert res.num_unique == 6724


def test_batch_size_invariance(test_index, data_dir):
    """EC counts must not depend on device batch boundaries."""
    files = [
        os.path.join(data_dir, "reads_1.fastq.gz"),
        os.path.join(data_dir, "reads_2.fastq.gz"),
    ]
    r1 = run_quant(Options(files=files, batch_size=10000), index=test_index)
    r2 = run_quant(Options(files=files, batch_size=1536), index=test_index)
    np.testing.assert_array_equal(r1.counts, r2.counts)
    assert [s.tolist() for s in r1.ec_sets] == [s.tolist() for s in r2.ec_sets]
    np.testing.assert_allclose(r1.est_counts, r2.est_counts, rtol=0, atol=0)


@pytest.mark.parametrize(
    "priors_file,golden_name",
    [("priors.txt", "abundance.tsv"),           # raw counts -> pseudocount norm
     ("priors_prob.txt", "abundance_prob.tsv")],  # probabilities, used as-is
)
def test_priors_abundance_byte_exact(
    test_index, data_dir, golden_dir, tmp_path, priors_file, golden_name
):
    """-p/--priors initializes EM alpha (reference: EMAlgorithm.h:52-93).

    Goldens from reference `quant --plaintext -p <file>` on the bundled data.
    """
    out = str(tmp_path / "quant_priors")
    opt = Options(
        files=[
            os.path.join(data_dir, "reads_1.fastq.gz"),
            os.path.join(data_dir, "reads_2.fastq.gz"),
        ],
        output_dir=out,
        priors=os.path.join(data_dir, priors_file),
    )
    run_quant(opt, index=test_index)
    mine = open(os.path.join(out, "abundance.tsv")).read()
    golden = open(os.path.join(golden_dir, "quant_priors", golden_name)).read()
    assert mine == golden


def test_priors_length_mismatch_falls_back_to_uniform(
    test_index, data_dir, golden_dir, tmp_path
):
    """A wrong-length priors file warns and uses uniform priors
    (reference: EMAlgorithm::set_priors, src/EMAlgorithm.h:83-93)."""
    bad = tmp_path / "bad_priors.txt"
    bad.write_text("1\n2\n3\n")
    out = str(tmp_path / "quant_badpriors")
    opt = Options(
        files=[
            os.path.join(data_dir, "reads_1.fastq.gz"),
            os.path.join(data_dir, "reads_2.fastq.gz"),
        ],
        output_dir=out,
        priors=str(bad),
    )
    run_quant(opt, index=test_index)
    mine = open(os.path.join(out, "abundance.tsv")).read()
    golden = open(os.path.join(golden_dir, "quant_paired", "abundance.tsv")).read()
    assert mine == golden
