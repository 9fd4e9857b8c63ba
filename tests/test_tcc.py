"""quant-tcc golden parity: all matrix outputs byte-exact vs reference."""

import os

import pytest

from kallisto_tpu.common import Options
from kallisto_tpu.quant.tcc import run_quant_tcc

FILES = [
    "matrix.abundance.mtx",
    "matrix.abundance.tpm.mtx",
    "matrix.efflens.mtx",
    "matrix.fld.tsv",
    "matrix.abundance.gene.mtx",
    "matrix.abundance.gene.tpm.mtx",
    "genes.txt",
    "transcripts.txt",
    "transcript_lengths.txt",
]


@pytest.fixture(scope="module")
def tcc_out(test_index, data_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tcc"))
    opt = Options(
        ec_file=os.path.join(data_dir, "tcc_test.ec"),
        tcc_file=os.path.join(data_dir, "tcc_test.mtx"),
        fld_mean=180,
        fld_sd=20,
        genemap=os.path.join(data_dir, "t2g.txt"),
        output_dir=out,
    )
    run_quant_tcc(opt, index=test_index)
    return out


@pytest.mark.parametrize("fname", FILES)
def test_tcc_output_byte_exact(tcc_out, golden_dir, fname):
    mine = open(os.path.join(tcc_out, fname)).read()
    golden = open(os.path.join(golden_dir, "tcc", fname)).read()
    assert mine == golden


def test_tcc_no_efflens_mode(test_index, data_dir, tmp_path):
    # without -l/-f: effective lengths are all 1 (reference: main.cpp:3014-3016)
    opt = Options(
        ec_file=os.path.join(data_dir, "tcc_test.ec"),
        tcc_file=os.path.join(data_dir, "tcc_test.mtx"),
        output_dir=str(tmp_path / "out"),
    )
    res = run_quant_tcc(opt, index=test_index)
    assert (res.eff_lens == 1.0).all()


def test_tcc_priors_byte_exact(test_index, data_dir, golden_dir, tmp_path):
    """quant-tcc -p priors (reference: main.cpp:2984-3019)."""
    out = str(tmp_path / "out_p")
    opt = Options(
        ec_file=os.path.join(data_dir, "tcc_test.ec"),
        tcc_file=os.path.join(data_dir, "tcc_test.mtx"),
        output_dir=out,
        priors=os.path.join(data_dir, "priors.txt"),
    )
    run_quant_tcc(opt, index=test_index)
    for fname in ("matrix.abundance.mtx", "matrix.abundance.tpm.mtx"):
        mine = open(os.path.join(out, fname)).read()
        golden = open(os.path.join(golden_dir, "tcc_priors", fname)).read()
        assert mine == golden
