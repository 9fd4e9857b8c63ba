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


def test_tcc_txnames_index_free(data_dir, golden_dir, tmp_path):
    """-T txnames: index-free mode, zero target lengths, no transcripts.txt
    (reference: main.cpp:2914-2920, KmerIndex::loadTranscriptsFromFile)."""
    out = str(tmp_path / "out_tx")
    opt = Options(
        txnames_file=os.path.join(data_dir, "txnames.txt"),
        ec_file=os.path.join(data_dir, "tcc_test.ec"),
        tcc_file=os.path.join(data_dir, "tcc_test.mtx"),
        output_dir=out,
    )
    run_quant_tcc(opt)
    for fname in ("matrix.abundance.mtx", "matrix.abundance.tpm.mtx"):
        mine = open(os.path.join(out, fname)).read()
        golden = open(os.path.join(golden_dir, "tcc_txnames", fname)).read()
        assert mine == golden
    assert not os.path.exists(os.path.join(out, "transcripts.txt"))


def test_tcc_gtf_gene_rollup(test_index, data_dir, golden_dir, tmp_path):
    """-G gtf: gene-level matrices via parseGTF (reference: main.cpp:2975-2980)."""
    out = str(tmp_path / "out_gtf")
    opt = Options(
        ec_file=os.path.join(data_dir, "tcc_test.ec"),
        tcc_file=os.path.join(data_dir, "tcc_test.mtx"),
        gtf_file=os.path.join(data_dir, "transcripts.gtf.gz"),
        output_dir=out,
    )
    run_quant_tcc(opt, index=test_index)
    for fname in ("genes.txt", "matrix.abundance.gene.mtx",
                  "matrix.abundance.gene.tpm.mtx"):
        mine = open(os.path.join(out, fname)).read()
        golden = open(os.path.join(golden_dir, "tcc_gtf", fname)).read()
        assert mine == golden


def test_tcc_long_read_em(test_index, data_dir, golden_dir, tmp_path):
    """--long (PacBio-variant EM: singletons added after the loop,
    reference: EMAlgorithm.h:224-357)."""
    out = str(tmp_path / "out_long")
    opt = Options(
        ec_file=os.path.join(data_dir, "tcc_test.ec"),
        tcc_file=os.path.join(data_dir, "tcc_test.mtx"),
        output_dir=out,
        long_read=True,
        fld_mean=180,
        fld_sd=20,
    )
    run_quant_tcc(opt, index=test_index)
    for fname in ("matrix.abundance.mtx", "matrix.abundance.tpm.mtx",
                  "matrix.efflens.mtx", "matrix.fld.tsv"):
        mine = open(os.path.join(out, fname)).read()
        golden = open(os.path.join(golden_dir, "tcc_long", fname)).read()
        assert mine == golden


def test_tcc_flat_file_single_cell(test_index, data_dir, golden_dir, tmp_path):
    """Non-matrix TCC file: plaintext abundance.tsv + gene tsv + bootstrap
    files (reference: main.cpp:3156-3184)."""
    out = str(tmp_path / "out_flat")
    opt = Options(
        ec_file=os.path.join(data_dir, "tcc_test.ec"),
        tcc_file=os.path.join(data_dir, "tcc_flat.txt"),
        genemap=os.path.join(data_dir, "t2g.txt"),
        output_dir=out,
        bootstrap=2,
    )
    run_quant_tcc(opt, index=test_index)
    for fname in ("abundance.tsv", "abundance.gene.tsv"):
        mine = open(os.path.join(out, fname)).read()
        golden = open(os.path.join(golden_dir, "tcc_flat", fname)).read()
        assert mine == golden
    # bootstrap draws are distribution-level only (discrete_distribution's
    # stream is implementation-defined); check presence + shape
    for b in range(2):
        assert os.path.exists(os.path.join(out, f"bs_abundance_{b}.tsv"))


def test_tcc_matrix_to_files_and_directories(
    test_index, data_dir, golden_dir, tmp_path
):
    """--matrix-to-files / --matrix-to-directories per-cell outputs
    (reference: main.cpp:3060-3100)."""
    common = dict(
        ec_file=os.path.join(data_dir, "tcc_test.ec"),
        tcc_file=os.path.join(data_dir, "tcc_test.mtx"),
        fld_mean=180,
        fld_sd=20,
        bootstrap=2,
        plaintext=True,
    )
    out1 = str(tmp_path / "m2f")
    run_quant_tcc(
        Options(output_dir=out1, matrix_to_files=True, **common),
        index=test_index,
    )
    for c in (1, 2):
        mine = open(os.path.join(out1, f"abundance_{c}.tsv")).read()
        golden = open(os.path.join(golden_dir, "tcc_m2f", f"abundance_{c}.tsv")).read()
        assert mine == golden
        for b in range(2):
            assert os.path.exists(os.path.join(out1, f"bs_abundance_{c}_{b}.tsv"))
    out2 = str(tmp_path / "m2d")
    run_quant_tcc(
        Options(output_dir=out2, matrix_to_files=True,
                matrix_to_directories=True, **common),
        index=test_index,
    )
    for c in (1, 2):
        mine = open(os.path.join(out2, f"abundance_{c}", "abundance.tsv")).read()
        golden = open(os.path.join(golden_dir, "tcc_m2f", f"abundance_{c}.tsv")).read()
        assert mine == golden
        for b in range(2):
            assert os.path.exists(
                os.path.join(out2, f"abundance_{c}", f"bs_abundance_{b}.tsv")
            )


def test_tcc_em_accelerator_leg_sharded(test_index, data_dir, tmp_path,
                                        monkeypatch):
    """The float32 accelerator EM leg (KALLISTO_TPU_EM_DEVICE=tpu):
    sharding cells over an 8-device mesh is bit-identical to the
    single-device float32 run, and both track the CPU float64 parity leg
    within float32 tolerance (the TPU-native form of the reference's
    per-cell EM thread pool, main.cpp:3182-3195)."""
    import numpy as np

    def run(env, threads):
        if env:
            monkeypatch.setenv("KALLISTO_TPU_EM_DEVICE", env)
        else:
            monkeypatch.delenv("KALLISTO_TPU_EM_DEVICE", raising=False)
        opt = Options(
            ec_file=os.path.join(data_dir, "tcc_test.ec"),
            tcc_file=os.path.join(data_dir, "tcc_test.mtx"),
            fld_mean=180, fld_sd=20, threads=threads,
        )
        return run_quant_tcc(opt, index=test_index)

    f64 = run(None, 1)
    f32_single = run("tpu", 1)
    f32_mesh = run("tpu", 8)
    np.testing.assert_array_equal(
        f32_mesh.est_counts, f32_single.est_counts
    )
    np.testing.assert_allclose(
        f32_single.est_counts, f64.est_counts, rtol=2e-3, atol=2e-2
    )
