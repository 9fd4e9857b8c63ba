"""Bootstrap tests: statistical parity with the reference.

Exact draw parity is impossible (std::discrete_distribution's stream is
implementation-defined), so we compare the bootstrap DISTRIBUTION (per-
transcript mean and sd of est_counts over replicates) against 20 reference
replicates (tests/golden/quant_bs), plus internal invariants.
"""

import glob
import os

import numpy as np
import pytest

from kallisto_tpu.common import Options
from kallisto_tpu.quant.pipeline import run_quant
from kallisto_tpu.utils.mt19937 import MT19937_64

from conftest import read_abundance


def test_mt19937_64_first_draws():
    # std::mt19937_64(42): first three draws
    g = MT19937_64(42)
    assert g() == 13930160852258120406
    assert g() == 11788048577503494824
    assert g() == 13874630024467741450


@pytest.fixture(scope="module")
def bs_result(test_index, data_dir):
    opt = Options(
        files=[
            os.path.join(data_dir, "reads_1.fastq.gz"),
            os.path.join(data_dir, "reads_2.fastq.gz"),
        ],
        bootstrap=20,
        batch_size=10000,
    )
    return run_quant(opt, index=test_index)


def test_bootstrap_shapes_and_mass(bs_result):
    bs = bs_result.bootstraps
    assert bs is not None and bs.shape == (20, 14)
    # each replicate redistributes exactly the resampled read mass
    total = bs_result.counts.sum()
    np.testing.assert_allclose(bs.sum(axis=1), total, rtol=1e-6)


def test_bootstrap_statistics_vs_reference(bs_result, golden_dir):
    ref = []
    for b in range(20):
        path = os.path.join(golden_dir, "quant_bs", f"bs_abundance_{b}.tsv")
        _, _, _, est, _ = read_abundance(path)
        ref.append(est)
    ref = np.stack(ref)
    mine = bs_result.bootstraps

    # means should agree with each other within bootstrap noise
    ref_mean, mine_mean = ref.mean(axis=0), mine.mean(axis=0)
    ref_sd, mine_sd = ref.std(axis=0), mine.std(axis=0)
    se = np.maximum(ref_sd, mine_sd) / np.sqrt(20)
    big = ref_mean > 10
    assert (np.abs(ref_mean - mine_mean)[big] < 5 * se[big] + 1.0).all()
    # spreads within a factor ~3 (20 replicates is noisy)
    nz = (ref_sd > 1.0) & (mine_sd > 1.0)
    ratio = mine_sd[nz] / ref_sd[nz]
    assert (ratio > 1 / 3).all() and (ratio < 3).all()


def test_bootstrap_accelerator_leg(test_index, data_dir, tmp_path,
                                   monkeypatch):
    """Forced accelerator bootstraps (float32 vmapped EM) track the CPU
    float64 leg within float32 tolerance."""
    import numpy as np

    from kallisto_tpu.quant.bootstrap import run_bootstraps
    from kallisto_tpu.quant.em import build_em_problem

    rng = np.random.default_rng(3)
    T = test_index.num_trans
    ec_sets = [np.array([t], np.int32) for t in range(T)] + [
        np.sort(rng.choice(T, 3, replace=False)).astype(np.int32)
        for _ in range(10)
    ]
    counts = rng.integers(0, 500, len(ec_sets)).astype(np.int64)
    problem = build_em_problem(ec_sets, T)
    eff = np.linspace(100, 2000, T)
    a64 = run_bootstraps(problem, counts, eff, 5, seed=42)
    monkeypatch.setenv("KALLISTO_TPU_EM_DEVICE", "tpu")
    a32 = run_bootstraps(problem, counts, eff, 5, seed=42)
    assert a32.dtype == np.float64
    np.testing.assert_allclose(a32, a64, rtol=2e-3, atol=2e-2)
