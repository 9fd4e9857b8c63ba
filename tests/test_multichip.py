"""Multi-device data parallelism: sharded quant must be bit-identical to
the single-device pipeline (8 virtual CPU devices, see conftest.py).

The mesh path shards each read batch contiguously over the `reads` axis,
compacts per-device key histograms locally, and merges them on the host in
mesh order -- reproducing the reference's single-threaded EC numbering
(reference merge point: src/ProcessReads.cpp:424-646 MasterProcessor::update).
"""

import os

import numpy as np
import pytest

from kallisto_tpu.common import Options
from kallisto_tpu.quant.pipeline import run_quant


def _quant(data_dir, test_index, n_devices, **kw):
    kw.setdefault("batch_size", 1250)  # 10k reads -> 8 superbatches
    opt = Options(
        files=[
            os.path.join(data_dir, "reads_1.fastq.gz"),
            os.path.join(data_dir, "reads_2.fastq.gz"),
        ],
        n_devices=n_devices,
        **kw,
    )
    return run_quant(opt, index=test_index)


@pytest.fixture(scope="module")
def single_result(data_dir, test_index):
    return _quant(data_dir, test_index, 1)


def test_mesh_devices_available():
    import jax

    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"


def test_sharded_paired_parity(data_dir, test_index, single_result):
    ref = single_result
    got = _quant(data_dir, test_index, 8)
    assert got.num_processed == ref.num_processed
    assert got.num_pseudoaligned == ref.num_pseudoaligned
    # EC numbering (first-seen order) must match exactly => matrix.ec parity
    assert len(got.ec_sets) == len(ref.ec_sets)
    for a, b in zip(got.ec_sets, ref.ec_sets):
        assert np.array_equal(a, b)
    assert np.array_equal(got.counts, ref.counts)
    np.testing.assert_array_equal(got.est_counts, ref.est_counts)
    np.testing.assert_array_equal(got.flens, ref.flens)


def test_sharded_uneven_batch(data_dir, test_index, single_result):
    """Batch sizes that don't divide the mesh: pad reads must not count."""
    ref = single_result
    got = _quant(data_dir, test_index, 8)
    got2 = _quant(data_dir, test_index, 8, batch_size=999)  # 999 % 8 != 0
    assert got2.num_processed == ref.num_processed
    assert np.array_equal(got2.counts, ref.counts)
    np.testing.assert_array_equal(got2.est_counts, got.est_counts)


def test_sharded_single_end_parity(data_dir, test_index):
    def q(n):
        opt = Options(
            files=[os.path.join(data_dir, "reads_1.fastq.gz")],
            single_end=True, fld_mean=180.0, fld_sd=20.0,
            n_devices=n, batch_size=1250,
        )
        return run_quant(opt, index=test_index)

    ref = q(1)
    got = q(8)
    assert np.array_equal(got.counts, ref.counts)
    for a, b in zip(got.ec_sets, ref.ec_sets):
        assert np.array_equal(a, b)
    np.testing.assert_array_equal(got.est_counts, ref.est_counts)


def test_threads_maps_to_devices(data_dir, test_index, single_result):
    """Reference `-t` (pthread DP over read batches) maps to mesh DP."""
    ref = single_result
    opt = Options(
        files=[
            os.path.join(data_dir, "reads_1.fastq.gz"),
            os.path.join(data_dir, "reads_2.fastq.gz"),
        ],
        threads=4, batch_size=1250,
    )
    got = run_quant(opt, index=test_index)
    assert np.array_equal(got.counts, ref.counts)
    np.testing.assert_array_equal(got.est_counts, ref.est_counts)


def test_sharded_stranded_parity(data_dir, test_index):
    """--fr-stranded rides the compact mesh path: the strand filter's
    inputs travel in the key (first-hit block/strand columns), so sharded
    runs reproduce the single-device stranded result exactly."""
    ref = _quant(data_dir, test_index, 1, strand="fr")
    got = _quant(data_dir, test_index, 8, strand="fr")
    assert got.num_pseudoaligned == ref.num_pseudoaligned
    assert np.array_equal(got.counts, ref.counts)
    for a, b in zip(got.ec_sets, ref.ec_sets):
        assert np.array_equal(a, b)
    np.testing.assert_array_equal(got.est_counts, ref.est_counts)


def test_sharded_min_range_parity(data_dir, test_index):
    """--min-range vetoes travel as key flag bits on the mesh path."""
    ref = _quant(data_dir, test_index, 1, min_range=15)
    got = _quant(data_dir, test_index, 8, min_range=15)
    assert got.num_pseudoaligned == ref.num_pseudoaligned
    assert np.array_equal(got.counts, ref.counts)
    np.testing.assert_array_equal(got.est_counts, ref.est_counts)


def test_stranded_matches_reference_golden(data_dir, test_index, golden_dir,
                                           tmp_path):
    """Compact-path stranded quant stays byte-identical to the reference
    golden (the same oracle the full-path stranded tests pin)."""
    from tests.conftest import read_abundance

    out = str(tmp_path / "fr8")
    opt = Options(
        files=[
            os.path.join(data_dir, "reads_1.fastq.gz"),
            os.path.join(data_dir, "reads_2.fastq.gz"),
        ],
        strand="fr", n_devices=8, batch_size=1250,
        output_dir=out, plaintext=True,
    )
    run_quant(opt, index=test_index)
    mine = open(os.path.join(out, "abundance.tsv")).read()
    want = open(os.path.join(golden_dir, "quant_fr", "abundance.tsv")).read()
    assert mine == want


def test_sharded_pos_filter_parity(data_dir, test_index):
    """The FLD position filter rides the compact mesh path: the key
    carries the read's per-block threshold rank (pos_filter_rank), so
    sharded half-mapped paired runs with an explicit -l reproduce the
    single-device result exactly."""
    files = [
        os.path.join(data_dir, "reads_1.fastq.gz"),
        os.path.join(data_dir, "halfmapped_2.fastq.gz"),
    ]
    ref = run_quant(
        Options(files=files, n_devices=1, batch_size=1250,
                fld_mean=180, fld_sd=20),
        index=test_index,
    )
    got = run_quant(
        Options(files=files, n_devices=8, batch_size=1250,
                fld_mean=180, fld_sd=20),
        index=test_index,
    )
    assert got.num_pseudoaligned == ref.num_pseudoaligned
    assert np.array_equal(got.counts, ref.counts)
    for a, b in zip(got.ec_sets, ref.ec_sets):
        assert np.array_equal(a, b)
    np.testing.assert_array_equal(got.est_counts, ref.est_counts)
