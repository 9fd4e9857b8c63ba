"""D-list (distinguishing flanking k-mer) parity vs reference kallisto.

Goldens produced by the reference binary with `index -d tests/data/
dlist.fasta`; the mix dataset adds 200 contaminant read pairs sampled
across the D-list boundaries (46 pairs are vetoed by the reference).
"""

import os

import numpy as np
import pytest

from kallisto_tpu.common import Options
from kallisto_tpu.index import build_index
from kallisto_tpu.quant.pipeline import run_quant


@pytest.fixture(scope="module")
def dlist_index(data_dir):
    return build_index(
        [os.path.join(data_dir, "transcripts.fasta.gz")],
        k=31,
        dlist_paths=[os.path.join(data_dir, "dlist.fasta")],
    )


def test_dlist_index_structure(dlist_index, test_index):
    # reference reports 4 distinguishing flanking k-mers on this fixture
    assert dlist_index.dlist_keys.shape[0] == 4
    assert dlist_index.num_trans == test_index.num_trans + 4
    assert dlist_index.num_onlist == test_index.num_trans
    assert dlist_index.target_names[-4:] == [
        "d_list.0", "d_list.1", "d_list.2", "d_list.3"
    ]


def test_dlist_quant_clean_byte_exact(dlist_index, data_dir, golden_dir, tmp_path):
    out = str(tmp_path / "q")
    res = run_quant(Options(
        files=[os.path.join(data_dir, "reads_1.fastq.gz"),
               os.path.join(data_dir, "reads_2.fastq.gz")],
        output_dir=out,
        plaintext=True,
    ), index=dlist_index)
    mine = open(os.path.join(out, "abundance.tsv")).read()
    golden = open(os.path.join(golden_dir, "quant_dlist", "abundance.tsv")).read()
    assert mine == golden
    assert res.num_pseudoaligned == 9413


def test_dlist_vetoes_contaminant_reads(dlist_index, data_dir, golden_dir, tmp_path):
    out = str(tmp_path / "qmix")
    res = run_quant(Options(
        files=[os.path.join(data_dir, "reads_1.fastq.gz"),
               os.path.join(data_dir, "reads_2.fastq.gz"),
               os.path.join(data_dir, "contam_1.fastq.gz"),
               os.path.join(data_dir, "contam_2.fastq.gz")],
        output_dir=out,
        plaintext=True,
    ), index=dlist_index)
    # reference: 9567 pseudoaligned (46 contaminant pairs vetoed)
    assert res.num_pseudoaligned == 9567
    mine = open(os.path.join(out, "abundance.tsv")).read()
    golden = open(
        os.path.join(golden_dir, "quant_dlist_mix", "abundance.tsv")
    ).read()
    assert mine == golden


def test_dfk_onlist_bus_golden(data_dir, golden_dir, tmp_path):
    """--dfk-onlist run is byte-identical to the reference on D-list
    boundary-tiling reads (reference: ProcessReads.cpp:1713-1722)."""
    import os

    from kallisto_tpu.common import Options
    from kallisto_tpu.index import build_index
    from kallisto_tpu.sc.bus import run_bus

    index = build_index(
        [os.path.join(data_dir, "transcripts.fasta.gz")], k=31,
        dlist_paths=[os.path.join(data_dir, "dlist.fasta")],
    )
    out = str(tmp_path / "dfk")
    opt = Options(
        files=[os.path.join(data_dir, "dfk_reads.fastq.gz")],
        technology="bulk", single_end=True, dfk_onlist=True,
        output_dir=out,
    )
    run_bus(opt, index=index)
    for fname in ("output.bus", "matrix.ec"):
        mine = open(os.path.join(out, fname), "rb").read()
        want = open(os.path.join(golden_dir, "bus_dfk", fname), "rb").read()
        assert mine == want, fname


def test_dfk_onlist_sentinel_semantics(data_dir):
    """includeDList sentinel mechanics on the resolver level
    (reference: MinCollector.cpp:37-42; ProcessReads.cpp:1713-1722):
    a paired fragment whose mates' sets mix on- and off-list members
    keeps the on-list part plus the sentinel target (= num_onlist)."""
    import numpy as np

    from kallisto_tpu.index import build_index
    from kallisto_tpu.quant.ecmap import EcResolver

    index = build_index(
        [os.path.join(data_dir, "transcripts.fasta.gz")], k=31,
        dlist_paths=[os.path.join(data_dir, "dlist.fasta")],
    )
    S = index.num_onlist
    res = EcResolver(index, dfk_onlist=True)
    base = EcResolver(index)
    # synthetic mate sets: u1 = {0,1}, u2 = {0, S+1} (mixed on/off-list)
    u1 = np.array([0, 1], np.int32)
    u2 = np.array([0, S + 1], np.int32)

    def fake_rows(sets):
        def _row(r):
            return sets[r]
        return _row

    for r_ in (res, base):
        r_._row = fake_rows([u1, u2])
    got = res.resolve_rows(
        np.array([0], np.int64), True, np.array([1], np.int64), True, True
    )
    ref = base.resolve_rows(
        np.array([0], np.int64), True, np.array([1], np.int64), True, True
    )
    assert ref is not None and ref.tolist() == [0]
    assert got is not None and got.tolist() == [0, S]
