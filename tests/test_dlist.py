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


def test_dlist_overhang3_byte_exact(data_dir, golden_dir, tmp_path):
    """-D/--d-list-overhang 3: up to 3 flanking k-mers per run boundary
    (reference: main.cpp:126-129 + DListFlankingKmers overhang loops,
    src/KmerIndex.cpp:728-776).  Golden from the reference binary."""
    index = build_index(
        [os.path.join(data_dir, "transcripts.fasta.gz")], k=31,
        dlist_paths=[os.path.join(data_dir, "dlist.fasta")],
        dlist_overhang=3,
    )
    # reference reports 12 D-list k-mers at overhang 3 (4 at overhang 1)
    assert index.dlist_keys.shape[0] == 12
    out = str(tmp_path / "q")
    res = run_quant(Options(
        files=[os.path.join(data_dir, "reads_1.fastq.gz"),
               os.path.join(data_dir, "reads_2.fastq.gz"),
               os.path.join(data_dir, "contam_1.fastq.gz"),
               os.path.join(data_dir, "contam_2.fastq.gz")],
        output_dir=out, plaintext=True,
    ), index=index)
    assert res.num_pseudoaligned == 9566  # one extra pair vetoed vs D=1
    mine = open(os.path.join(out, "abundance.tsv")).read()
    golden = open(
        os.path.join(golden_dir, "quant_dlist_D3", "abundance.tsv")
    ).read()
    assert mine == golden


def test_dlist_multi_file_byte_exact(data_dir, golden_dir, tmp_path):
    """Comma-separated -d file lists: multiple D-list FASTAs merge
    (reference: main.cpp:116-125).  Golden from the reference binary run
    with `-d part1,part2`."""
    index = build_index(
        [os.path.join(data_dir, "transcripts.fasta.gz")], k=31,
        dlist_paths=[os.path.join(data_dir, "dlist_part1.fasta"),
                     os.path.join(data_dir, "dlist_part2.fasta")],
    )
    out = str(tmp_path / "q")
    res = run_quant(Options(
        files=[os.path.join(data_dir, "reads_1.fastq.gz"),
               os.path.join(data_dir, "reads_2.fastq.gz"),
               os.path.join(data_dir, "contam_1.fastq.gz"),
               os.path.join(data_dir, "contam_2.fastq.gz")],
        output_dir=out, plaintext=True,
    ), index=index)
    assert res.num_pseudoaligned == 9567
    mine = open(os.path.join(out, "abundance.tsv")).read()
    golden = open(
        os.path.join(golden_dir, "quant_dlist_multi", "abundance.tsv")
    ).read()
    assert mine == golden


def test_dlist_aa_six_frame_byte_exact(data_dir, golden_dir, tmp_path):
    """--aa + -d: the D-list genome is translated to comma-free code in
    all six frames and the overhang is coerced to 3 (reference:
    main.cpp:140-146, KmerIndex.cpp:790-860).  BUS output byte-identical
    to the reference on reads tiling the contaminant."""
    import gzip
    import shutil

    from kallisto_tpu.sc.bus import run_bus

    index = build_index(
        [os.path.join(data_dir, "aa_ref.fasta")], k=7, aa=True,
        dlist_paths=[os.path.join(data_dir, "dlist_nn.fasta")],
        dlist_overhang=3,
    )
    # mixed input: the 4 on-target reads + 10 contaminant-tiling reads
    mix = str(tmp_path / "mix_nn.fastq.gz")
    with open(mix, "wb") as f:
        for src in ("virus_nn_frame0.fastq.gz", "contam_nn.fastq.gz"):
            with open(os.path.join(data_dir, src), "rb") as g:
                shutil.copyfileobj(g, f)
    out = str(tmp_path / "bus")
    res = run_bus(Options(
        files=[mix], output_dir=out, technology="bulk", aa=True,
    ), index=index)
    assert (res.num_processed, res.num_pseudoaligned) == (14, 5)
    for fn in ("output.bus", "matrix.ec"):
        mine = open(os.path.join(out, fn), "rb").read()
        golden = open(
            os.path.join(golden_dir, "bus_aa_dlist", fn), "rb"
        ).read()
        assert mine == golden, fn
