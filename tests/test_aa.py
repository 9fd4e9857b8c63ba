"""--aa (comma-free code) mode: byte-exact parity vs reference kallisto.

Fixtures mirror the reference func_tests (runtests.sh:48-93): a 3-protein
index at k=7 and virus nucleotide reads in frame 0 and in mixed frames
(fw +1/+2, rc +0/+1/+2).  Goldens were produced by the reference binary.
"""

import os

import numpy as np
import pytest

from kallisto_tpu.common import Options
from kallisto_tpu.index import build_index
from kallisto_tpu.sc.bus import run_bus
from kallisto_tpu.utils.cfc import CODON_CFC, aa_to_cfc, nt_to_cfc_codes


def test_aa_to_cfc_roundtrip():
    assert aa_to_cfc("MFW") == "ATCACCTGC"
    assert aa_to_cfc("X*?") == "NNN" * 3
    # B/J/Z ambiguity codes translate as D/L/E
    assert aa_to_cfc("BJZ") == aa_to_cfc("DLE")


def test_nt_to_cfc_matches_gencode():
    # ATG GCT TAA -> M A stop -> ATC AGA NNN
    codes = np.array([[0, 3, 2, 2, 1, 3, 3, 0, 0]], np.uint8)
    lens = np.array([9], np.int32)
    out, ol = nt_to_cfc_codes(codes, lens, 0)
    assert ol[0] == 9
    assert list(out[0]) == [0, 3, 1, 0, 2, 0, 4, 4, 4]


@pytest.fixture(scope="module")
def aa_index(data_dir):
    return build_index([os.path.join(data_dir, "aa_ref.fasta")], k=7, aa=True)


@pytest.mark.parametrize(
    "fastq,golden",
    [
        ("virus_nn_frame0.fastq.gz", "bus_aa_f0"),
        ("virus_nn_mixed_frames.fastq.gz", "bus_aa_mixed"),
    ],
)
def test_bus_aa_byte_exact(aa_index, data_dir, golden_dir, tmp_path, fastq, golden):
    out = str(tmp_path / "out")
    res = run_bus(Options(
        files=[os.path.join(data_dir, fastq)],
        output_dir=out,
        technology="bulk",
        aa=True,
    ), index=aa_index)
    for fn in ["output.bus", "matrix.ec"]:
        g = os.path.join(golden_dir, golden, fn)
        if os.path.exists(g):
            assert open(os.path.join(out, fn), "rb").read() == open(g, "rb").read(), fn
    assert res.num_pseudoaligned == res.num_processed  # all reads align


def test_bus_bulk_batch_outputs(aa_index, data_dir, golden_dir, tmp_path):
    out = str(tmp_path / "out")
    run_bus(Options(
        files=[os.path.join(data_dir, "virus_nn_frame0.fastq.gz")],
        output_dir=out,
        technology="bulk",
        aa=True,
    ), index=aa_index)
    assert open(os.path.join(out, "matrix.cells")).read() == "batch0\n"
    assert open(os.path.join(out, "matrix.sample.barcodes")).read() == "A" * 16 + "\n"
