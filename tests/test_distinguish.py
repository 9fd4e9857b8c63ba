"""--distinguish index mode + shades: byte-exact parity with the reference.

Goldens produced by the reference binary (built from /root/reference):
  kallisto index --distinguish -i idx --d-list=distinguish_polyA.fasta -k 7 <fasta>
  kallisto bus -t 1 --num -x bulk -o out -i idx distinguish_reads.fastq.gz
(reference: KmerIndex::BuildDistinguishingGraph, src/KmerIndex.cpp:413-570;
shade runtime semantics: src/MinCollector.cpp:185-214,443-465; shade
detection at load: src/KmerIndex.cpp:1506-1517)

Documented divergence: the reference silently drops a LOWERCASE sequence
whose graph walk runs antisense to the stored unitig orientation (a Bifrost
case-sensitivity artifact in findUnitig's reverse-strand comparison); we
treat sequences case-insensitively, so such sequences keep contributing to
their color's ECs.  All-uppercase inputs (the documented format) are
byte-exact.
"""

import os

import pytest

from kallisto_tpu.common import Options
from kallisto_tpu.index import build_index
from kallisto_tpu.sc.bus import run_bus


CASES = [
    # (fasta, golden dir)
    ("distinguish_colors.fasta", "bus_distinguish"),   # integer names 1..5
    ("distinguish_shades.fasta", "bus_shade"),         # _shade_ variants
    ("distinguish_t.fasta", "bus_distinguish_t0"),     # names "tN" -> color 0
]


@pytest.mark.parametrize("fasta,golden", CASES)
def test_distinguish_bus_byte_exact(data_dir, golden_dir, tmp_path, fasta, golden):
    index = build_index(
        [os.path.join(data_dir, fasta)],
        k=7,
        dlist_paths=[os.path.join(data_dir, "distinguish_polyA.fasta")],
        distinguish=True,
    )
    out = str(tmp_path / "bus_out")
    opt = Options(
        files=[os.path.join(data_dir, "distinguish_reads.fastq.gz")],
        output_dir=out,
        technology="bulk",
        bus_num=True,
        single_end=True,
        k=7,
    )
    run_bus(opt, index=index)
    for fname in ("output.bus", "matrix.ec", "transcripts.txt"):
        mine = open(os.path.join(out, fname), "rb").read()
        want = open(os.path.join(golden_dir, golden, fname), "rb").read()
        assert mine == want, fname


def test_distinguish_shade_target_table(data_dir):
    """Shade targets follow colors in lexicographic (std::set) order with
    dummy length k (reference: src/KmerIndex.cpp:477-492)."""
    index = build_index(
        [os.path.join(data_dir, "distinguish_shades.fasta")], k=7,
        distinguish=True,
    )
    assert index.target_names[:5] == ["0", "1", "2", "3", "4"]
    assert index.target_names[5:] == ["1_shade_v1", "3_shade_x"]
    assert (index.target_lens == 7).all()
    assert index.num_onlist == 7
