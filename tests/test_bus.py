"""BUS single-cell mode: byte-exact parity with reference `kallisto bus`."""

import os
import struct

import numpy as np
import pytest

from kallisto_tpu.common import Options
from kallisto_tpu.sc.bus import pack_dna_binary, run_bus
from kallisto_tpu.sc.technologies import parse_technology
from kallisto_tpu.io.fastx import encode_seqs


def test_technology_table():
    t = parse_technology("10xv2")
    assert t.nfiles == 2 and t.bc == [(0, 0, 16)] and t.umi == [(0, 16, 26)]
    assert t.strand == "fr" and not t.paired
    assert t.bc_length() == 16 and t.umi_length() == 10


def test_custom_technology_string():
    t = parse_technology("0,0,16:0,16,26:1,0,0")
    assert t.bc == [(0, 0, 16)] and t.umi == [(0, 16, 26)] and t.seq == [(1, 0, 0)]
    assert t.nfiles == 2


def test_pack_dna_binary_matches_reference():
    # stringToBinary("ACGT") = 0b00011011; N packs as G (2) with flag
    codes, lens = encode_seqs(["ACGT", "ANGT"])
    b, f = pack_dna_binary(codes, lens)
    assert b[0] == 0b00011011 and f[0] == 0
    assert b[1] == 0b00101011  # N->G
    assert f[1] == (1 & 3) | (1 << 2)  # one N at position 1


@pytest.fixture(scope="module")
def bus_out(test_index, data_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bus"))
    opt = Options(
        files=[
            os.path.join(data_dir, "sc_reads_1.fastq.gz"),
            os.path.join(data_dir, "sc_reads_2.fastq.gz"),
        ],
        technology="10xv2",
        output_dir=out,
        batch_size=20000,
    )
    res = run_bus(opt, index=test_index)
    return out, res


def test_bus_stats(bus_out):
    _, res = bus_out
    # golden run_info.json of reference `kallisto bus -x 10xv2`
    assert res.num_processed == 10000
    assert res.num_pseudoaligned == 4808
    assert res.num_unique == 3524
    assert res.bclen == 16 and res.umilen == 10


def test_bus_binary_byte_exact(bus_out, golden_dir):
    out, _ = bus_out
    mine = open(os.path.join(out, "output.bus"), "rb").read()
    golden = open(os.path.join(golden_dir, "bus10xv2", "output.bus"), "rb").read()
    assert mine == golden


def test_bus_matrix_ec_byte_exact(bus_out, golden_dir):
    out, _ = bus_out
    assert (
        open(os.path.join(out, "matrix.ec")).read()
        == open(os.path.join(golden_dir, "bus10xv2", "matrix.ec")).read()
    )


def test_bus_transcripts(bus_out, golden_dir):
    out, _ = bus_out
    assert (
        open(os.path.join(out, "transcripts.txt")).read()
        == open(os.path.join(golden_dir, "bus10xv2", "transcripts.txt")).read()
    )


def test_bus_mesh_sharded_bit_parity(test_index, data_dir, tmp_path):
    """bus -t 8 (read chunks sharded over an 8-device mesh) produces
    byte-identical output.bus / matrix.ec to the single-device run --
    the TPU-native form of the reference's per-thread BUSProcessors
    (src/ProcessReads.cpp:335-369)."""
    outs = {}
    for t in (1, 8):
        out = str(tmp_path / f"bus_t{t}")
        opt = Options(
            files=[
                os.path.join(data_dir, "sc_reads_1.fastq.gz"),
                os.path.join(data_dir, "sc_reads_2.fastq.gz"),
            ],
            technology="10xv2",
            output_dir=out,
            threads=t,
        )
        run_bus(opt, index=test_index)
        outs[t] = out
    for fn in ("output.bus", "matrix.ec", "transcripts.txt"):
        a = open(os.path.join(outs[1], fn), "rb").read()
        b = open(os.path.join(outs[8], fn), "rb").read()
        assert a == b, fn


def test_bus_mesh_paired_bit_parity(test_index, data_dir, tmp_path):
    """bus --paired under the mesh: flens and BUS output bit-identical."""
    outs = {}
    for t in (1, 8):
        out = str(tmp_path / f"busp_t{t}")
        opt = Options(
            files=[
                os.path.join(data_dir, "bulkb0_1.fastq.gz"),
                os.path.join(data_dir, "bulkb0_2.fastq.gz"),
            ],
            technology="bulk",
            bus_paired=True,
            output_dir=out,
            threads=t,
        )
        run_bus(opt, index=test_index)
        outs[t] = out
    for fn in ("output.bus", "matrix.ec", "flens.txt"):
        p1 = os.path.join(outs[1], fn)
        if not os.path.exists(p1):
            continue
        a = open(p1, "rb").read()
        b = open(os.path.join(outs[8], fn), "rb").read()
        assert a == b, fn
