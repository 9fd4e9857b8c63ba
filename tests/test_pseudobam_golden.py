"""Pseudobam record parity against a reference-binary golden BAM.

The shipped reference's --pseudobam/--genomebam replay is BROKEN in
0.51.1 -- findings established while generating this golden:

1. It SEGFAULTS on its own bundled test dataset (test/Snakefile data):
   KmerIndex::findPosition dereferences a null Node when the replayed
   k-mer's UnitigMap is empty (src/KmerIndex.cpp:2193); a second crash
   follows in SparseVector::get ("Index not present in SparseVector")
   when the replay queries a transcript missing from the first-hit
   block's payload.  (Upstream's own func_tests never run --pseudobam,
   so the rot went unnoticed.)
2. With those two call sites guarded to the function's own cannot-
   position sentinel {-1, true} (the minimal patch that lets it run),
   the reference still mispositions essentially EVERY antisense mate:
   clean unique-mapping pairs get mate records at pos=0 with fabricated
   soft-clips (e.g. 2S48M at position 0 for a read that maps perfectly
   at 1051).

Byte-parity with that output would mean reproducing garbage, so this
test pins the subset the reference computes correctly -- FORWARD-sense
mapped records' self fields (refid, pos, mapq, bin, cigar, seq, qual,
aux incl. the EM ZW tag; mate/proper-pair bits excluded) are byte-
identical, and the container structure (header text, reference dict,
record count, read-name order) matches exactly.  Our antisense records
carry the true coordinates instead (pinned by the GTF-projection
invariants in test_genomebam.py).

Golden: patched reference on 300 clean unique-mapping pairs
(tests/data/clean_pb_{1,2}.fastq.gz); regenerate via
tests/make_pseudobam_golden.sh.
"""

import os
import struct
import zlib

import numpy as np


def bgzf_decompress(path: str) -> bytes:
    out = bytearray()
    data = open(path, "rb").read()
    pos = 0
    while pos < len(data):
        if data[pos : pos + 2] != b"\x1f\x8b":
            break
        xlen = struct.unpack("<H", data[pos + 10 : pos + 12])[0]
        extra = data[pos + 12 : pos + 12 + xlen]
        bsize = None
        i = 0
        while i + 4 <= xlen:
            slen = struct.unpack("<H", extra[i + 2 : i + 4])[0]
            if extra[i : i + 2] == b"BC":
                bsize = struct.unpack("<H", extra[i + 4 : i + 6])[0] + 1
            i += 4 + slen
        out += zlib.decompress(data[pos + 12 + xlen : pos + bsize - 8], -15)
        pos += bsize
    return bytes(out)


def split_bam(d: bytes):
    assert d[:4] == b"BAM\x01"
    lt = struct.unpack("<i", d[4:8])[0]
    p = 8 + lt
    nref = struct.unpack("<i", d[p : p + 4])[0]
    p += 4
    for _ in range(nref):
        ln = struct.unpack("<i", d[p : p + 4])[0]
        p += 4 + ln + 4
    refs = d[8 + lt : p]
    recs = []
    while p < len(d):
        bs = struct.unpack("<i", d[p : p + 4])[0]
        recs.append(d[p + 4 : p + 4 + bs])
        p += 4 + bs
    return d[8 : 8 + lt], refs, recs


def _self_fields(r: bytes):
    """Everything except the mate-dependent core fields (next_refID,
    next_pos, tlen) and the mate/proper-pair flag bits."""
    refid, pos, lrn, mapq, bins, ncig, flag, llen = struct.unpack(
        "<iiBBHHHi", r[:20]
    )
    return (
        refid, pos, mapq, bins, ncig, flag & ~(0x20 | 0x8 | 0x2), llen,
        r[32 : 32 + lrn], r[32 + lrn :],
    )


def test_pseudobam_forward_records_byte_exact(data_dir, golden_dir, tmp_path):
    from kallisto_tpu.common import Options
    from kallisto_tpu.index import build_index
    from kallisto_tpu.quant.pipeline import run_quant

    index = build_index(
        [os.path.join(data_dir, "transcripts.fasta.gz")], k=31
    )
    out = str(tmp_path / "pb")
    run_quant(Options(
        files=[os.path.join(data_dir, "clean_pb_1.fastq.gz"),
               os.path.join(data_dir, "clean_pb_2.fastq.gz")],
        output_dir=out, plaintext=True, pseudobam=True,
    ), index=index)

    golden = bgzf_decompress(
        os.path.join(golden_dir, "pseudobam_clean", "pseudoalignments.bam")
    )
    mine = bgzf_decompress(os.path.join(out, "pseudoalignments.bam"))
    gt, gr, ga = split_bam(golden)
    mt, mr, ma = split_bam(mine)
    assert gt == mt          # header text (incl. @PG version line)
    assert gr == mr          # reference dictionary
    assert len(ga) == len(ma)

    fw = eq = 0
    for a, b in zip(ga, ma):
        # read names agree in order for every record
        lrn_a, lrn_b = a[8], b[8]
        assert a[32 : 32 + lrn_a] == b[32 : 32 + lrn_b]
        my_flag = struct.unpack("<H", b[14:16])[0]
        if my_flag & 0x14:   # reference mispositions antisense mates
            continue
        fw += 1
        if _self_fields(a) == _self_fields(b):
            eq += 1
    assert fw >= 700         # the subset genuinely covers the output
    assert eq == fw          # every forward record's self fields match


def test_pseudobam_fast_path_parity(data_dir, tmp_path, monkeypatch):
    """--pseudobam now rides the host-wave-1 compact path (per-read key
    slots + probe-side first-hit info instead of full per-read transfer
    mode); the BAM must be byte-identical to the probe-off full path."""
    from kallisto_tpu.common import Options
    from kallisto_tpu.index import build_index
    from kallisto_tpu.quant.pipeline import run_quant

    index = build_index(
        [os.path.join(data_dir, "transcripts.fasta.gz")], k=31
    )
    bams = {}
    for hw in ("0", "1"):
        monkeypatch.setenv("KALLISTO_TPU_HOST_WAVE1", hw)
        out = str(tmp_path / f"pb{hw}")
        run_quant(Options(
            files=[os.path.join(data_dir, "reads_1.fastq.gz"),
                   os.path.join(data_dir, "reads_2.fastq.gz")],
            output_dir=out, plaintext=True, pseudobam=True,
            fld_mean=180.0, fld_sd=20.0,
        ), index=index)
        bams[hw] = bgzf_decompress(
            os.path.join(out, "pseudoalignments.bam")
        )
    assert bams["0"] == bams["1"]
