"""Deterministic fixture generator for the bus input-surface tests.

Writes FASTQ/BAM fixtures into tests/data/ for:
- SMARTSEQ3 UMI-tag detection (4-file technology, 5' tag + internal reads),
- batch mode (-B) bulk and 10xv2 runs,
- interleaved FASTQ (--inleaved),
- RX:Z UMI-in-comment custom technology,
- BAM input (-b) with the equivalent converted FASTQ pair (the golden
  oracle: reference kallisto lacks a BAM build, but BAM -> (CR+UR, SEQ)
  conversion is deterministic, so the FASTQ run pins the expected bytes).

Goldens are produced by tests/make_bus_goldens.sh against the reference
binary and committed; this script never needs the reference.
"""

import gzip
import os
import struct
import sys
import zlib

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "data")
BASES = np.frombuffer(b"ACGT", np.uint8)
TAG = "ATTGCGCAATG"


def load_transcripts():
    sys.path.insert(0, os.path.dirname(HERE))
    from kallisto_tpu.io.fastx import read_fasta, BASE_CODE

    seqs = []
    for _, s in read_fasta(os.path.join(DATA, "transcripts.fasta.gz")):
        seqs.append(BASE_CODE[np.frombuffer(s.encode(), np.uint8)])
    return seqs


def codes_to_str(codes):
    return bytes(np.frombuffer(b"ACGTN", np.uint8)[codes]).decode()


def revcomp(codes):
    out = codes[::-1].copy()
    acgt = out < 4
    out[acgt] = 3 - out[acgt]
    return out


def write_fastq(path, reads, comments=None):
    """reads: list of (name, codes). Plain python writer (small fixtures)."""
    with gzip.open(path, "wt", compresslevel=6) as f:
        for i, (name, codes) in enumerate(reads):
            c = f" {comments[i]}" if comments is not None else ""
            s = codes_to_str(codes)
            f.write(f"@{name}{c}\n{s}\n+\n{'I' * len(s)}\n")


def sample_fragments(rng, seqs, n, flen=180, rlen=60):
    """Return (tx, start, frag_codes list) for n fragments."""
    lens = np.array([s.shape[0] for s in seqs])
    usable = np.flatnonzero(lens >= flen + 4)
    frs = []
    for i in range(n):
        t = int(usable[rng.integers(0, usable.shape[0])])
        start = int(rng.integers(0, lens[t] - flen + 1))
        frs.append(seqs[t][start : start + flen])
    return frs


def rand_codes(rng, n):
    return rng.integers(0, 4, n).astype(np.uint8)


def make_smartseq3(seqs, rng):
    """4-file SMARTSEQ3 run: ~60% tagged UMI reads, ~40% internal reads,
    plus tag-with-1-mismatch, tag-with-2-mismatches, too-short-R1 cases."""
    n = 4000
    frags = sample_fragments(rng, seqs, n, flen=180, rlen=60)
    i1, i2, r1, r2 = [], [], [], []
    tagc = np.frombuffer(TAG.encode(), np.uint8)
    from kallisto_tpu.io.fastx import BASE_CODE

    tag_codes = BASE_CODE[tagc]
    for i, fr in enumerate(frags):
        name = f"r{i:06d}"
        bc1 = rand_codes(rng, 8)
        bc2 = rand_codes(rng, 8)
        cdna1 = fr[:60]
        cdna2 = revcomp(fr[-60:])
        kind = i % 10
        if kind < 5:
            # clean tagged UMI read
            umi = rand_codes(rng, 8)
            head = np.concatenate([tag_codes, umi, np.array([2, 2, 2], np.uint8)])
            row1 = np.concatenate([head, cdna1])
        elif kind < 6:
            # tag with one mismatch: still detected (hamming <= 1)
            t = tag_codes.copy()
            t[4] = (t[4] + 1) % 4
            umi = rand_codes(rng, 8)
            head = np.concatenate([t, umi, np.array([2, 2, 2], np.uint8)])
            row1 = np.concatenate([head, cdna1])
        elif kind < 7:
            # tag with two mismatches: NOT detected -> internal read
            t = tag_codes.copy()
            t[2] = (t[2] + 1) % 4
            t[8] = (t[8] + 2) % 4
            umi = rand_codes(rng, 8)
            head = np.concatenate([t, umi, np.array([2, 2, 2], np.uint8)])
            row1 = np.concatenate([head, cdna1])
        elif kind < 9:
            # internal read: cDNA from position 0
            row1 = np.concatenate([fr[:82]])
        else:
            # too-short R1 (under the 19-base UMI window): bad umi, skipped
            row1 = fr[:15]
        i1.append((name, bc1))
        i2.append((name, bc2))
        r1.append((name, row1))
        r2.append((name, cdna2))
    write_fastq(os.path.join(DATA, "ss3_I1.fastq.gz"), i1)
    write_fastq(os.path.join(DATA, "ss3_I2.fastq.gz"), i2)
    write_fastq(os.path.join(DATA, "ss3_R1.fastq.gz"), r1)
    write_fastq(os.path.join(DATA, "ss3_R2.fastq.gz"), r2)


def make_batches(seqs, rng):
    """Two paired bulk batches + two 10xv2 batches."""
    for b in range(2):
        n = 1500 + 500 * b
        frags = sample_fragments(rng, seqs, n, flen=180)
        r1 = [(f"b{b}r{i:06d}", fr[:60]) for i, fr in enumerate(frags)]
        r2 = [(f"b{b}r{i:06d}", revcomp(fr[-60:])) for i, fr in enumerate(frags)]
        write_fastq(os.path.join(DATA, f"bulkb{b}_1.fastq.gz"), r1)
        write_fastq(os.path.join(DATA, f"bulkb{b}_2.fastq.gz"), r2)
    for b in range(2):
        n = 1200 + 300 * b
        frags = sample_fragments(rng, seqs, n, flen=180)
        r1, r2 = [], []
        for i, fr in enumerate(frags):
            bc = rand_codes(rng, 16)
            umi = rand_codes(rng, 10)
            r1.append((f"s{b}r{i:06d}", np.concatenate([bc, umi])))
            r2.append((f"s{b}r{i:06d}", fr[:50]))
        write_fastq(os.path.join(DATA, f"sc_b{b}_1.fastq.gz"), r1)
        write_fastq(os.path.join(DATA, f"sc_b{b}_2.fastq.gz"), r2)


def make_interleaved():
    """Interleave sc_b0_1/sc_b0_2 into one FASTQ."""
    out = os.path.join(DATA, "interleaved_10x.fastq.gz")
    with gzip.open(os.path.join(DATA, "sc_b0_1.fastq.gz"), "rt") as a, \
         gzip.open(os.path.join(DATA, "sc_b0_2.fastq.gz"), "rt") as b, \
         gzip.open(out, "wt", compresslevel=6) as o:
        while True:
            ra = [a.readline() for _ in range(4)]
            rb = [b.readline() for _ in range(4)]
            if not ra[0]:
                break
            o.writelines(ra)
            o.writelines(rb)


def make_rx(seqs, rng):
    """Custom `-x 0,0,16:RX:1,0,0` run: UMI in the RX:Z: comment."""
    n = 2000
    frags = sample_fragments(rng, seqs, n, flen=180)
    r1, r2, c1, c2 = [], [], [], []
    for i, fr in enumerate(frags):
        name = f"x{i:06d}"
        bc = rand_codes(rng, 16)
        umi = codes_to_str(rand_codes(rng, 12))
        # every record carries RX:Z -- the reference indexes its umis
        # vector positionally and records without the tag shift it out of
        # bounds (UB), so mixed fixtures cannot be golden-pinned
        com = f"RX:Z:{umi}"
        r1.append((name, bc))
        r2.append((name, fr[:50]))
        c1.append(com)
        c2.append(com)
    write_fastq(os.path.join(DATA, "rx_R1.fastq.gz"), r1, comments=c1)
    write_fastq(os.path.join(DATA, "rx_R2.fastq.gz"), r2, comments=c2)


def make_bam(seqs, rng):
    """Unmapped BAM with CR/UR tags + the converted FASTQ pair."""
    sys.path.insert(0, os.path.dirname(HERE))
    from kallisto_tpu.io.bam import (
        BgzfWriter, aux_z, bam_header_bytes, encode_record, FSECONDARY,
    )

    n = 2000
    frags = sample_fragments(rng, seqs, n, flen=180)
    w = BgzfWriter(os.path.join(DATA, "sc10x.bam"))
    w.write(bam_header_bytes("@HD\tVN:1.6\tSO:unsorted\n", [], []))
    conv1, conv2 = [], []
    for i, fr in enumerate(frags):
        name = f"m{i:06d}".encode()
        bc = codes_to_str(rand_codes(rng, 16))
        umi = codes_to_str(rand_codes(rng, 10))
        seq = fr[:50]
        aux = aux_z(b"CR", bc) + aux_z(b"UR", umi)
        w.write(encode_record(
            -1, -1, 0, 0, 0x4, -1, -1, 0, name, [], seq,
            b"I" * 50, aux,
        ))
        if i % 23 == 0:
            # secondary alignment duplicate: must be skipped on input
            w.write(encode_record(
                -1, -1, 0, 0, 0x4 | FSECONDARY, -1, -1, 0, name, [], seq,
                b"I" * 50, aux,
            ))
        from kallisto_tpu.io.fastx import BASE_CODE

        conv1.append((f"m{i:06d}", BASE_CODE[
            np.frombuffer((bc + umi).encode(), np.uint8)
        ]))
        conv2.append((f"m{i:06d}", seq))
    w.close()
    write_fastq(os.path.join(DATA, "bamconv_R1.fastq.gz"), conv1)
    write_fastq(os.path.join(DATA, "bamconv_R2.fastq.gz"), conv2)


def main():
    rng = np.random.default_rng(20260820)
    seqs = load_transcripts()
    make_smartseq3(seqs, rng)
    make_batches(seqs, rng)
    make_interleaved()
    make_rx(seqs, rng)
    make_bam(seqs, rng)
    print("fixtures written to", DATA)


if __name__ == "__main__":
    main()
