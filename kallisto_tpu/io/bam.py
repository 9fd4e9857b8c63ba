"""Minimal BAM/BGZF writer (htslib-free).

Produces spec-conformant BAM: BGZF blocks (gzip members with the BC extra
field) around the binary BAM payload.  Byte parity with the reference is
checked on the *decompressed* payload (BGZF block boundaries are a
compressor choice, not content).

reference containers: htslib sam_write1/bgzf_write as driven by
src/PseudoBam.cpp and src/ProcessReads.cpp:1962-2363.
"""

import struct
import zlib
from typing import List, Sequence, Tuple

import numpy as np

BAM_CMATCH = 0
BAM_CSOFT_CLIP = 4

FPAIRED = 0x1
FPROPER_PAIR = 0x2
FUNMAP = 0x4
FMUNMAP = 0x8
FREVERSE = 0x10
FMREVERSE = 0x20
FREAD1 = 0x40
FREAD2 = 0x80
FSECONDARY = 0x100

# base code (A=0,C=1,G=2,T=3,N=4) -> nt16 nibble
_NT16 = np.array([1, 2, 4, 8, 15], np.uint8)

_BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


class BgzfWriter:
    """Buffers payload bytes and emits <=64 KiB BGZF blocks."""

    MAX = 0xFF00  # htslib block payload size

    def __init__(self, path: str):
        self._f = open(path, "wb")
        self._buf = bytearray()

    def write(self, data: bytes) -> None:
        self._buf += data
        while len(self._buf) >= self.MAX:
            self._emit(bytes(self._buf[: self.MAX]))
            del self._buf[: self.MAX]

    def _emit(self, payload: bytes) -> None:
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        comp = co.compress(payload) + co.flush()
        bsize = len(comp) + 25 + 1
        block = (
            b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
            + struct.pack("<HHH", 6, 0x4342, 2)  # XLEN, 'BC', slen
            + struct.pack("<H", bsize - 1)
            + comp
            + struct.pack("<II", zlib.crc32(payload), len(payload))
        )
        self._f.write(block)

    def close(self) -> None:
        if self._buf:
            self._emit(bytes(self._buf))
            self._buf.clear()
        self._f.write(_BGZF_EOF)
        self._f.close()


def read_bgzf(path: str) -> bytes:
    """Decompress a BGZF (or plain gzip) file fully -- for tests/parity."""
    import gzip

    with gzip.open(path, "rb") as f:
        return f.read()


def bam_header_bytes(text: str, names: Sequence[str], lens: Sequence[int]) -> bytes:
    out = bytearray(b"BAM\x01")
    t = text.encode()
    out += struct.pack("<i", len(t))
    out += t
    out += struct.pack("<i", len(names))
    for n, l in zip(names, lens):
        nb = n.encode() + b"\x00"
        out += struct.pack("<i", len(nb)) + nb + struct.pack("<i", int(l))
    return bytes(out)


def reg2bin(beg: int, end: int) -> int:
    """reference: hts_reg2bin(beg, end, 14, 5) (htslib sam.h)."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def pack_seq_nt16(codes: np.ndarray) -> bytes:
    """Base codes -> 4-bit nt16 packed, high nibble first."""
    n = codes.shape[0]
    nib = _NT16[codes]
    if n % 2:
        nib = np.concatenate([nib, np.zeros(1, np.uint8)])
    return (nib[0::2] << 4 | nib[1::2]).tobytes()


def encode_record(
    refid: int,
    pos: int,
    mapq: int,
    bin_: int,
    flag: int,
    mtid: int,
    mpos: int,
    isize: int,
    qname: bytes,
    cigar: List[Tuple[int, int]],   # [(oplen, op)]
    seq_codes: np.ndarray,          # [L] uint8 base codes
    quals: bytes,                   # raw ASCII qualities (phred+33)
    aux: bytes,
) -> bytes:
    nlen = len(qname)
    extranul = 3 - (nlen % 4)
    l_read_name = nlen + extranul + 1
    l_seq = seq_codes.shape[0]
    body = bytearray()
    body += struct.pack(
        "<iiBBHHHiiii",
        refid, pos, l_read_name, mapq, bin_, len(cigar), flag,
        l_seq, mtid, mpos, isize,
    )
    body += qname + b"\x00" * (extranul + 1)
    for oplen, op in cigar:
        body += struct.pack("<I", (oplen << 4) | op)
    body += pack_seq_nt16(seq_codes)
    body += bytes(bytearray((q - 33) & 0xFF for q in quals[:l_seq]))
    body += aux
    return struct.pack("<i", len(body)) + bytes(body)


def aux_i(tag: bytes, val: int) -> bytes:
    return tag + b"i" + struct.pack("<i", val)


def aux_f(tag: bytes, val: float) -> bytes:
    return tag + b"f" + struct.pack("<f", val)
