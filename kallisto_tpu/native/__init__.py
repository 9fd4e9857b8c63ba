"""Native host runtime: C++ FASTQ reader producing device-ready batches.

Auto-builds `libktio.so` from ktio.cpp with g++ on first use (cached by
mtime).  Falls back cleanly: callers should catch ImportError/OSError from
`load()` and use the pure-Python reader instead.
"""

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ktio.cpp")
_LIB = os.path.join(_HERE, "libktio.so")
_ABI = 8

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


_STAMP = _LIB + ".flags"


def _host_flags() -> str:
    out = []
    try:
        if "avx2" in open("/proc/cpuinfo").read():
            out.append("avx2")
    except OSError:
        pass
    if os.path.exists("/usr/include/libdeflate.h"):
        out.append("deflate")
    return "+".join(out)


def _build() -> None:
    flags = _host_flags()
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _LIB, "-lz", "-pthread",
    ]
    # AVX2 pack fast path when the build host supports it (the fallback
    # scalar loop compiles everywhere); libdeflate when present (2-3x
    # faster BGZF block inflate than zlib)
    if "avx2" in flags:
        cmd.insert(1, "-mavx2")
    if "deflate" in flags:
        cmd.append("-ldeflate")
    subprocess.run(cmd, check=True, capture_output=True)
    # record the ISA the binary was built for: a cached -mavx2 .so reused
    # on a non-AVX2 host would SIGILL, so load() rebuilds on mismatch
    with open(_STAMP, "w") as f:
        f.write(flags)


def _stamp_matches() -> bool:
    try:
        return open(_STAMP).read() == _host_flags()
    except OSError:
        return False


def load() -> ctypes.CDLL:
    """Load (building if needed) the native IO library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
                or not _stamp_matches()):
            _build()
        lib = ctypes.CDLL(_LIB)
        if lib.ktio_abi_version() != _ABI:
            _build()
            lib = ctypes.CDLL(_LIB)
            if lib.ktio_abi_version() != _ABI:
                raise OSError("libktio ABI mismatch after rebuild")
        lib.ktio_open.restype = ctypes.c_void_p
        lib.ktio_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.ktio_next.restype = ctypes.c_int
        lib.ktio_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ktio_error.restype = ctypes.c_char_p
        lib.ktio_error.argtypes = [ctypes.c_void_p]
        lib.ktio_close.argtypes = [ctypes.c_void_p]
        lib.ktio_u64_lookup.restype = None
        lib.ktio_u64_lookup.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int,
        ]
        lib.ktio_kmer_scan.restype = None
        lib.ktio_kmer_scan.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.ktio_revcomp.restype = None
        lib.ktio_revcomp.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int,
        ]
        lib.ktio_wave1.restype = ctypes.c_void_p
        lib.ktio_wave1.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.ktio_wave1_nkeys.restype = ctypes.c_int64
        lib.ktio_wave1_nkeys.argtypes = [ctypes.c_void_p]
        lib.ktio_wave1_width.restype = ctypes.c_int32
        lib.ktio_wave1_width.argtypes = [ctypes.c_void_p]
        lib.ktio_wave1_fetch.restype = None
        lib.ktio_wave1_fetch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.ktio_wave1_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


class PackedBatch:
    """A batch of reads already in device upload format.

    packed: [n, Lp//4] uint8 2-bit codes; nmask: [n, Lp//8] uint8 N/pad
    bits (little bit order); lens: [n] int32; Lp: padded read length.
    """

    __slots__ = ("packed", "nmask", "lens", "Lp", "names", "quals")

    def __init__(self, packed, nmask, lens, Lp, names: Optional[List[bytes]] = None,
                 quals: Optional[List[bytes]] = None):
        self.packed = packed
        self.nmask = nmask
        self.lens = lens
        self.Lp = int(Lp)
        self.names = names
        self.quals = quals

    @property
    def n(self) -> int:
        return int(self.lens.shape[0])

    def row_codes(self, i: int) -> np.ndarray:
        """Decode one read back to uint8 base codes (0..3, 4=N/pad) --
        used only for rare host-fallback re-resolution."""
        pk = np.unpackbits(self.packed[i], bitorder="little").reshape(-1, 2)
        codes = (pk[:, 0] | (pk[:, 1] << 1)).astype(np.uint8)
        nm = np.unpackbits(self.nmask[i], bitorder="little")[: codes.shape[0]]
        return np.where(nm == 1, np.uint8(4), codes)


class NativeFastqReader:
    """Streaming reader over one (gzipped) FASTQ file, prefetching and
    packing batches on a native background thread."""

    def __init__(self, path: str, batch_reads: int, pad_to: int = 8,
                 min_len: int = 31, keep_names: bool = False,
                 io_threads: int = 4):
        self._lib = load()
        self._h = self._lib.ktio_open(
            path.encode(), batch_reads, pad_to, min_len, int(keep_names),
            int(io_threads),
        )
        if not self._h:
            raise OSError(f"ktio_open failed for {path}")
        self._keep_names = keep_names

    def next_batch(self) -> Optional[PackedBatch]:
        pk = ctypes.POINTER(ctypes.c_uint8)()
        nm = ctypes.POINTER(ctypes.c_uint8)()
        ln = ctypes.POINTER(ctypes.c_int32)()
        nme = ctypes.POINTER(ctypes.c_uint8)()
        noff = ctypes.POINTER(ctypes.c_int32)()
        n = ctypes.c_int32()
        Lp = ctypes.c_int32()
        rc = self._lib.ktio_next(
            self._h, ctypes.byref(pk), ctypes.byref(nm), ctypes.byref(ln),
            ctypes.byref(nme), ctypes.byref(noff), ctypes.byref(n),
            ctypes.byref(Lp),
        )
        if rc == 0:
            return None
        if rc < 0:
            raise IOError(self._lib.ktio_error(self._h).decode())
        B, L = n.value, Lp.value
        # copy out: the native buffers are reused on the next call
        packed = np.ctypeslib.as_array(pk, shape=(B, L // 4)).copy()
        nmask = np.ctypeslib.as_array(nm, shape=(B, L // 8)).copy()
        lens = np.ctypeslib.as_array(ln, shape=(B,)).copy()
        names = None
        if self._keep_names:
            off = np.ctypeslib.as_array(noff, shape=(B + 1,))
            nbytes = int(off[-1])
            raw = (
                bytes(np.ctypeslib.as_array(nme, shape=(nbytes,)))
                if nbytes else b""
            )
            names = [raw[off[i]:off[i + 1]] for i in range(B)]
        return PackedBatch(packed, nmask, lens, L, names)

    def close(self):
        if self._h:
            self._lib.ktio_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# 0 = auto (min(8, cpu_count)); build_index(threads=N) pins this for the
# build's native kernels, honoring the CLI's `index -t`
# (reference threads the Bifrost/MPHF/D-list build, KmerIndex.cpp:574-679)
DEFAULT_THREADS = 0


def _resolve_threads(n: int) -> int:
    if n > 0:
        return n
    if DEFAULT_THREADS > 0:
        return DEFAULT_THREADS
    return min(8, os.cpu_count() or 1)


def u64_lookup(keys_mixed_sorted, bucket_start, p: int, queries,
               n_threads: int = 0):
    """Multithreaded hashed membership over a sorted mixed-u64 table.

    Returns (idx into the sorted table with n for misses, hit bool array).
    """
    lib = load()
    m = queries.shape[0]
    out_idx = np.empty(m, np.int64)
    out_hit = np.empty(m, np.uint8)
    n_threads = _resolve_threads(n_threads)
    lib.ktio_u64_lookup(
        keys_mixed_sorted.ctypes.data, keys_mixed_sorted.shape[0],
        bucket_start.ctypes.data, p,
        np.ascontiguousarray(queries).ctypes.data, m,
        out_idx.ctypes.data, out_hit.ctypes.data, n_threads,
    )
    return out_idx, out_hit.astype(bool)


def kmer_scan(codes, k: int, n_threads: int = 0):
    """Rolling canonical k-mers (canon, is_fw, valid) over a code vector."""
    lib = load()
    n = codes.shape[0]
    W = n - k + 1
    if W <= 0:
        return (np.empty(0, np.uint64), np.empty(0, bool), np.empty(0, bool))
    canon = np.empty(W, np.uint64)
    is_fw = np.empty(W, np.uint8)
    valid = np.empty(W, np.uint8)
    n_threads = _resolve_threads(n_threads)
    lib.ktio_kmer_scan(
        np.ascontiguousarray(codes).ctypes.data, n, k,
        canon.ctypes.data, is_fw.ctypes.data, valid.ctypes.data, n_threads,
    )
    return canon, is_fw.astype(bool), valid.astype(bool)


def revcomp64(kmers, k: int, n_threads: int = 0):
    lib = load()
    out = np.empty(kmers.shape[0], np.uint64)
    n_threads = _resolve_threads(n_threads)
    lib.ktio_revcomp(
        np.ascontiguousarray(kmers).ctypes.data, kmers.shape[0], k,
        out.ctypes.data, n_threads,
    )
    return out


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False
