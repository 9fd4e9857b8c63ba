"""Host-side wave-1 anchor probing (the link-wall breaker).

Under a tunneled TPU the host->device link (~45 MB/s) caps steady-state
pseudoalignment at ~1.6M pairs/s when every packed read is uploaded
(~28 B/pair).  This module runs wave 1 of the two-wave anchor kernel
(ops/anchor.py) on the HOST via native/ktio.cpp `ktio_wave1`: a few k-mer
probes per mate either *prove* the read matches one unitig stretch
(anchors spaced <= k overlap pairwise, so their window equalities chain
into read == unitig segment -- the same theorem the device kernel relies
on) or fail it to wave 2.  Verified pairs are reduced to a compact-key
histogram right in C++ (identical exemplar layout to the device
compact-key path, own 128-bit hash namespace); only FAILING reads'
packed codes are uploaded for the branchless full evaluation on the TPU.

Semantics are bit-identical to the pure-device path: verified reads'
row sets / first-hit fields equal the exhaustive evaluation by the
stretch theorem, failing reads are evaluated exhaustively on device,
and the pipeline merges host + device keys by first-occurrence read
index so EC numbering matches a single-threaded reference run.

reference: the relocated jump/skip heuristic, src/KmerIndex.cpp:1776-1887.
"""

import ctypes
import os
from typing import NamedTuple, Optional

import numpy as np

from ..native import load
from .anchor import n_anchors_for
from .pseudoalign import ProbeLayout, pos_tables_from_host, probe_layout


class HostKeys(NamedTuple):
    """One batch's wave-1 outcome."""

    fail_idx: np.ndarray   # [n_fail] int32 ascending read indices -> device
    fail_side: np.ndarray  # [n_fail] uint8: 1/2 = only that mate failed
    #                        (other mate's summary packs), 3 = both upload
    fail_vsum: np.ndarray  # [n_fail, 2] int32 packed verified-mate summary
    #                        (blo, upos0<<5 | span<<1 | strand); side 1/2 only
    h128: np.ndarray       # [K, 2] int64 key hashes (host namespace)
    occ: np.ndarray        # [K] int64 multiplicity
    first_idx: np.ndarray  # [K] int64 first-occurrence read index
    exemplars: np.ndarray  # [K, W] int32 key content (resolver layout)
    # pseudobam fast path (None unless perread=True): per-read key hash
    # h1 (0 for failing reads) + per-mate (f_block, upos0<<1|strand)
    read_h1: Optional[np.ndarray] = None   # [n] uint64
    vinfo: Optional[np.ndarray] = None     # [n, 4] int32
    read_tl: Optional[np.ndarray] = None   # [n] int32 mapPair fragment
    #                        length (-1 = not inferable / failing pair)


class HostProbe:
    """Per-run host probe: owns the (shared) sorted tables + config."""

    def __init__(self, index, layout: Optional[ProbeLayout] = None,
                 min_range: int = 0, strand_key: bool = False,
                 pos_key: bool = False, pos_fl: int = -1,
                 R: int = 16, n_threads: int = 0):
        self._lib = load()
        if layout is None:
            layout = probe_layout(index)
        order = layout.order
        self._mk = np.ascontiguousarray(layout.mk)
        self._bucket_start = np.ascontiguousarray(layout.bucket_start)
        self._p = layout.p
        self._uid = np.ascontiguousarray(index.kmer_uid[order].astype(np.int32))
        self._pos = np.ascontiguousarray(index.kmer_pos[order].astype(np.int32))
        self._fw = np.ascontiguousarray(index.kmer_fw[order].astype(np.uint8))
        self._block = np.ascontiguousarray(
            index.kmer_block[order].astype(np.int32)
        )
        self._block_ec = np.ascontiguousarray(index.block_ec.astype(np.int32))
        self.k = index.k
        self.R = R
        self.min_range = min_range
        # tail layout mirrors ops/pseudoalign._gather_*_exemplars
        self.tail_mode = 2 if pos_key else (1 if strand_key else 0)
        self.pos_fl = pos_fl if pos_key else -1
        self._pf_ptr = self._pf_base = None
        self._pf_np = 0
        if pos_key and pos_fl >= 0:
            pf_ptr, pf_base, _ = pos_tables_from_host(index)
            self._pf_ptr = np.ascontiguousarray(pf_ptr)
            self._pf_base = np.ascontiguousarray(pf_base)
            self._pf_np = pf_base.shape[0] // 2
        if n_threads <= 0:
            n_threads = os.cpu_count() or 1
        self.n_threads = n_threads
        self.width = self._exemplar_width(paired=True)

    def _exemplar_width(self, paired: bool) -> int:
        W = (2 * self.R + 1) if paired else (self.R + 1)
        per = 2 if paired else 1
        if self.tail_mode >= 1:
            W += 2 * per
        if self.tail_mode >= 2:
            W += 2 * per
        return W

    def _ptr(self, a: Optional[np.ndarray]):
        return a.ctypes.data if a is not None else None

    def _probe(self, b1, b2, rl: int, perread: bool = False) -> HostKeys:
        n = b1.lens.shape[0]
        wlast = rl - self.k
        na = n_anchors_for(rl, self.k)
        ws = np.array(
            [(wlast * j) // (na - 1) for j in range(na)], np.int32
        )
        fail_idx = np.empty(n, np.int32)
        fail_side = np.empty(n, np.uint8)
        fail_vsum = np.empty((n, 2), np.int32)
        read_h1 = np.zeros(n, np.uint64) if perread else None
        vinfo = np.zeros((n, 4), np.int32) if perread else None
        read_tl = np.full(n, -1, np.int32) if perread else None
        n_fail = ctypes.c_int64()
        h = self._lib.ktio_wave1(
            self._mk.ctypes.data, self._mk.shape[0],
            self._bucket_start.ctypes.data, self._p,
            self._uid.ctypes.data, self._pos.ctypes.data,
            self._fw.ctypes.data, self._block.ctypes.data,
            self._block_ec.ctypes.data, self._block_ec.shape[0],
            self._ptr(self._pf_ptr), self._ptr(self._pf_base), self._pf_np,
            b1.packed.ctypes.data, b1.nmask.ctypes.data,
            b2.packed.ctypes.data if b2 is not None else None,
            b2.nmask.ctypes.data if b2 is not None else None,
            n, b1.Lp, rl, self.k,
            self.R, na, ws.ctypes.data,
            self.min_range, self.tail_mode, self.pos_fl, self.n_threads,
            fail_idx.ctypes.data, fail_side.ctypes.data,
            fail_vsum.ctypes.data, ctypes.byref(n_fail),
            read_h1.ctypes.data if perread else None,
            vinfo.ctypes.data if perread else None,
            read_tl.ctypes.data if perread else None,
        )
        try:
            K = self._lib.ktio_wave1_nkeys(h)
            W = self._lib.ktio_wave1_width(h)
            h1 = np.empty(K, np.uint64)
            h2 = np.empty(K, np.uint64)
            first = np.empty(K, np.int64)
            count = np.empty(K, np.int64)
            ex = np.empty((K, W), np.int32)
            if K:
                self._lib.ktio_wave1_fetch(
                    h, h1.ctypes.data, h2.ctypes.data, first.ctypes.data,
                    count.ctypes.data, ex.ctypes.data,
                )
        finally:
            self._lib.ktio_wave1_free(h)
        h128 = np.stack(
            [h1.view(np.int64), h2.view(np.int64)], axis=1
        )
        nf = int(n_fail.value)
        return HostKeys(
            fail_idx=fail_idx[:nf].copy(),
            fail_side=fail_side[:nf].copy(),
            fail_vsum=fail_vsum[:nf].copy(),
            h128=np.ascontiguousarray(h128),
            occ=count, first_idx=first, exemplars=ex,
            read_h1=read_h1, vinfo=vinfo, read_tl=read_tl,
        )

    def probe_pair(self, b1, b2, rl: int, perread: bool = False) -> HostKeys:
        """Wave-1 both mates of a uniform-length pair batch."""
        assert b1.Lp == b2.Lp
        return self._probe(b1, b2, rl, perread)

    def probe_single(self, b1, rl: int, perread: bool = False) -> HostKeys:
        return self._probe(b1, None, rl, perread)
