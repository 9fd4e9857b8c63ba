"""Two-wave anchor pseudoalignment: the TPU-native jump/skip heuristic.

The branchless turbo kernel (ops/turbo.py) probes EVERY k-mer window of
every read (~W gathers + [B, W] elementwise work per mate).  The
reference instead resolves most reads with a handful of probes by
jumping along unitig stretches (src/KmerIndex.cpp:1776-1887).  This
kernel is the data-parallel equivalent:

wave 1 (anchors) -- probe n_anchors windows per read (first, last, and
interior anchors spaced <= k apart).  If all anchors land on ONE unitig,
same strand, with exactly consistent positions, the whole read provably
matches that unitig stretch: anchors spaced s <= k overlap pairwise, so
their window equalities chain into read[0 : wlast+k] == unitig segment,
which means every intermediate window hits the index at the interpolated
position.  The read's distinct EC rows are then exactly the block ECs of
the contiguous block-id range [block(p_lo), block(p_hi)] (blocks are
unitig-major and position-ascending -- asserted at index load), fetched
as two 8-wide rows of block_ec8.  No per-window work at all.

wave 2 -- reads that fail verification (any anchor miss, unitig
junction, in-read N, block span > 16) are compacted into a fixed-size
sub-batch and evaluated by the full branchless core.  The sub-batch
capacity is `wave2_cap` rows (or B/wave2_denom when unset): the caller
sizes it adaptively from each batch's reported failure count (the ck
meta row carries n_fail; quant/pipeline.py keeps per-bucket hints), so
steady state pays per-window work only for the reads that actually
need it (~5-25% on typical short-read data).
If more reads fail than the sub-batch holds, the batch's key histogram
is marked overflowed (n_uniq = max_keys + 1) and the host re-runs it
through a branchless full pass -- the same fallback contract the turbo
path already has.

Semantics are identical to the exhaustive evaluation (the verified
derivation is a theorem, not a heuristic); parity is pinned by
tests/test_anchor.py against the turbo kernel on error-containing reads.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pseudoalign import (
    INT32_MAX,
    SideResult,
    _ck_flat,
    _codes_from_packed,
    _pseudoalign_core,
    compact_pair_keys,
    compact_single_keys,
    lookup_kmers,
    pos_col_pair,
    pos_filter_rank,
)
from .turbo import AUX_HEADER


def n_anchors_for(Lp: int, k: int) -> int:
    """Static anchor count: interior anchors keep every gap <= k."""
    span = max(Lp - k, 0)
    return max(2, -(-span // k) + 1)


def _anchor_canon(codes: jnp.ndarray, w, k: int):
    """Canonical k-mer of the window starting at (traced scalar) w.

    Returns (canon, is_fw, clean) [B2]; clean = window free of N codes.
    """
    sl = jax.lax.dynamic_slice_in_dim(codes, w, k, axis=1)
    f = jnp.zeros(codes.shape[0], jnp.int64)
    r = jnp.zeros(codes.shape[0], jnp.int64)
    anyN = jnp.zeros(codes.shape[0], bool)
    for d in range(k):
        cd = sl[:, d]
        anyN = anyN | (cd >= 4)
        c2 = (cd & 3).astype(jnp.int64)
        f = (f << 2) | c2
        r = r | ((3 - c2) << (2 * d))
    is_fw = f <= r
    return jnp.where(is_fw, f, r), is_fw, ~anyN


def _anchor_side(didx, codes, rlen, real, k: int, max_rows: int,
                 n_anchors: int, wave2_cap: int):
    """One mate's anchor + wave-2 evaluation -> SideResult."""
    B2 = codes.shape[0]
    R = max_rows
    wlast = jnp.maximum(rlen - k, 0)
    n_gaps = n_anchors - 1
    ws = [(wlast * j) // n_gaps for j in range(n_anchors)]

    cans, fws, cleans = [], [], []
    for w in ws:
        c, fw, cl = _anchor_canon(codes, w, k)
        cans.append(c)
        fws.append(fw)
        cleans.append(cl)
    canA = jnp.stack(cans, axis=1)
    fwA = jnp.stack(fws, axis=1)
    cleanA = jnp.stack(cleans, axis=1)
    long_enough = rlen >= k
    validA = cleanA & long_enough & real[:, None]

    idxA, hitA, _ = lookup_kmers(didx, canA, validA)
    uidA = jnp.where(hitA, didx.kmer_uid[idxA], -1)
    uposA = jnp.where(hitA, didx.kmer_pos[idxA], 0).astype(jnp.int32)
    strandA = fwA == didx.kmer_fw[idxA]
    blkA = jnp.where(hitA, didx.kmer_block[idxA], 0)

    ok = jnp.all(hitA, axis=1)
    ok &= jnp.all(uidA == uidA[:, :1], axis=1)
    ok &= jnp.all(strandA == strandA[:, :1], axis=1)
    sgn = jnp.where(strandA[:, 0], 1, -1).astype(jnp.int32)
    for j in range(1, n_anchors):
        ok &= uposA[:, j] == uposA[:, 0] + sgn * ws[j].astype(jnp.int32)
    blo = jnp.min(blkA, axis=1)
    bhi = jnp.max(blkA, axis=1)
    r0 = blo >> 3
    ok &= (bhi >> 3) <= r0 + 1   # candidates fit in two 8-wide rows
    ok &= blo >= 0
    ok &= real & long_enough

    # verified rows: distinct sorted block ECs over [blo, bhi]
    cand = jnp.concatenate(
        [didx.block_ec8[r0], didx.block_ec8[r0 + 1]], axis=1
    )
    fid = (r0 * 8)[:, None] + jnp.arange(16, dtype=blo.dtype)[None, :]
    inr = (fid >= blo[:, None]) & (fid <= bhi[:, None])
    vr = jnp.where(inr & (cand >= 0), cand, INT32_MAX)
    slots = []
    prev = jnp.full((B2,), -1, jnp.int32)
    for _ in range(min(R, 16)):
        cur = jnp.min(jnp.where(vr > prev[:, None], vr, INT32_MAX), axis=1)
        slots.append(cur)
        prev = jnp.where(cur != INT32_MAX, cur, prev)
    while len(slots) < R:
        slots.append(jnp.full((B2,), INT32_MAX, jnp.int32))
    rows_v = jnp.stack(slots, axis=1)
    ovf_v = jnp.any((vr > prev[:, None]) & (vr != INT32_MAX), axis=1)

    # ---- wave 2: compact failures into a fixed sub-batch ---------------
    fail = (~ok) & real & long_enough
    Bf = max(min(wave2_cap, B2), 1)
    order = jnp.argsort(~fail, stable=True)   # failures first, read order
    sel = order[:Bf]
    sfail = fail[sel]
    codes_f = codes[sel]
    lens_f = jnp.where(sfail, rlen, 0).astype(jnp.int32)
    core = _pseudoalign_core(didx, codes_f, lens_f, k, R)
    n_fail = jnp.sum(fail)
    w2_overflow = n_fail > Bf

    def merge(base, sub):
        cur = base[sel]
        m = sfail
        if sub.ndim == 2:
            m = m[:, None]
        return base.at[sel].set(jnp.where(m, sub, cur))

    rows = merge(jnp.where(ok[:, None], rows_v, INT32_MAX), core.rows)
    n_rows = merge(
        jnp.where(ok, jnp.sum(rows_v != INT32_MAX, axis=1), 0).astype(
            jnp.int32
        ),
        core.n_rows,
    )
    has_hits = merge(ok, core.has_hits)
    overflow = merge(ok & ovf_v, core.overflow)
    f_uid = merge(jnp.where(ok, uidA[:, 0], -1), core.f_uid)
    f_block = merge(jnp.where(ok, blkA[:, 0], -1), core.f_block)
    f_upos = merge(jnp.where(ok, uposA[:, 0], -1), core.f_upos)
    f_rpos = merge(
        jnp.where(ok, 0, -1).astype(jnp.int32), core.f_rpos
    )
    f_strand = merge(strandA[:, 0], core.f_strand)
    rng = merge(
        jnp.where(ok, wlast, -1).astype(jnp.int32), core.rng
    )
    side = SideResult(
        rows=rows, n_rows=n_rows, has_hits=has_hits, overflow=overflow,
        f_uid=f_uid, f_block=f_block, f_upos=f_upos, f_rpos=f_rpos,
        f_strand=f_strand, rng=rng,
    )
    return side, w2_overflow, n_fail


def _apply_aux(packed_sides, aux, L: int, rl: int = 0):
    B = packed_sides[0].shape[0]
    ns = len(packed_sides)
    codes = jnp.concatenate(
        [_codes_from_packed(p, L) for p in packed_sides], axis=0
    )
    exc = aux[AUX_HEADER:]
    codes = (
        codes.reshape(-1).at[exc].set(jnp.uint8(4), mode="drop")
        .reshape(ns * B, L)
    )
    if 0 < rl < L:
        # uniform read length known statically: drop the packed-row padding
        # columns before any window work (see turbo._codes_and_lens)
        codes = codes[:, :rl]
    rlen = aux[0].astype(jnp.int32)
    n_real = aux[1].astype(jnp.int32)
    real = (jnp.arange(ns * B, dtype=jnp.int32) % B) < n_real
    return codes, rlen, real


def _wave2_cap(B2: int, wave2_cap, wave2_denom: int) -> int:
    return wave2_cap if wave2_cap else max(B2 // wave2_denom, 1)


@partial(jax.jit, static_argnames=(
    "k", "L", "max_rows", "max_keys", "n_anchors", "wave2_denom",
    "min_range", "strand_key", "rl", "wave2_cap", "pos_fl", "pos_depth",
))
def pseudoalign_pair_anchor(
    didx, p1, p2, aux, k: int, L: int, max_rows: int = 16,
    max_keys: int = 32768, n_anchors: int = 2, wave2_denom: int = 2,
    min_range: int = 0, strand_key: bool = False,
    rl: int = 0, wave2_cap: int = 0, pos_fl: int = -1, pos_depth: int = 0,
):
    B = p1.shape[0]
    codes, rlen, real = _apply_aux((p1, p2), aux, L, rl)
    side, w2of, n_fail = _anchor_side(
        didx, codes, rlen, real, k, max_rows, n_anchors,
        _wave2_cap(2 * B, wave2_cap, wave2_denom),
    )
    r1 = SideResult(*(a[:B] for a in side))
    r2 = SideResult(*(a[B:] for a in side))
    pc = (
        pos_col_pair(didx, r1, r2, pos_fl, pos_depth) if pos_fl >= 0 else None
    )
    ck = compact_pair_keys(
        r1, r2, max_keys, k=k, min_range=min_range, strand_key=strand_key,
        pos_col=pc,
    )
    ck = ck._replace(
        n_uniq=jnp.where(w2of, jnp.int32(max_keys + 1), ck.n_uniq)
    )
    return r1, r2, _ck_flat(ck, n_fail=n_fail)


@partial(jax.jit, static_argnames=(
    "k", "L", "max_rows", "max_keys", "n_anchors", "wave2_denom",
    "min_range", "strand_key", "rl", "wave2_cap", "pos_fl", "pos_depth",
))
def pseudoalign_single_anchor(
    didx, p1, aux, k: int, L: int, max_rows: int = 16,
    max_keys: int = 32768, n_anchors: int = 2, wave2_denom: int = 2,
    min_range: int = 0, strand_key: bool = False,
    rl: int = 0, wave2_cap: int = 0, pos_fl: int = -1, pos_depth: int = 0,
):
    codes, rlen, real = _apply_aux((p1,), aux, L, rl)
    side, w2of, n_fail = _anchor_side(
        didx, codes, rlen, real, k, max_rows, n_anchors,
        _wave2_cap(p1.shape[0], wave2_cap, wave2_denom),
    )
    pc = pos_filter_rank(didx, side, pos_fl, pos_depth) if pos_fl >= 0 else None
    ck = compact_single_keys(
        side, max_keys, k=k, min_range=min_range, strand_key=strand_key,
        pos_col=pc,
    )
    ck = ck._replace(
        n_uniq=jnp.where(w2of, jnp.int32(max_keys + 1), ck.n_uniq)
    )
    return side, _ck_flat(ck, n_fail=n_fail)
