"""Turbo steady-state pseudoalignment step: huge bucketed batches.

The steady-state quant/bus hot path dispatches batches of ~1M pairs.  Two
things distinguish these kernels from the legacy compact ones
(ops/pseudoalign.py pseudoalign_*_compact_*), which they otherwise share
all device code with:

- **aux vector** instead of per-array variation: one int32x8-packed int64
  vector carries the uniform read length, the real-read count (batches are
  padded up to bucketed power-of-two sizes so jit shapes stay stable --
  padded reads get length 0, produce the no-hit key and are never
  counted), and the sparse in-read N positions (a 7-byte/read N bitmask
  replaced by a short exception list; Ns are rare in real data).
- **bigger key-histogram cap** (max_keys=32768), sized for million-pair
  batches.

The heavy lifting -- single-row-gather bucket probes chunked under
lax.map, min-extraction distinct-row compaction -- lives in
_pseudoalign_core/lookup_kmers and is shared with every other path.

Semantics are identical to the reference's --no-jump evaluation of every
k-mer (reference: src/KmerIndex.cpp:1698-1940; the jump/skip heuristics
are a CPU latency optimization with the same EC intersection).
"""

from functools import partial
from typing import Optional

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
    pos_col_pair,
    pos_filter_rank,
)

AUX_HEADER = 4
EXC_CAP = 65536


def make_aux(
    n_real: int,
    rlen: int,
    exc: Optional[np.ndarray],
    cap: int = EXC_CAP,
) -> Optional[np.ndarray]:
    """Host-side aux vector: [rlen, n_real, 0, 0, exc..., sentinel pad].

    exc are flattened indices into the row-major concatenated
    [n_sides * Bp, Lp] code matrix; returns None when they exceed cap
    (caller falls back to the legacy bitmask path).
    """
    n = 0 if exc is None else int(exc.shape[0])
    if n > cap:
        return None
    aux = np.full(AUX_HEADER + cap, np.iinfo(np.int64).max, np.int64)
    aux[0] = rlen
    aux[1] = n_real
    aux[2] = 0
    aux[3] = 0
    if n:
        aux[AUX_HEADER : AUX_HEADER + n] = exc
    return aux


def _codes_and_lens(packed_sides, aux, lens, L: int, rl: int = 0):
    """Unpack packed mates, scatter N markers, build masked lens vector.

    rl > 0 (the uniform read length, a static trace constant) trims the
    code matrix to [*, rl] BEFORE window evaluation: packed rows pad L up
    to a byte multiple, and every padding column would otherwise cost a
    full per-window probe in the core (~23% of all gathers at 50 bp)."""
    B = packed_sides[0].shape[0]
    ns = len(packed_sides)
    codes = jnp.concatenate(
        [_codes_from_packed(p, L) for p in packed_sides], axis=0
    )
    exc = aux[AUX_HEADER:]
    codes = (
        codes.reshape(-1)
        .at[exc]
        .set(jnp.uint8(4), mode="drop")
        .reshape(ns * B, L)
    )
    if 0 < rl < L:
        codes = codes[:, :rl]
    n_real = aux[1].astype(jnp.int32)
    side_idx = jnp.arange(B * ns, dtype=jnp.int32) % B
    if lens is None:
        lens_v = jnp.where(side_idx < n_real, aux[0].astype(jnp.int32), 0)
    else:
        lens_v = jnp.where(side_idx < n_real, lens.astype(jnp.int32), 0)
    return codes, lens_v


def pair_turbo_core(didx, p1, p2, aux, lens, k: int, L: int,
                    max_rows: int, max_keys: int,
                    min_range: int = 0, strand_key: bool = False,
                    rl: int = 0, pos_fl: int = -1, pos_depth: int = 0,
                    with_slots: bool = False):
    """Shared traced body (usable per-shard under shard_map)."""
    B = p1.shape[0]
    codes, lens_v = _codes_and_lens((p1, p2), aux, lens, L, rl)
    r = _pseudoalign_core(didx, codes, lens_v, k, max_rows)
    r1 = SideResult(*(a[:B] for a in r))
    r2 = SideResult(*(a[B:] for a in r))
    pc = (
        pos_col_pair(didx, r1, r2, pos_fl, pos_depth) if pos_fl >= 0 else None
    )
    out = compact_pair_keys(
        r1, r2, max_keys, k=k, min_range=min_range, strand_key=strand_key,
        pos_col=pc, with_slots=with_slots,
    )
    if with_slots:
        ck, slots = out
        return r1, r2, _ck_flat(ck), slots
    return r1, r2, _ck_flat(out)


@partial(jax.jit, static_argnames=(
    "k", "L", "max_rows", "max_keys", "min_range", "strand_key", "rl",
    "pos_fl", "pos_depth", "with_slots"))
def pseudoalign_pair_turbo(didx, p1, p2, aux, k: int, L: int,
                           max_rows: int = 16, max_keys: int = 32768,
                           min_range: int = 0, strand_key: bool = False,
                           rl: int = 0, pos_fl: int = -1, pos_depth: int = 0,
                           with_slots: bool = False):
    return pair_turbo_core(didx, p1, p2, aux, None, k, L, max_rows, max_keys,
                           min_range, strand_key, rl, pos_fl, pos_depth,
                           with_slots)


@partial(jax.jit, static_argnames=(
    "k", "L", "max_rows", "max_keys", "min_range", "strand_key",
    "pos_fl", "pos_depth"))
def pseudoalign_pair_turbo_varlen(didx, p1, p2, aux, lens, k: int, L: int,
                                  max_rows: int = 16, max_keys: int = 32768,
                                  min_range: int = 0,
                                  strand_key: bool = False,
                                  pos_fl: int = -1, pos_depth: int = 0):
    return pair_turbo_core(didx, p1, p2, aux, lens, k, L, max_rows, max_keys,
                           min_range, strand_key, 0, pos_fl, pos_depth)


def _verified_side_from_summary(didx, vsum, R: int, lens_v, k: int):
    """Reconstruct a host-wave-1-VERIFIED mate's SideResult from its packed
    8-byte summary (blo; upos0<<5 | span<<1 | strand).

    rows = distinct sorted block ECs over the contiguous block range
    [blo, blo+span], fetched as two 8-wide block_ec8 rows -- the same
    derivation (and the same stretch theorem) as the anchor kernel's
    verified wave (ops/anchor.py _anchor_side); the host only emits a
    summary when the range fits two rows and rows <= R.  Padding rows
    (lens_v == 0) stay no-hit."""
    blo = vsum[:, 0]
    meta = vsum[:, 1]
    real = lens_v > 0
    strand = (meta & 1) == 1
    span = (meta >> 1) & 15
    upos0 = meta >> 5
    bhi = blo + span
    B2 = blo.shape[0]
    r0 = jnp.maximum(blo, 0) >> 3
    cand = jnp.concatenate(
        [didx.block_ec8[r0], didx.block_ec8[r0 + 1]], axis=1
    )
    fid = (r0 * 8)[:, None] + jnp.arange(16, dtype=blo.dtype)[None, :]
    inr = (fid >= blo[:, None]) & (fid <= bhi[:, None]) & real[:, None]
    vr = jnp.where(inr & (cand >= 0), cand, INT32_MAX)
    slots = []
    prev = jnp.full((B2,), -1, jnp.int32)
    for _ in range(min(R, 16)):
        cur = jnp.min(jnp.where(vr > prev[:, None], vr, INT32_MAX), axis=1)
        slots.append(cur)
        prev = jnp.where(cur != INT32_MAX, cur, prev)
    while len(slots) < R:
        slots.append(jnp.full((B2,), INT32_MAX, jnp.int32))
    rows = jnp.stack(slots, axis=1)
    return SideResult(
        rows=rows,
        n_rows=jnp.sum(rows != INT32_MAX, axis=1).astype(jnp.int32),
        has_hits=real,
        overflow=jnp.zeros(B2, bool),
        f_uid=jnp.where(real, 0, -1).astype(jnp.int32),
        f_block=jnp.where(real, jnp.where(strand, blo, bhi), -1).astype(
            jnp.int32
        ),
        f_upos=jnp.where(real, upos0, -1).astype(jnp.int32),
        f_rpos=jnp.where(real, 0, -1).astype(jnp.int32),
        f_strand=strand,
        rng=jnp.where(real, lens_v - k, -1).astype(jnp.int32),
    )


def halffail_core(didx, pkf, vsum, sidev, aux, k: int, L: int,
                  max_rows: int, max_keys: int,
                  min_range: int = 0, strand_key: bool = False,
                  rl: int = 0, pos_fl: int = -1, pos_depth: int = 0,
                  with_slots: bool = False):
    """Wave-2 step for pairs where exactly ONE mate failed wave 1: only
    the failed mate's packed codes upload; the verified mate rides its
    8-byte summary.  sidev = 1 when mate1 is the failed one, 2 for mate2.
    Cuts wave-2 upload bytes ~45% and kernel rows ~50% vs re-evaluating
    both mates (the link is the end-to-end bottleneck)."""
    codes, lens_v = _codes_and_lens((pkf,), aux, None, L, rl)
    rf = _pseudoalign_core(didx, codes, lens_v, k, max_rows)
    # the core clamps the row budget to the window count; the verified
    # side must use the SAME effective width
    rv = _verified_side_from_summary(
        didx, vsum, int(rf.rows.shape[1]), lens_v, k
    )
    m1 = sidev == 1

    def sel(a, b):
        m = m1[:, None] if a.ndim == 2 else m1
        return jnp.where(m, a, b)

    r1 = SideResult(*(sel(fa, va) for fa, va in zip(rf, rv)))
    r2 = SideResult(*(sel(va, fa) for fa, va in zip(rf, rv)))
    pc = (
        pos_col_pair(didx, r1, r2, pos_fl, pos_depth) if pos_fl >= 0 else None
    )
    out = compact_pair_keys(
        r1, r2, max_keys, k=k, min_range=min_range, strand_key=strand_key,
        pos_col=pc, with_slots=with_slots,
    )
    if with_slots:
        ck, slots = out
        return r1, r2, _ck_flat(ck), slots
    return r1, r2, _ck_flat(out)


@partial(jax.jit, static_argnames=(
    "k", "L", "max_rows", "max_keys", "min_range", "strand_key", "rl",
    "pos_fl", "pos_depth", "with_slots"))
def pseudoalign_pair_halffail(didx, pkf, vsum, sidev, aux, k: int, L: int,
                              max_rows: int = 16, max_keys: int = 32768,
                              min_range: int = 0, strand_key: bool = False,
                              rl: int = 0, pos_fl: int = -1,
                              pos_depth: int = 0, with_slots: bool = False):
    return halffail_core(didx, pkf, vsum, sidev, aux, k, L, max_rows,
                         max_keys, min_range, strand_key, rl, pos_fl,
                         pos_depth, with_slots)


def single_turbo_core(didx, p1, aux, lens, k: int, L: int,
                      max_rows: int, max_keys: int,
                      min_range: int = 0, strand_key: bool = False,
                      rl: int = 0, pos_fl: int = -1, pos_depth: int = 0):
    codes, lens_v = _codes_and_lens((p1,), aux, lens, L, rl)
    r1 = _pseudoalign_core(didx, codes, lens_v, k, max_rows)
    pc = pos_filter_rank(didx, r1, pos_fl, pos_depth) if pos_fl >= 0 else None
    ck = compact_single_keys(
        r1, max_keys, k=k, min_range=min_range, strand_key=strand_key,
        pos_col=pc,
    )
    return r1, _ck_flat(ck)


@partial(jax.jit, static_argnames=(
    "k", "L", "max_rows", "max_keys", "min_range", "strand_key", "rl",
    "pos_fl", "pos_depth"))
def pseudoalign_single_turbo(didx, p1, aux, k: int, L: int,
                             max_rows: int = 16, max_keys: int = 32768,
                             min_range: int = 0, strand_key: bool = False,
                             rl: int = 0, pos_fl: int = -1,
                             pos_depth: int = 0):
    return single_turbo_core(didx, p1, aux, None, k, L, max_rows, max_keys,
                             min_range, strand_key, rl, pos_fl, pos_depth)


@partial(jax.jit, static_argnames=(
    "k", "L", "max_rows", "max_keys", "min_range", "strand_key",
    "pos_fl", "pos_depth"))
def pseudoalign_single_turbo_varlen(didx, p1, aux, lens, k: int, L: int,
                                    max_rows: int = 16, max_keys: int = 32768,
                                    min_range: int = 0,
                                    strand_key: bool = False,
                                    pos_fl: int = -1, pos_depth: int = 0):
    return single_turbo_core(didx, p1, aux, lens, k, L, max_rows, max_keys,
                             min_range, strand_key, 0, pos_fl, pos_depth)
