"""Device-side pseudoalignment: branchless, batched k-mer -> EC-row mapping.

This is the TPU replacement for the reference's per-read scalar pipeline
(KmerIndex::match jump/skip heuristics, src/KmerIndex.cpp:1698-1940, plus
MinCollector::intersectECs, src/MinCollector.cpp:425-496).  Instead of
jumping/skipping (a CPU latency optimization), every k-mer of every read is
evaluated in parallel ("--no-jump" semantics, which produce the same EC
intersection); the per-read result is reduced to the *set of distinct
non-empty EC rows* its k-mers touch.  Set intersection over the actual
transcript lists, EC deduplication and dynamic EC-id assignment happen once
per distinct row-set (see quant/ecmap.py), not once per read.

All integer work is int32/int64 elementwise + sorts + gathers: VPU/HBM bound,
no data-dependent shapes, fully jittable.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


INT32_MAX = np.int32(2**31 - 1)


class DeviceIndex(NamedTuple):
    """Index tables resident in HBM (int64 keys: 2k <= 62 bits).

    The k-mer length is deliberately NOT a field: NamedTuples are pytrees
    and k must stay a static (trace-time) constant; it is passed separately.
    """

    kmer_keys: jnp.ndarray  # [N] int64 sorted canonical k-mers
    kmer_uid: jnp.ndarray   # [N] int32
    kmer_pos: jnp.ndarray   # [N] int32
    kmer_fw: jnp.ndarray    # [N] bool
    kmer_block: jnp.ndarray  # [N] int32
    block_ec: jnp.ndarray   # [NB] int32 (-1 = empty/wildcard EC)


def device_index_from_host(index) -> DeviceIndex:
    return DeviceIndex(
        kmer_keys=jnp.asarray(index.kmer_keys.astype(np.int64)),
        kmer_uid=jnp.asarray(index.kmer_uid),
        kmer_pos=jnp.asarray(index.kmer_pos),
        kmer_fw=jnp.asarray(index.kmer_fw),
        kmer_block=jnp.asarray(index.kmer_block),
        block_ec=jnp.asarray(index.block_ec),
    )


def rolling_canonical_kmers(codes: jnp.ndarray, lens: jnp.ndarray, k: int):
    """[B, L] base codes -> canonical k-mers per window.

    Returns (canon [B, W] int64, is_fw [B, W] bool, valid [B, W] bool)
    with W = L - k + 1.  The k static shifts unroll into fused elementwise
    ops; XLA keeps everything in registers/VMEM.
    """
    B, L = codes.shape
    W = L - k + 1
    c = codes.astype(jnp.int64)
    f = jnp.zeros((B, W), jnp.int64)
    r = jnp.zeros((B, W), jnp.int64)
    for d in range(k):
        cd = jax.lax.dynamic_slice_in_dim(c, d, W, axis=1)
        f = (f << 2) | cd
        r = r | ((3 - cd) << (2 * d))
    bad = (codes >= 4).astype(jnp.int32)
    csum = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), jnp.cumsum(bad, axis=1)], axis=1)
    window_bad = csum[:, k:] - csum[:, :W]
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    valid = (window_bad == 0) & (pos + k <= lens[:, None])
    is_fw = f <= r
    canon = jnp.where(is_fw, f, r)
    return canon, is_fw, valid


class SideResult(NamedTuple):
    """Per-read pseudoalignment summary for one mate."""

    rows: jnp.ndarray        # [B, R] int32 sorted distinct non-empty EC rows,
    #                          INT32_MAX padded
    n_rows: jnp.ndarray      # [B] int32 number of distinct non-empty EC rows
    has_hits: jnp.ndarray    # [B] bool any k-mer matched the index
    overflow: jnp.ndarray    # [B] bool more distinct rows than R
    # first matched k-mer info (reference: findFirstMappingKmer,
    # ProcessReads.cpp:45; KmerIndex::mapPair, KmerIndex.cpp:1622)
    f_uid: jnp.ndarray       # [B] int32 unitig of first hit (-1 if none)
    f_block: jnp.ndarray     # [B] int32 mosaic block of first hit
    f_upos: jnp.ndarray      # [B] int32 unitig k-mer position of first hit
    f_rpos: jnp.ndarray      # [B] int32 read position of first hit
    f_strand: jnp.ndarray    # [B] bool read maps forward along unitig


@partial(jax.jit, static_argnames=("k", "max_rows"))
def pseudoalign_batch(
    didx: DeviceIndex,
    codes: jnp.ndarray,
    lens: jnp.ndarray,
    k: int,
    max_rows: int = 64,
) -> SideResult:
    canon, is_fw, valid = rolling_canonical_kmers(codes, lens, k)
    B, W = canon.shape
    R = min(max_rows, W)

    canon = jnp.where(valid, canon, 0)
    idx = jnp.searchsorted(didx.kmer_keys, canon)
    idx = jnp.minimum(idx, didx.kmer_keys.shape[0] - 1)
    hit = valid & (didx.kmer_keys[idx] == canon)

    block = jnp.where(hit, didx.kmer_block[idx], -1)
    ec_row = jnp.where(hit, didx.block_ec[jnp.maximum(block, 0)], -1)

    # distinct non-empty EC rows per read: sort, mask repeats, compact
    rows = jnp.where(hit & (ec_row >= 0), ec_row, INT32_MAX)
    rows = jnp.sort(rows, axis=1)
    isnew = jnp.concatenate(
        [jnp.ones((B, 1), bool), rows[:, 1:] != rows[:, :-1]], axis=1
    ) & (rows != INT32_MAX)
    uniq = jnp.where(isnew, rows, INT32_MAX)
    uniq = jnp.sort(uniq, axis=1)[:, :R]
    n_rows = jnp.sum(isnew, axis=1).astype(jnp.int32)

    has_hits = jnp.any(hit, axis=1)
    overflow = n_rows > R

    # first matched k-mer (leftmost read position)
    first = jnp.argmax(hit, axis=1)
    bidx = jnp.arange(B)
    kidx = idx[bidx, first]
    f_strand = is_fw[bidx, first] == didx.kmer_fw[kidx]
    f_uid = jnp.where(has_hits, didx.kmer_uid[kidx], -1)
    f_block = jnp.where(has_hits, block[bidx, first], -1)
    f_upos = jnp.where(has_hits, didx.kmer_pos[kidx], -1)
    f_rpos = jnp.where(has_hits, first.astype(jnp.int32), -1)

    return SideResult(
        rows=uniq,
        n_rows=n_rows,
        has_hits=has_hits,
        overflow=overflow,
        f_uid=f_uid,
        f_block=f_block,
        f_upos=f_upos,
        f_rpos=f_rpos,
        f_strand=f_strand,
    )


@partial(jax.jit, static_argnames=("k",))
def pair_fragment_lengths(s1: SideResult, s2: SideResult, k: int) -> jnp.ndarray:
    """Inferred fragment length per pair, -1 when not inferable.

    reference: KmerIndex::mapPair (src/KmerIndex.cpp:1622-1693): both mates'
    first matched k-mers must lie on the same unitig, in the same mosaic EC
    block, on opposite strands; the length is |p1 - p2| where p is the
    projected read start/end on the unitig.
    """
    p1 = jnp.where(s1.f_strand, s1.f_upos - s1.f_rpos, s1.f_upos + k + s1.f_rpos)
    p2 = jnp.where(s2.f_strand, s2.f_upos - s2.f_rpos, s2.f_upos + k + s2.f_rpos)
    ok = (
        s1.has_hits
        & s2.has_hits
        & (s1.f_uid == s2.f_uid)
        & (s1.f_block == s2.f_block)
        & (s1.f_strand != s2.f_strand)
    )
    return jnp.where(ok, jnp.abs(p1 - p2), -1).astype(jnp.int32)
