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
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


INT32_MAX = np.int32(2**31 - 1)


class DeviceIndex(NamedTuple):
    """Index tables resident in HBM, laid out for O(1)-ish k-mer lookup.

    k-mers are stored sorted by a bijective 64-bit mix of their canonical
    2-bit encoding; a direct-addressed bucket table over the top hash bits
    narrows each query to a tiny range that a fixed-depth (static, branch-
    less) binary search resolves.  This replaces the reference's
    minimizer->MPHF->unitig probe chain (src/KmerIndex.cpp:1698-1940,
    ext/bifrost/src/Search.tcc) with ~9 gather rounds per k-mer batch
    instead of log2(N)+3, independent of index size.

    The k-mer length is deliberately NOT a field: NamedTuples are pytrees
    and k must stay a static (trace-time) constant; it is passed separately.
    """

    kmer_hkeys: jnp.ndarray    # [N] uint64 mixed canonical k-mers, sorted
    bucket_start: jnp.ndarray  # [2^p + 1] int32 hash-bucket boundaries
    kmer_uid: jnp.ndarray      # [N] int32 (hash order)
    kmer_pos: jnp.ndarray      # [N] int32 (hash order)
    kmer_fw: jnp.ndarray       # [N] bool  (hash order)
    kmer_block: jnp.ndarray    # [N] int32 (hash order)
    kmer_ec: jnp.ndarray       # [N] int32 EC row, -1 = empty/wildcard
    # [ceil((NB+9)/8), 8] int32: block_ec padded to 8-wide rows (-1 pad);
    # the anchor kernel fetches a verified stretch's ECs as two rows
    block_ec8: jnp.ndarray
    # FLD position-filter threshold tables (None unless the run needs the
    # filter; see pos_filter_rank): per-block sorted fl-independent bases,
    # forward table then reverse table concatenated
    pf_ptr: Optional[jnp.ndarray] = None   # [NB+1] int32 block offsets
    pf_base: Optional[jnp.ndarray] = None  # [2*NP] int32


class PaddedDeviceIndex(NamedTuple):
    """Small/medium-index layout: fixed-width hash buckets.

    TPU gathers are *transaction*-bound (~12 ns/row on v5e regardless of
    row width up to 8x u64), so the whole bucket -- S keys and their S EC
    values -- is packed into ONE [2S]-wide u64 row and fetched with a
    single gather per query k-mer.  The gather runs inside a lax.map over
    fixed-size query chunks with the match/select reduction fused into the
    map body, so the lane-padded [chunk, 2S] gather scratch (the TPU tiler
    pads a minor dim of 2S up to 128) never exceeds ~100 MB regardless of
    batch size.  Memory is 2^p * 2S * 8 B; device_index_from_host falls
    back to the bucketed binary-search layout (DeviceIndex) when that
    exceeds its budget.
    """

    bucket_rows: jnp.ndarray  # [M, 2S] uint64: S mixed keys (_EMPTY_SLOT
    #                           pad) then S EC rows (as u64, 2^32-1 = empty)
    kmer_uid: jnp.ndarray     # [M*S] int32 (slot order)
    kmer_pos: jnp.ndarray     # [M*S] int32
    kmer_fw: jnp.ndarray      # [M*S] bool
    kmer_block: jnp.ndarray   # [M*S] int32
    block_ec8: jnp.ndarray    # [ceil((NB+9)/8), 8] int32 (see DeviceIndex)
    pf_ptr: Optional[jnp.ndarray] = None   # see DeviceIndex
    pf_base: Optional[jnp.ndarray] = None


_EMPTY_SLOT = np.uint64(0xFFFFFFFFFFFFFFFF)

# Fixed probe depth: buckets are sized (by raising p) to hold < 2^DEPTH
# entries, so the branchless lower_bound below always terminates exactly.
_BUCKET_SEARCH_DEPTH = 6

# Padded layout budget: bucket tables + slot payloads stay under this.
_PADDED_BYTES_BUDGET = 1 << 30


def _mix64_np(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (bijective) over uint64 -- uniformizes the
    biologically-skewed 2-bit k-mer bit patterns for direct addressing."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def _mix64_jnp(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint64)
    x = x ^ (x >> jnp.uint64(30))
    x = x * jnp.uint64(0xBF58476D1CE4E5B9)
    x = x ^ (x >> jnp.uint64(27))
    x = x * jnp.uint64(0x94D049BB133111EB)
    return x ^ (x >> jnp.uint64(31))


def pf_probe_depth(index) -> int:
    """Static binary-search depth for the FLD position-filter tables.

    Shared by pos_tables_from_host and the pipeline's kernel dispatch: the
    depth is part of the jit signature, and a second (diverging) formula
    would silently under-iterate the device search."""
    cards = np.diff(index.bp_ptr)
    maxc = int(cards.max()) if cards.shape[0] else 0
    return max(int(np.ceil(np.log2(maxc + 1))), 1) if maxc else 1


def pos_tables_from_host(index):
    """Per-block sorted FLD-position-filter base tables (+ probe depth).

    The filter's keep decision for transcript t via the first-hit k-mer in
    block b reduces to a threshold test on one per-read scalar
    (g- = upos - rpos for forward-mapping reads, g+ = upos + rpos for
    reverse), with thresholds of the form base(b,t) -/+ fl where base is
    fl-INDEPENDENT (see quant/filters.py FldPositionFilter, reference:
    ProcessReads.cpp:1094-1136 + KmerIndex::findPosition,
    src/KmerIndex.cpp:2174-2292).  Sorting each block's bases lets a
    fixed-depth device binary search compute the read's RANK among them;
    reads with equal (rows, block, strand, rank) provably share the
    filtered set, so the rank makes the filter key-compactable.

    Returns (pf_ptr [NB+1] int32, pf_base [2*NP] int32 fw||rv, depth).
    """
    NB = index.bp_ptr.shape[0] - 1
    raw = index.bp_pos.astype(np.int64)
    t0 = raw & 0x7FFFFFFF
    trsense = (raw >> 31) == 0
    lenT = index.target_lens[index.bp_tx].astype(np.int64)
    rstart = index.bp_rstart.astype(np.int64)
    rstop = index.bp_rstop.astype(np.int64)
    k = index.k
    # forward (csense=1): keep <=> g- <= base - fl
    base_fw = np.where(trsense, lenT - (t0 - rstart) - 1, t0 + rstop - 1 + k)
    # reverse (csense=0): keep <=> g+ >= base + fl
    base_rv = np.where(trsense, -(t0 - rstart) - k, t0 + rstop - lenT)
    blk = np.repeat(np.arange(NB, dtype=np.int64), np.diff(index.bp_ptr))
    lim = np.int64(2**31 - 1)
    fw = np.clip(base_fw, -lim, lim)[np.lexsort((base_fw, blk))]
    rv = np.clip(base_rv, -lim, lim)[np.lexsort((base_rv, blk))]
    return (
        index.bp_ptr.astype(np.int32),
        np.concatenate([fw, rv]).astype(np.int32),
        pf_probe_depth(index),
    )


def pos_filter_rank(didx, s, fl: int, depth: int) -> jnp.ndarray:
    """Device rank of a read's fragment coordinate among its first-hit
    block's position-filter thresholds (-1 for no-hit reads).

    Branchless fixed-depth binary search over the per-block sorted base
    list; upper/lower-bound semantics are unified by the integer identity
    #{x <= t} = #{x < t+1}."""
    NP = didx.pf_base.shape[0] // 2
    b = jnp.maximum(s.f_block, 0)
    lo0 = didx.pf_ptr[b].astype(jnp.int32)
    hi = didx.pf_ptr[b + 1].astype(jnp.int32)
    off = jnp.where(s.f_strand, 0, NP).astype(jnp.int32)
    target = jnp.where(
        s.f_strand,
        s.f_upos - s.f_rpos + fl,       # rank = #{base < g- + fl}
        s.f_upos + s.f_rpos - fl + 1,   # rank = #{base <= g+ - fl}
    )
    lo = lo0
    for _ in range(depth):
        cond = lo < hi
        mid = (lo + hi) >> 1
        v = didx.pf_base[jnp.minimum(mid + off, 2 * NP - 1)]
        right = cond & (v < target)
        lo = jnp.where(right, mid + 1, lo)
        hi = jnp.where(cond & ~right, mid, hi)
    return jnp.where(s.has_hits, lo - lo0, -1).astype(jnp.int32)


class ProbeLayout(NamedTuple):
    """Sorted-hash layout shared by the device index tables and the host
    wave-1 probe (native/ktio.cpp ktio_wave1): computing the argsort over
    ~1e8 mixed keys once instead of twice."""

    mk: np.ndarray            # [N] uint64 mixed canonical k-mers, sorted
    order: np.ndarray         # [N] permutation from index order
    p: int                    # bucket bits
    bucket_start: np.ndarray  # [2^p + 1] int64
    counts: np.ndarray        # [2^p] per-bucket sizes


def probe_layout(index) -> ProbeLayout:
    mk = _mix64_np(index.kmer_keys)
    assert not (mk == _EMPTY_SLOT).any(), "hash collided with empty sentinel"
    order = np.argsort(mk)
    mk = mk[order]
    N = mk.shape[0]
    # pick bucket bits p: avg load ~0.25, grow until max bucket fits DEPTH
    p = min(max(int(np.ceil(np.log2(max(N, 2)))) + 2, 4), 27)
    while True:
        bid = (mk >> np.uint64(64 - p)).astype(np.int64)
        counts = np.bincount(bid, minlength=1 << p)
        if counts.max() < (1 << _BUCKET_SEARCH_DEPTH) or p >= 27:
            break
        p += 1
    if counts.max() >= (1 << _BUCKET_SEARCH_DEPTH):
        raise ValueError("k-mer hash bucket overflow; index too large")
    bucket_start = np.zeros((1 << p) + 1, np.int64)
    np.cumsum(counts, out=bucket_start[1:])
    return ProbeLayout(mk, order, p, bucket_start, counts)


def cached_probe_layout(index) -> ProbeLayout:
    """Memoized probe_layout: the argsort over ~1e8 mixed keys costs
    ~15 s at human scale and every quant/bus invocation on the same
    loaded index can share it."""
    lay = getattr(index, "_probe_layout_cache", None)
    if lay is None:
        lay = probe_layout(index)
        try:
            index._probe_layout_cache = lay
        except Exception:
            pass
    return lay


def device_index_from_host(index, with_pos_tables: bool = False,
                           layout: Optional[ProbeLayout] = None):
    if layout is None:
        layout = cached_probe_layout(index)
    mk, order, p, counts = layout.mk, layout.order, layout.p, layout.counts
    bucket_start = layout.bucket_start.astype(np.int32)
    # anchor-kernel invariant: block ids are unitig-major and consecutive
    # ascending with position, so a verified unitig stretch maps to the
    # contiguous block-id range [block(p_lo), block(p_hi)]
    bu = index.block_uid
    if bu.shape[0] > 1:
        assert ((np.diff(bu.astype(np.int64)) > 0)
                | (np.diff(index.block_start.astype(np.int64)) > 0)).all(), \
            "mosaic blocks must be unitig-major, position-ascending"
    NB = index.block_ec.shape[0]
    nb8 = ((NB + 9) + 7) // 8
    be8 = np.full(nb8 * 8, -1, np.int32)
    be8[:NB] = index.block_ec
    block_ec8 = jnp.asarray(be8.reshape(nb8, 8))
    N = mk.shape[0]
    bid = (mk >> np.uint64(64 - p)).astype(np.int64)
    kmer_block = index.kmer_block[order]
    kmer_ec = np.where(
        kmer_block >= 0, index.block_ec[np.maximum(kmer_block, 0)], -1
    ).astype(np.int32)

    pf_ptr = pf_base = None
    if with_pos_tables:
        pf_ptr_np, pf_base_np, _ = pos_tables_from_host(index)
        pf_ptr = jnp.asarray(pf_ptr_np)
        pf_base = jnp.asarray(pf_base_np)

    S = 1 << max(int(np.ceil(np.log2(max(int(counts.max()), 1)))), 0)
    M = 1 << p
    if M * S * 16 <= _PADDED_BYTES_BUDGET:
        slot = np.arange(N, dtype=np.int64) - bucket_start[bid].astype(np.int64)
        flat = bid * S + slot
        rows = np.full((M, 2 * S), _EMPTY_SLOT, np.uint64)
        rows.reshape(-1)[flat // S * (2 * S) + flat % S] = mk
        rows.reshape(-1)[flat // S * (2 * S) + S + flat % S] = (
            kmer_ec.astype(np.int64).view(np.uint64) & np.uint64(0xFFFFFFFF)
        )

        def scatter(a, fill):
            out = np.full(M * S, fill, a.dtype)
            out[flat] = a
            return out

        return PaddedDeviceIndex(
            bucket_rows=jnp.asarray(rows),
            kmer_uid=jnp.asarray(scatter(index.kmer_uid[order], -1)),
            kmer_pos=jnp.asarray(scatter(index.kmer_pos[order], -1)),
            kmer_fw=jnp.asarray(scatter(index.kmer_fw[order], False)),
            kmer_block=jnp.asarray(scatter(kmer_block, -1)),
            block_ec8=block_ec8,
            pf_ptr=pf_ptr,
            pf_base=pf_base,
        )

    return DeviceIndex(
        kmer_hkeys=jnp.asarray(mk),
        bucket_start=jnp.asarray(bucket_start),
        kmer_uid=jnp.asarray(index.kmer_uid[order]),
        kmer_pos=jnp.asarray(index.kmer_pos[order]),
        kmer_fw=jnp.asarray(index.kmer_fw[order]),
        kmer_block=jnp.asarray(kmer_block),
        kmer_ec=jnp.asarray(kmer_ec),
        block_ec8=block_ec8,
        pf_ptr=pf_ptr,
        pf_base=pf_base,
    )


def lookup_kmers(didx, canon: jnp.ndarray, valid: jnp.ndarray):
    """Batched k-mer -> index-slot lookup.

    canon: int64 canonical k-mers (any shape); valid: same-shape bool.
    Returns (idx, hit, ec): slot into the slot-ordered kmer_* payload
    arrays, a hit mask, and the EC row (-1 when miss or wildcard).
    Branchless on both layouts; the layout is a trace-time constant.
    """
    q = _mix64_jnp(jnp.where(valid, canon, 0))
    if isinstance(didx, PaddedDeviceIndex):
        M, S2 = didx.bucket_rows.shape
        S = S2 // 2
        p = int(np.log2(M) + 0.5)

        def probe(qc):
            # ONE row gather fetches the whole bucket (keys + ECs); the
            # compare/select reduction fuses into the gather's consumer so
            # the lane-padded [chunk, 2S] scratch stays chunk-sized
            b = (qc >> jnp.uint64(64 - p)).astype(jnp.int32)
            rows = didx.bucket_rows[b]               # [chunk, 2S]
            match = rows[:, :S] == qc[:, None]
            hitc = jnp.any(match, axis=-1)
            meta = jnp.sum(
                jnp.where(match, rows[:, S:], jnp.uint64(0)), axis=-1
            )
            ecc = jax.lax.bitcast_convert_type(
                meta.astype(jnp.uint32), jnp.int32
            )
            j = jnp.argmax(match, axis=-1)
            idxc = b.astype(jnp.int64) * S + j.astype(jnp.int64)
            return idxc, hitc, ecc

        shape = q.shape
        qf = q.reshape(-1)
        n = qf.shape[0]
        C = 1 << 17
        if n <= C:
            idx, hit, ec = probe(qf)
        else:
            nc = -(-n // C)
            qp = jnp.concatenate(
                [qf, jnp.zeros(nc * C - n, qf.dtype)]
            ).reshape(nc, C)
            idx, hit, ec = jax.lax.map(probe, qp)
            idx = idx.reshape(-1)[:n]
            hit = hit.reshape(-1)[:n]
            ec = ec.reshape(-1)[:n]
        idx = idx.reshape(shape)
        hit = valid & hit.reshape(shape)
        ec = jnp.where(hit, ec.reshape(shape), -1)
        return idx, hit, ec
    p = int(np.log2(didx.bucket_start.shape[0] - 1) + 0.5)
    b = (q >> jnp.uint64(64 - p)).astype(jnp.int32)
    lo = didx.bucket_start[b].astype(jnp.int32)
    n = didx.bucket_start[b + 1].astype(jnp.int32) - lo
    N = didx.kmer_hkeys.shape[0]
    for _ in range(_BUCKET_SEARCH_DEPTH):
        nz = n > 0
        half = n >> 1
        m = jnp.minimum(lo + half, N - 1)
        go = (didx.kmer_hkeys[m] < q) & nz
        lo = jnp.where(go, m + 1, lo)
        n = jnp.where(go, n - half - 1, jnp.where(nz, half, 0))
    idx = jnp.minimum(lo, N - 1)
    hit = valid & (didx.kmer_hkeys[idx] == q)
    ec = jnp.where(hit, didx.kmer_ec[idx], -1)
    return idx, hit, ec


def rolling_canonical_kmers(codes: jnp.ndarray, lens: jnp.ndarray, k: int):
    """[B, L] base codes -> canonical k-mers per window.

    Returns (canon [B, W] int64, is_fw [B, W] bool, valid [B, W] bool)
    with W = L - k + 1.  A true ROLLING build: window 0 is constructed
    with k shifts on [B]-wide vectors, then each subsequent window pushes
    one base (f: shift-in at the low end; r: shift-down with the
    complement injected at the top) -- O(k + W) column ops instead of the
    O(k * W) unrolled build (the same recurrence kseq-era scanners use,
    data-parallel over the batch)."""
    B, L = codes.shape
    W = L - k + 1
    c = (codes & 3).astype(jnp.int64)
    mask = (jnp.int64(1) << (2 * k)) - 1 if 2 * k < 64 else jnp.int64(-1)
    top = 2 * (k - 1)
    f0 = jnp.zeros((B,), jnp.int64)
    r0 = jnp.zeros((B,), jnp.int64)
    for d in range(k):
        f0 = (f0 << 2) | c[:, d]
        r0 = r0 | ((3 - c[:, d]) << (2 * d))

    if W > 1:
        xs = c[:, k:L].T  # [W-1, B] incoming base per roll step

        def step(carry, cd):
            f, r = carry
            f = ((f << 2) | cd) & mask
            r = (r >> 2) | ((3 - cd) << top)
            return (f, r), (f, r)

        (_, _), (fs, rs) = jax.lax.scan(step, (f0, r0), xs)
        f = jnp.concatenate([f0[None, :], fs], axis=0).T  # [B, W]
        r = jnp.concatenate([r0[None, :], rs], axis=0).T
    else:
        f = f0[:, None]
        r = r0[:, None]

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
    rng: jnp.ndarray         # [B] int32 last-hit pos - first-hit pos (the
    #                          min_range support span minus k;
    #                          reference: MinCollector.cpp:497-507)


def pack_codes_host(codes: np.ndarray):
    """Host-side 2-bit packing + N bitmask (cuts host->device bytes ~2.5x;
    the device link is the end-to-end bottleneck on tunneled TPUs).

    Returns (packed [B, ceil(L/4)] uint8, nmask [B, ceil(L/8)] uint8, L).
    """
    B, L = codes.shape
    L4 = (L + 3) // 4
    c = np.where(codes >= 4, 0, codes).astype(np.uint8)
    if L4 * 4 != L:
        c = np.concatenate([c, np.zeros((B, L4 * 4 - L), np.uint8)], axis=1)
    c = c.reshape(B, L4, 4)
    packed = c[:, :, 0] | (c[:, :, 1] << 2) | (c[:, :, 2] << 4) | (c[:, :, 3] << 6)
    nmask = np.packbits(codes >= 4, axis=1, bitorder="little")
    return packed, nmask, L


def unpack_codes_device(packed: jnp.ndarray, nmask: jnp.ndarray, L: int) -> jnp.ndarray:
    B = packed.shape[0]
    shifts = jnp.arange(4, dtype=jnp.uint8) * 2
    c = (packed[:, :, None] >> shifts[None, None, :]) & 3
    c = c.reshape(B, -1)[:, :L]
    bits = (nmask[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)[None, None, :]) & 1
    nbit = bits.reshape(B, -1)[:, :L]
    return jnp.where(nbit == 1, jnp.uint8(4), c.astype(jnp.uint8))


@partial(jax.jit, static_argnames=("k", "L", "max_rows"))
def pseudoalign_batch_packed(
    didx: DeviceIndex,
    packed: jnp.ndarray,
    nmask: jnp.ndarray,
    lens: jnp.ndarray,
    k: int,
    L: int,
    max_rows: int = 16,
) -> SideResult:
    codes = unpack_codes_device(packed, nmask, L)
    return _pseudoalign_core(didx, codes, lens, k, max_rows)


@partial(jax.jit, static_argnames=("k", "max_rows"))
def pseudoalign_batch(
    didx: DeviceIndex,
    codes: jnp.ndarray,
    lens: jnp.ndarray,
    k: int,
    max_rows: int = 16,
) -> SideResult:
    return _pseudoalign_core(didx, codes, lens, k, max_rows)


def _pseudoalign_core(
    didx: DeviceIndex,
    codes: jnp.ndarray,
    lens: jnp.ndarray,
    k: int,
    max_rows: int,
) -> SideResult:
    canon, is_fw, valid = rolling_canonical_kmers(codes, lens, k)
    B, W = canon.shape
    R = min(max_rows, W)

    idx, hit, ec_row = lookup_kmers(didx, canon, valid)

    # distinct non-empty EC rows per read, sorted ascending: R rounds of
    # masked min-reduction along the window axis.  Replaces two [B, W]
    # axis-1 sorts, whose TPU lowering allocates lane-padded scratch ~5x
    # the data and caps the batch size.
    rows = jnp.where(hit & (ec_row >= 0), ec_row, INT32_MAX)
    slots = []
    prev = jnp.full((B,), -1, jnp.int32)
    for _ in range(R):
        cur = jnp.min(
            jnp.where(rows > prev[:, None], rows, INT32_MAX), axis=1
        )
        slots.append(cur)
        prev = jnp.where(cur != INT32_MAX, cur, prev)
    uniq = jnp.stack(slots, axis=1)
    n_rows = jnp.sum(uniq != INT32_MAX, axis=1).astype(jnp.int32)

    has_hits = jnp.any(hit, axis=1)
    overflow = jnp.any(
        (rows > prev[:, None]) & (rows != INT32_MAX), axis=1
    )

    # first matched k-mer (leftmost read position)
    first = jnp.argmax(hit, axis=1)
    bidx = jnp.arange(B)
    kidx = idx[bidx, first]
    f_strand = is_fw[bidx, first] == didx.kmer_fw[kidx]
    f_uid = jnp.where(has_hits, didx.kmer_uid[kidx], -1)
    f_block = jnp.where(has_hits, didx.kmer_block[kidx], -1)
    f_upos = jnp.where(has_hits, didx.kmer_pos[kidx], -1)
    f_rpos = jnp.where(has_hits, first.astype(jnp.int32), -1)

    pos = jax.lax.broadcasted_iota(jnp.int32, hit.shape, 1)
    maxpos = jnp.max(jnp.where(hit, pos, -1), axis=1)
    minpos = jnp.min(jnp.where(hit, pos, jnp.int32(2**30)), axis=1)
    rng = jnp.where(has_hits, maxpos - minpos, -1).astype(jnp.int32)

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
        rng=rng,
    )


def _hash_columns_128(cols) -> jnp.ndarray:
    """Two independent 64-bit FNV/splitmix column hashes -> [B, 2] int64.

    Device-side key hashing keeps device->host traffic at 16 bytes/read
    (the tunnel/PCIe link is the end-to-end bottleneck, not compute); full
    row lists are fetched only for first-seen keys.  128 bits makes
    collisions over a full run (~1e6 distinct keys) ~1e-20.
    """
    B = cols[0].shape[0]
    h1 = jnp.full(B, 0xCBF29CE484222325, jnp.uint64)
    h2 = jnp.full(B, 0x9E3779B97F4A7C15, jnp.uint64)
    m1 = jnp.uint64(0x100000001B3)
    m2 = jnp.uint64(0xC2B2AE3D27D4EB4F)
    for c in cols:
        cu = c.astype(jnp.uint64)
        h1 = (h1 ^ cu) * m1
        h2 = (h2 + cu) * m2
        h2 = h2 ^ (h2 >> jnp.uint64(29))
    h1 = h1 ^ (h1 >> jnp.uint64(33))
    h2 = h2 * m1
    return jnp.stack(
        [h1.astype(jnp.int64), h2.astype(jnp.int64)], axis=1
    )


def _side_flag_cols(s: SideResult):
    return [
        s.has_hits.astype(jnp.int32) + 4 * s.overflow.astype(jnp.int32),
    ]


def _pair_flags(s1, s2, k: int, min_range: int):
    """Base hit/overflow flags, plus per-mate min_range veto bits (16/32)
    when a min_range filter is active (the veto is part of the read's key:
    identical row sets with different support spans must not share a key).
    reference: MinCollector::intersectECs range check, MinCollector.cpp:497."""
    fl = (
        s1.has_hits.astype(jnp.int32)
        + 2 * s2.has_hits.astype(jnp.int32)
        + 4 * s1.overflow.astype(jnp.int32)
        + 8 * s2.overflow.astype(jnp.int32)
    )
    if min_range > 1:
        v1 = s1.has_hits & (s1.rng + k < min_range)
        v2 = s2.has_hits & (s2.rng + k < min_range)
        fl = fl + 16 * v1.astype(jnp.int32) + 32 * v2.astype(jnp.int32)
    return fl


def _single_flags(s1, k: int, min_range: int):
    fl = s1.has_hits.astype(jnp.int32) + 4 * s1.overflow.astype(jnp.int32)
    if min_range > 1:
        v1 = s1.has_hits & (s1.rng + k < min_range)
        fl = fl + 16 * v1.astype(jnp.int32)
    return fl


def _strand_cols_pair(s1, s2):
    """First-hit (block, strand) per mate: the inputs of the strand
    filter, folded into the key so filtering is a per-KEY operation."""
    return [
        s1.f_block, s1.f_strand.astype(jnp.int32),
        s2.f_block, s2.f_strand.astype(jnp.int32),
    ]


def _strand_cols_single(s1):
    return [s1.f_block, s1.f_strand.astype(jnp.int32)]


@jax.jit
def pair_key_hash(s1: SideResult, s2: SideResult) -> jnp.ndarray:
    """128-bit key of (rows1, rows2, hit/overflow flags) per pair."""
    cols = (
        [s1.rows[:, i] for i in range(s1.rows.shape[1])]
        + [s2.rows[:, i] for i in range(s2.rows.shape[1])]
        + [_pair_flags(s1, s2, 0, 0)]
    )
    return _hash_columns_128(cols)


@jax.jit
def single_key_hash(s1: SideResult) -> jnp.ndarray:
    cols = [s1.rows[:, i] for i in range(s1.rows.shape[1])] + _side_flag_cols(s1)
    return _hash_columns_128(cols)


@partial(jax.jit, static_argnames=())
def gather_rows(rows: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Fetch exemplar row lists for first-seen keys (device-side gather)."""
    return rows[idx]


class CompactKeys(NamedTuple):
    """Per-batch key histogram computed ON DEVICE.

    Downloading per-read hashes costs 16 bytes/read; a batch only has a few
    thousand distinct keys, so the device sorts the 128-bit hashes, segments
    them, and returns fixed-width per-key tables instead (~100x smaller).
    n_uniq > K means the table overflowed: caller falls back to per-read
    hashes for that batch.
    """

    uniq_h: jnp.ndarray      # [K, 2] int64 unique key hashes (valid: first n_uniq)
    occ: jnp.ndarray         # [K] int32 multiplicity
    first_idx: jnp.ndarray   # [K] int32 first-occurrence read index (for
    #                          first-seen EC ordering + exemplar fetch)
    flags: jnp.ndarray       # [K] int32 hit/overflow flags of the exemplar
    n_uniq: jnp.ndarray      # [] int32


def pos_col_pair(didx, s1: SideResult, s2: SideResult, fl: int, depth: int):
    """Pair key column for the FLD position filter: the filter applies
    only when exactly one mate mapped (reference: ProcessReads.cpp:1094,
    `!paired || v1.empty() || v2.empty()`); other reads get -1 so their
    keys stay unsplit."""
    applies = s1.has_hits ^ s2.has_hits
    r1 = pos_filter_rank(didx, s1, fl, depth)
    r2 = pos_filter_rank(didx, s2, fl, depth)
    return jnp.where(applies, jnp.where(s1.has_hits, r1, r2), -1)


@partial(jax.jit, static_argnames=(
    "max_keys", "k", "min_range", "strand_key", "with_slots"))
def compact_pair_keys(
    s1: SideResult, s2: SideResult, max_keys: int = 16384,
    k: int = 0, min_range: int = 0, strand_key: bool = False,
    pos_col=None, with_slots: bool = False,
):
    """Per-batch key histogram.  With min_range/strand_key/pos_col the key
    is extended by the filter inputs (veto bits; first-hit block+strand;
    position-filter rank), so per-read filters become per-key operations
    on the compact path.  with_slots additionally returns each read's key
    slot (pseudobam fast path)."""
    cols = (
        [s1.rows[:, i] for i in range(s1.rows.shape[1])]
        + [s2.rows[:, i] for i in range(s2.rows.shape[1])]
        + [_pair_flags(s1, s2, k, min_range)]
        + (_strand_cols_pair(s1, s2)
           if strand_key or pos_col is not None else [])
        + ([pos_col] if pos_col is not None else [])
    )
    h = _hash_columns_128(cols)
    ck = _compact_keys(h, cols[2 * s1.rows.shape[1]], max_keys)
    if with_slots:
        return ck, _compact_read_slots(h, max_keys)
    return ck


@partial(jax.jit, static_argnames=("max_keys", "k", "min_range", "strand_key"))
def compact_single_keys(
    s1: SideResult, max_keys: int = 16384,
    k: int = 0, min_range: int = 0, strand_key: bool = False,
    pos_col=None,
) -> CompactKeys:
    cols = (
        [s1.rows[:, i] for i in range(s1.rows.shape[1])]
        + [_single_flags(s1, k, min_range)]
        + (_strand_cols_single(s1)
           if strand_key or pos_col is not None else [])
        + ([pos_col] if pos_col is not None else [])
    )
    h = _hash_columns_128(cols)
    return _compact_keys(h, cols[s1.rows.shape[1]], max_keys)


def _compact_keys(h: jnp.ndarray, flags: jnp.ndarray, K: int) -> CompactKeys:
    """Dedup B read keys on device.

    Sorts ONE 64-bit key (h[:,0] is already a full hash of every key
    column) with a single packed (read idx, flags) payload -- a 2-array
    sort moves 2.5x fewer bytes through the TPU sort network than the
    previous 4-array 128-bit sort.  Within a segment all reads share the
    exact key, hence identical flags, so min(idx*128+flags) recovers the
    first occurrence and its flags (flag bits are 1..32 = max 63; the
    *128 packing leaves one spare bit of headroom so a future flag bit
    does not silently corrupt first_idx).  The 128-bit hash pair is
    recovered exactly by gathering h at the exemplar index; dedup itself
    rides on 64 bits (within-batch distinct-key collision ~B^2/2^65:
    ~3e-8 for the production B=2^20 batches, ~1e-5 over a multi-thousand-
    batch run, and harmless anyway -- a collision merges two reads' keys
    within one batch, the host-side EC cache still keys on the full 128
    bits)."""
    B = h.shape[0]
    idx = jnp.arange(B, dtype=jnp.int32)
    pay = idx.astype(jnp.int64) * 128 + flags.astype(jnp.int64)
    h0, pays = jax.lax.sort((h[:, 0], pay), num_keys=1)
    isnew = jnp.concatenate([jnp.ones(1, bool), h0[1:] != h0[:-1]])
    seg = jnp.cumsum(isnew.astype(jnp.int32)) - 1
    n_uniq = seg[-1] + 1
    segc = jnp.minimum(seg, K - 1)
    occ = jax.ops.segment_sum(jnp.ones(B, jnp.int32), segc, num_segments=K)
    firstpay = jax.ops.segment_min(pays, segc, num_segments=K)
    first_idx = jnp.where(
        occ > 0, (firstpay >> 7).astype(jnp.int32), jnp.int32(0)
    )
    fl = jnp.where(occ > 0, (firstpay & 127).astype(jnp.int32), jnp.int32(0))
    uh = h[jnp.minimum(first_idx, B - 1)]
    return CompactKeys(
        uniq_h=uh,
        occ=occ,
        first_idx=first_idx,
        flags=fl,
        n_uniq=n_uniq,
    )


def _compact_read_slots(h: jnp.ndarray, K: int) -> jnp.ndarray:
    """Per-read key slot (the segment id _compact_keys assigns), so the
    host can map each read to its key's resolved EC at 4 bytes/read d2h
    (the pseudobam fast path needs per-READ ECs, not just the histogram).
    """
    B = h.shape[0]
    idx = jnp.arange(B, dtype=jnp.int32)
    h0, order = jax.lax.sort((h[:, 0], idx), num_keys=1)
    isnew = jnp.concatenate([jnp.ones(1, bool), h0[1:] != h0[:-1]])
    segc = jnp.minimum(jnp.cumsum(isnew.astype(jnp.int32)) - 1, K - 1)
    return (
        jnp.zeros(B, jnp.int32).at[order].set(segc)
    )


def _ck_flat(ck: CompactKeys, n_fail=None) -> jnp.ndarray:
    """Flatten CompactKeys into one [K+1, 5] int64 array so a single
    device->host transfer fetches the whole per-batch histogram (each
    transfer pays full link latency under tunneled TPUs).

    Row 0 is the meta row [n_uniq, n_fail, 0, 0, 0]; key rows follow.
    Meta-first lets the host fetch a small PREFIX (meta + the occupied
    slots, which are always the leading ones) and skip the rest of the
    1.3 MB table when n_uniq is small -- the common case."""
    rows = jnp.stack(
        [
            ck.uniq_h[:, 0],
            ck.uniq_h[:, 1],
            ck.occ.astype(jnp.int64),
            ck.first_idx.astype(jnp.int64),
            ck.flags.astype(jnp.int64),
        ],
        axis=1,
    )
    meta = jnp.zeros((1, 5), jnp.int64).at[0, 0].set(ck.n_uniq.astype(jnp.int64))
    if n_fail is not None:
        meta = meta.at[0, 1].set(n_fail.astype(jnp.int64))
    return jnp.concatenate([meta, rows], axis=0)


def unflatten_ck_host(arr: np.ndarray):
    """Host-side inverse of _ck_flat.

    Returns (uniq_h [K,2] int64, occ int32, first_idx int32, flags int32,
    n_uniq int)."""
    meta, rows = arr[0], arr[1:]
    uniq_h = np.ascontiguousarray(rows[:, :2])
    return (
        uniq_h,
        rows[:, 2].astype(np.int32),
        rows[:, 3].astype(np.int32),
        rows[:, 4].astype(np.int32),
        int(meta[0]),
    )


def ck_n_fail(arr: np.ndarray) -> int:
    """Anchor wave-2 failure count from the ck meta row (0 elsewhere);
    feeds the host's adaptive wave-2 capacity choice."""
    return int(arr[0, 1])


def pair_compact_core(
    didx: DeviceIndex,
    p1: jnp.ndarray,
    n1: jnp.ndarray,
    l1: jnp.ndarray,
    p2: jnp.ndarray,
    n2: jnp.ndarray,
    l2: jnp.ndarray,
    k: int,
    L: int,
    max_rows: int = 16,
    max_keys: int = 16384,
    min_range: int = 0,
    strand_key: bool = False,
    pos_fl: int = -1,
    pos_depth: int = 0,
):
    """Fused steady-state pair step (traceable, not jitted): both mates
    pseudoaligned in one [2B] batch, reduced to a per-key histogram.
    Shared by the single-device jit wrapper below and the per-shard body
    of the multi-chip `shard_map` path (parallel/mesh.py)."""
    B = p1.shape[0]
    codes = jnp.concatenate(
        [unpack_codes_device(p1, n1, L), unpack_codes_device(p2, n2, L)]
    )
    lens = jnp.concatenate([l1, l2])
    r = _pseudoalign_core(didx, codes, lens, k, max_rows)
    r1 = SideResult(*(a[:B] for a in r))
    r2 = SideResult(*(a[B:] for a in r))
    pc = (
        pos_col_pair(didx, r1, r2, pos_fl, pos_depth) if pos_fl >= 0 else None
    )
    ck = compact_pair_keys(
        r1, r2, max_keys, k=k, min_range=min_range, strand_key=strand_key,
        pos_col=pc,
    )
    return r1, r2, _ck_flat(ck)


def single_compact_core(
    didx: DeviceIndex,
    p1: jnp.ndarray,
    n1: jnp.ndarray,
    l1: jnp.ndarray,
    k: int,
    L: int,
    max_rows: int = 16,
    max_keys: int = 16384,
    min_range: int = 0,
    strand_key: bool = False,
    pos_fl: int = -1,
    pos_depth: int = 0,
):
    r1 = _pseudoalign_core(didx, unpack_codes_device(p1, n1, L), l1, k, max_rows)
    pc = pos_filter_rank(didx, r1, pos_fl, pos_depth) if pos_fl >= 0 else None
    ck = compact_single_keys(
        r1, max_keys, k=k, min_range=min_range, strand_key=strand_key,
        pos_col=pc,
    )
    return r1, _ck_flat(ck)


@partial(jax.jit, static_argnames=(
    "k", "L", "max_rows", "max_keys", "min_range", "strand_key",
    "pos_fl", "pos_depth"))
def pseudoalign_pair_compact_packed(
    didx: DeviceIndex,
    p1: jnp.ndarray,
    n1: jnp.ndarray,
    l1: jnp.ndarray,
    p2: jnp.ndarray,
    n2: jnp.ndarray,
    l2: jnp.ndarray,
    k: int,
    L: int,
    max_rows: int = 16,
    max_keys: int = 16384,
    min_range: int = 0,
    strand_key: bool = False,
    pos_fl: int = -1,
    pos_depth: int = 0,
):
    return pair_compact_core(
        didx, p1, n1, l1, p2, n2, l2, k, L, max_rows, max_keys,
        min_range, strand_key, pos_fl, pos_depth
    )


def _codes_from_packed(packed: jnp.ndarray, L: int) -> jnp.ndarray:
    """2-bit unpack without an N bitmask (slim upload path)."""
    B = packed.shape[0]
    shifts = jnp.arange(4, dtype=jnp.uint8) * 2
    c = (packed[:, :, None] >> shifts[None, None, :]) & 3
    return c.reshape(B, -1)[:, :L]


def _apply_n_exceptions(codes: jnp.ndarray, nexc: jnp.ndarray) -> jnp.ndarray:
    """Scatter N markers (code 4) at sparse flattened positions.

    nexc is a fixed-width int32 vector of flattened indices into codes,
    padded with an out-of-bounds sentinel (dropped by the scatter).
    """
    B, L = codes.shape
    return codes.reshape(-1).at[nexc].set(jnp.uint8(4), mode="drop").reshape(B, L)


@partial(jax.jit, static_argnames=("k", "L", "max_rows", "max_keys"))
def pseudoalign_pair_compact_slim(
    didx: DeviceIndex,
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    nexc: jnp.ndarray,
    rlen: jnp.ndarray,
    k: int,
    L: int,
    max_rows: int = 16,
    max_keys: int = 16384,
):
    """Steady-state pair step with the minimal upload: 2-bit packed codes
    only.  A uniform read length travels as one scalar (a dynamic arg, NOT
    a compiled-in constant: XLA would constant-fold the [B, W] validity
    mask through the whole kernel, exploding compile time) and N
    positions arrive as a sparse exception list instead of a per-read
    bitmask -- the host->device link is the end-to-end bottleneck, and this
    cuts upload traffic from ~50 to ~28 bytes/pair.  Semantics match
    pseudoalign_pair_compact_packed exactly (window validity is decided by
    rlen + in-read N codes, identical to the bitmask path)."""
    B = p1.shape[0]
    codes = jnp.concatenate(
        [_codes_from_packed(p1, L), _codes_from_packed(p2, L)]
    )
    codes = _apply_n_exceptions(codes, nexc)
    lens = jnp.full(2 * B, 0, jnp.int32) + rlen.astype(jnp.int32)
    r = _pseudoalign_core(didx, codes, lens, k, max_rows)
    r1 = SideResult(*(a[:B] for a in r))
    r2 = SideResult(*(a[B:] for a in r))
    ck = compact_pair_keys(r1, r2, max_keys)
    return r1, r2, _ck_flat(ck)


@partial(jax.jit, static_argnames=("k", "L", "max_rows", "max_keys"))
def pseudoalign_pair_compact_slim_varlen(
    didx: DeviceIndex,
    p1: jnp.ndarray,
    l1: jnp.ndarray,
    p2: jnp.ndarray,
    l2: jnp.ndarray,
    nexc: jnp.ndarray,
    k: int,
    L: int,
    max_rows: int = 16,
    max_keys: int = 16384,
):
    """Slim pair step for mixed-length batches: lens travel as uint16."""
    B = p1.shape[0]
    codes = jnp.concatenate(
        [_codes_from_packed(p1, L), _codes_from_packed(p2, L)]
    )
    codes = _apply_n_exceptions(codes, nexc)
    lens = jnp.concatenate([l1, l2]).astype(jnp.int32)
    r = _pseudoalign_core(didx, codes, lens, k, max_rows)
    r1 = SideResult(*(a[:B] for a in r))
    r2 = SideResult(*(a[B:] for a in r))
    ck = compact_pair_keys(r1, r2, max_keys)
    return r1, r2, _ck_flat(ck)


@partial(jax.jit, static_argnames=("k", "L", "max_rows", "max_keys"))
def pseudoalign_single_compact_slim(
    didx: DeviceIndex,
    p1: jnp.ndarray,
    nexc: jnp.ndarray,
    rlen: jnp.ndarray,
    k: int,
    L: int,
    max_rows: int = 16,
    max_keys: int = 16384,
):
    B = p1.shape[0]
    codes = _apply_n_exceptions(_codes_from_packed(p1, L), nexc)
    lens = jnp.full(B, 0, jnp.int32) + rlen.astype(jnp.int32)
    r1 = _pseudoalign_core(didx, codes, lens, k, max_rows)
    ck = compact_single_keys(r1, max_keys)
    return r1, _ck_flat(ck)


@partial(jax.jit, static_argnames=("k", "L", "max_rows", "max_keys"))
def pseudoalign_single_compact_slim_varlen(
    didx: DeviceIndex,
    p1: jnp.ndarray,
    l1: jnp.ndarray,
    nexc: jnp.ndarray,
    k: int,
    L: int,
    max_rows: int = 16,
    max_keys: int = 16384,
):
    B = p1.shape[0]
    codes = _apply_n_exceptions(_codes_from_packed(p1, L), nexc)
    r1 = _pseudoalign_core(didx, codes, l1.astype(jnp.int32), k, max_rows)
    ck = compact_single_keys(r1, max_keys)
    return r1, _ck_flat(ck)


@partial(jax.jit, static_argnames=(
    "k", "L", "max_rows", "max_keys", "min_range", "strand_key",
    "pos_fl", "pos_depth"))
def pseudoalign_single_compact_packed(
    didx: DeviceIndex,
    p1: jnp.ndarray,
    n1: jnp.ndarray,
    l1: jnp.ndarray,
    k: int,
    L: int,
    max_rows: int = 16,
    max_keys: int = 16384,
    min_range: int = 0,
    strand_key: bool = False,
    pos_fl: int = -1,
    pos_depth: int = 0,
):
    return single_compact_core(didx, p1, n1, l1, k, L, max_rows, max_keys,
                               min_range, strand_key, pos_fl, pos_depth)


class LongResult(NamedTuple):
    """Per-read long-read pseudoalignment summary.

    rows/n_rows/has_hits/overflow as SideResult (wider row budget);
    unmapped = #valid k-mers with no index hit (the reference's
    match_long empty_count, evaluated exhaustively -- --no-jump
    semantics, src/KmerIndex.cpp:1945-2172); groups = the ordered
    sequence of (unitig, EC-block-content) group EC rows the read's hits
    traverse (what MinCollector::modeECs scans), -2 padded.
    """

    rows: jnp.ndarray       # [B, R] int32 sorted distinct non-empty EC rows
    n_rows: jnp.ndarray     # [B]
    has_hits: jnp.ndarray   # [B]
    overflow: jnp.ndarray   # [B] row-list overflow
    unmapped: jnp.ndarray   # [B] int32
    groups: jnp.ndarray     # [B, G] int32 EC row per group (-1 = empty EC)
    n_groups: jnp.ndarray   # [B] int32
    g_overflow: jnp.ndarray  # [B] bool group-list overflow


@partial(jax.jit, static_argnames=("k", "L", "max_rows", "max_groups"))
def pseudoalign_long_packed(
    didx,
    packed: jnp.ndarray,
    nmask: jnp.ndarray,
    lens: jnp.ndarray,
    k: int,
    L: int,
    max_rows: int = 64,
    max_groups: int = 128,
) -> LongResult:
    codes = unpack_codes_device(packed, nmask, L)
    canon, is_fw, valid = rolling_canonical_kmers(codes, lens, k)
    B, W = canon.shape
    R = min(max_rows, W)
    G = max_groups

    idx, hit, ec_row = lookup_kmers(didx, canon, valid)
    unmapped = (
        jnp.sum(valid, axis=1) - jnp.sum(hit, axis=1)
    ).astype(jnp.int32)

    uid = jnp.where(hit, didx.kmer_uid[idx], -1)

    # distinct non-empty EC rows (for the strict-intersection stage)
    rows = jnp.where(hit & (ec_row >= 0), ec_row, INT32_MAX)
    rows = jnp.sort(rows, axis=1)
    isnew = jnp.concatenate(
        [jnp.ones((B, 1), bool), rows[:, 1:] != rows[:, :-1]], axis=1
    ) & (rows != INT32_MAX)
    uniq = jnp.where(isnew, rows, INT32_MAX)
    uniq = jnp.sort(uniq, axis=1)[:, :R]
    n_rows = jnp.sum(isnew, axis=1).astype(jnp.int32)

    # ordered (uid, ec-content) groups over the hit sequence
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    hp = jnp.where(hit, pos, -1)
    cm = jax.lax.associative_scan(jnp.maximum, hp, axis=1)
    prev_pos = jnp.concatenate(
        [jnp.full((B, 1), -1, cm.dtype), cm[:, :-1]], axis=1
    )
    has_prev = prev_pos >= 0
    pp = jnp.maximum(prev_pos, 0)
    prev_uid = jnp.take_along_axis(uid, pp, axis=1)
    prev_row = jnp.take_along_axis(ec_row, pp, axis=1)
    boundary = hit & (
        ~has_prev | (uid != prev_uid) | (ec_row != prev_row)
    )
    gid = jnp.cumsum(boundary.astype(jnp.int32), axis=1) - 1
    n_groups = jnp.sum(boundary, axis=1).astype(jnp.int32)
    bidx = jax.lax.broadcasted_iota(jnp.int32, (B, W), 0)
    flat = jnp.where(
        boundary & (gid < G), bidx * G + jnp.maximum(gid, 0), B * G
    )
    groups = (
        jnp.full(B * G + 1, -2, jnp.int32)
        .at[flat.reshape(-1)]
        .set(ec_row.reshape(-1).astype(jnp.int32), mode="drop")[: B * G]
        .reshape(B, G)
    )
    return LongResult(
        rows=uniq,
        n_rows=n_rows,
        has_hits=jnp.any(hit, axis=1),
        overflow=n_rows > R,
        unmapped=unmapped,
        groups=groups,
        n_groups=n_groups,
        g_overflow=n_groups > G,
    )


class BiasTables(NamedTuple):
    """Device tables for 5' hexamer extraction (bias correction)."""

    block_start: jnp.ndarray  # [NB] int32 first k-mer pos of mosaic block
    block_end: jnp.ndarray    # [NB] int32 exclusive end
    useq: jnp.ndarray         # [sum len] uint8 unitig base codes
    useq_off: jnp.ndarray     # [U+1] int64


def bias_tables_from_host(index) -> BiasTables:
    return BiasTables(
        block_start=jnp.asarray(index.block_start),
        block_end=jnp.asarray(index.block_end),
        useq=jnp.asarray(index.unitig_seq),
        useq_off=jnp.asarray(index.unitig_seq_off),
    )


@partial(jax.jit, static_argnames=("k",))
def bias_hexamers(bt: BiasTables, s1: SideResult, valid: jnp.ndarray, k: int):
    """Per-read upstream hexamer id (or -1), from mate 1's first hit.

    reference: MinCollector::countBias getPreSeq (src/MinCollector.cpp:
    684-721): fragment-start context on the unitig, pre=2/post=4; the
    forward case reads the 6-mer reverse-complemented, the reverse case
    forward (hexamerToInt revcomp flag).
    """
    pre, post = 2, 4
    blk = jnp.maximum(s1.f_block, 0)
    cstart = bt.block_start[blk]
    clen = bt.block_end[blk] - cstart
    pos = s1.f_upos - cstart
    p = s1.f_rpos
    base = bt.useq_off[jnp.maximum(s1.f_uid, 0)]
    fw_ok = s1.f_strand & (pos - p >= pre)
    rc_ok = (~s1.f_strand) & (clen - 1 - pos - p >= pre)
    start_fw = base + (s1.f_upos - p - pre)
    start_rc = base + (s1.f_upos + p + k - post)
    start = jnp.where(fw_ok, start_fw, start_rc)
    start = jnp.clip(start, 0, bt.useq.shape[0] - 6)
    hex_fw = jnp.zeros_like(start, dtype=jnp.int32)
    hex_rc = jnp.zeros_like(start, dtype=jnp.int32)
    for m in range(6):
        c = bt.useq[start + m].astype(jnp.int32)
        hex_fw = hex_fw | ((3 - c) << (2 * m))       # revcomp read
        hex_rc = hex_rc | (c << (2 * (5 - m)))       # forward read
    ok = valid & s1.has_hits
    return jnp.where(
        ok & fw_ok, hex_fw, jnp.where(ok & rc_ok, hex_rc, -1)
    ).astype(jnp.int32)


@partial(jax.jit, static_argnames=("k",))
def pair_fragment_lengths(s1: SideResult, s2: SideResult, k: int) -> jnp.ndarray:
    """Inferred fragment length per pair, -1 when not inferable.

    reference: KmerIndex::mapPair (src/KmerIndex.cpp:1622-1693): both mates'
    first matched k-mers must lie on the same unitig, in the same mosaic EC
    block, on opposite strands; the length is |p1 - p2| where p is the
    projected read start/end on the unitig.

    Block ids are GLOBAL (unitig-major), so equal f_block already implies
    the same unitig -- no separate uid check (which also lets the halffail
    kernel's reconstructed verified sides, whose f_uid is a placeholder,
    produce correct fragment lengths).
    """
    p1 = jnp.where(s1.f_strand, s1.f_upos - s1.f_rpos, s1.f_upos + k + s1.f_rpos)
    p2 = jnp.where(s2.f_strand, s2.f_upos - s2.f_rpos, s2.f_upos + k + s2.f_rpos)
    ok = (
        s1.has_hits
        & s2.has_hits
        & (s1.f_block == s2.f_block)
        & (s1.f_strand != s2.f_strand)
    )
    return jnp.where(ok, jnp.abs(p1 - p2), -1).astype(jnp.int32)
