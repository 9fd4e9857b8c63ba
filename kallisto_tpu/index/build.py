"""Transcriptome index construction (host side, offline).

Produces the same *semantic* content as the reference's Bifrost-based index
(reference: src/KmerIndex.cpp:247-1168): the compacted de Bruijn graph over
all transcript k-mers, the per-unitig mosaic equivalence-class (EC) blocks,
and per-(block, transcript) position payloads -- but laid out as dense,
device-friendly flat arrays instead of hash maps + Roaring bitmaps:

- a sorted uint64 table of canonical k-mers, probed on device by vectorized
  binary search (replacing Bifrost's minimizer MPHF lookup,
  ext/bifrost/src/Search.tcc:105-140),
- per-k-mer (unitig id, position, orientation, mosaic-block id),
- mosaic blocks (reference: KmerIndex::PopulateMosaicECs, KmerIndex.cpp:1110)
  as interval tables pointing into a deduplicated CSR of sorted transcript-id
  rows (replacing Node/BlockArray/SparseVector),
- CSR payload of (transcript, position|sense) per block, for the
  fragment-length position filter (KmerIndex::findPosition).

The construction itself is vectorized numpy: adjacency via sorted-array
binary search, unitig chaining via simultaneous frontier stepping.
"""

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .kmers import pack_kmers, revcomp_kmers, canonicalize
from .sanitize import sanitize_transcripts
from ..io.fastx import BASE_CODE
from ..common import INDEX_FORMAT_VERSION


@dataclass
class TpuIndex:
    """Flat, device-friendly transcriptome index."""

    k: int
    target_names: List[str]
    target_lens: np.ndarray          # [T] uint32, pre-clip lengths
    num_onlist: int                  # = T when no D-list

    # sorted canonical k-mer table
    kmer_keys: np.ndarray            # [N] uint64, sorted
    kmer_uid: np.ndarray             # [N] int32 unitig id
    kmer_pos: np.ndarray             # [N] int32 k-mer position within unitig
    kmer_fw: np.ndarray              # [N] bool: canonical k-mer lies forward in unitig
    kmer_block: np.ndarray           # [N] int32 global mosaic-block id

    # mosaic EC blocks
    block_uid: np.ndarray            # [NB] int32
    block_start: np.ndarray          # [NB] int32 (k-mer positions, inclusive)
    block_end: np.ndarray            # [NB] int32 (exclusive)
    block_ec: np.ndarray             # [NB] int32 EC content-row id, -1 = empty (wildcard)

    # deduplicated EC content rows (sorted transcript ids per row)
    ec_ptr: np.ndarray               # [NR+1] int64
    ec_tx: np.ndarray                # [nnz] int32

    # per-block (transcript, pos|sense) payload, trid-sorted.  bp_rstart /
    # bp_rstop give the covering run's unitig k-mer interval so transcript
    # coordinates can be recovered anywhere in the block
    # (reference: KmerIndex::findPosition, src/KmerIndex.cpp:2188-2292)
    bp_ptr: np.ndarray               # [NB+1] int64
    bp_tx: np.ndarray                # [bnnz] int32
    bp_pos: np.ndarray               # [bnnz] uint32  (tpos | 0x80000000 if antisense;
    #                                   minimum over covering runs, matching
    #                                   SparseVector::get(tr).minimum())
    bp_rstart: np.ndarray            # [bnnz] int32 (run of the min-pos entry)
    bp_rstop: np.ndarray             # [bnnz] int32
    bp_strand: np.ndarray            # [bnnz] uint8: 1 = sense walk, 0 = antisense,
    #                                   2 = ambiguous (both) -- the SparseVector
    #                                   strand char (SparseVector.hpp:32)

    # unitigs
    unitig_nkmers: np.ndarray        # [U] int32 (#k-mers = length - k + 1)
    unitig_seq_off: np.ndarray       # [U+1] int64 offsets into unitig_seq
    unitig_seq: np.ndarray           # [sum len] uint8 base codes

    # sanitized target sequences (base codes 0..3), for hexamer bias
    # correction (reference: KmerIndex::loadTranscriptSequences used by
    # update_eff_lens, src/weights.cpp:101)
    target_seq_off: np.ndarray = field(default_factory=lambda: np.zeros(1, np.int64))
    target_seq: np.ndarray = field(default_factory=lambda: np.empty(0, np.uint8))

    # D-list (distinguishing flanking k-mers); empty when unused
    dlist_keys: np.ndarray = field(default_factory=lambda: np.empty(0, np.uint64))

    aa: bool = False                 # built from amino acids (--aa, CFC space)
    format_version: int = INDEX_FORMAT_VERSION

    @property
    def num_trans(self) -> int:
        return len(self.target_names)

    @property
    def num_kmers(self) -> int:
        return int(self.kmer_keys.shape[0])

    @property
    def num_unitigs(self) -> int:
        return int(self.unitig_nkmers.shape[0])

    @property
    def num_blocks(self) -> int:
        return int(self.block_uid.shape[0])

    @property
    def num_ec_rows(self) -> int:
        return int(self.ec_ptr.shape[0] - 1)

    def ec_row(self, row: int) -> np.ndarray:
        return self.ec_tx[self.ec_ptr[row] : self.ec_ptr[row + 1]]


def _kmer_string(canon: int, k: int) -> str:
    return "".join("ACGT"[(int(canon) >> (2 * (k - 1 - j))) & 3] for j in range(k))


def shaded_target_name(name: str) -> Tuple[str, str]:
    """Split "<color>_shade_<variant>" -> (color-name, variant); ("", "")
    when the name is not a shade (reference: shadedTargetName,
    src/KmerIndex.cpp:236-244)."""
    pos = name.find("_shade_")
    if pos < 0:
        return "", ""
    return name[:pos], name[pos + len("_shade_"):]


def _atoi(s: str) -> int:
    """C atoi: leading integer prefix, 0 if none."""
    i = 0
    neg = False
    if i < len(s) and s[i] in "+-":
        neg = s[i] == "-"
        i += 1
    j = i
    while j < len(s) and s[j].isdigit():
        j += 1
    if j == i:
        return 0
    v = int(s[i:j])
    return -v if neg else v


def _parse_distinguish(fasta_paths: Sequence[str], k: int):
    """Read a --distinguish FASTA: names are integer "colors", optionally
    with a _shade_<variant> suffix (reference: BuildDistinguishingGraph,
    src/KmerIndex.cpp:413-496).  Sequences are NOT sanitized (the reference
    re-emits them raw); k-mers containing non-ACGT are simply skipped by
    the packing stage.

    Returns (seqs, seq_color, seq_shade [-1 if none], target_names,
    target_lens, ncolors).
    """
    from ..io.fastx import read_fasta

    seqs: List[str] = []
    seq_color: List[int] = []
    seq_variant: List[str] = []
    variants_set = set()
    max_color = 0
    for path in fasta_paths:
        for header, seq in read_fasta(path):
            name = header.split()[0] if header.split() else ""
            if not name:
                continue
            tname, variant = shaded_target_name(name)
            color = _atoi(tname if tname else name)
            if variant:
                variants_set.add(f"{color}_shade_{variant}")
            max_color = max(max_color, color)
            seqs.append(seq.upper())
            seq_color.append(color)
            seq_variant.append(f"{color}_shade_{variant}" if variant else "")
    ncolors = max_color + 1
    target_names = [str(i) for i in range(ncolors)]
    # shade targets follow the colors in std::set (lexicographic) order
    variants = sorted(variants_set)
    target_names += variants
    variant_id = {v: ncolors + i for i, v in enumerate(variants)}
    seq_shade = np.array(
        [variant_id[v] if v else -1 for v in seq_variant], np.int64
    )
    target_lens = np.full(len(target_names), k, np.uint32)  # dummy lengths
    return seqs, np.array(seq_color, np.int64), seq_shade, target_names, target_lens, ncolors


def _dlist_collect(
    dlist_paths: Sequence[str], keys: np.ndarray, k: int, overhang: int = 1
) -> Tuple[np.ndarray, np.ndarray]:
    """Collect D-list k-mers (reference: KmerIndex::DListFlankingKmers,
    src/KmerIndex.cpp:682-1003).

    Named sequences contribute *flanking* k-mers: the unmapped k-mers
    immediately bordering each maximal graph-covered stretch (up to
    `overhang` on each side, with the reference's exact lb>=1 / ub+k<len
    guards).  Unnamed ("special") records contribute every k-mer.
    Returns (flank_canon, special_canon) as sorted unique uint64 arrays.
    Divergence from the reference: k-mers containing 1-3 non-ACGT bases
    are dropped here (the reference keeps them with bifrost's 2-bit
    coercion); such k-mers cannot match any N-free read k-mer anyway.
    """
    from ..io.fastx import read_fasta

    flank: List[np.ndarray] = []
    special: List[np.ndarray] = []
    for path in dlist_paths:
        for header, seq in read_fasta(path):
            name = header.split()[0] if header.split() else ""
            s = seq.upper()
            if len(s) < k:
                continue
            codes = BASE_CODE[np.frombuffer(s.encode(), dtype=np.uint8)]
            km, valid = pack_kmers(codes, k)
            canon, _ = canonicalize(km, k)
            if name == "":
                special.append(canon[valid])
                continue
            idx = np.searchsorted(keys, canon)
            idx_c = np.minimum(idx, max(keys.shape[0] - 1, 0))
            mapped = valid & (
                keys[idx_c] == canon if keys.size else np.zeros_like(valid)
            )
            n = mapped.shape[0]
            # maximal mapped runs [a, b)
            d = np.diff(np.concatenate([[0], mapped.view(np.int8), [0]]))
            starts = np.flatnonzero(d == 1)
            ends = np.flatnonzero(d == -1)
            take = []
            for a, b in zip(starts, ends):
                lb = a - 1
                for i in range(min(lb, overhang)):
                    if valid[lb - i]:
                        take.append(canon[lb - i])
                if b > lb and b + k < len(s):
                    for i in range(min(len(s) - b, overhang)):
                        if b + i < n and valid[b + i]:
                            take.append(canon[b + i])
            if take:
                flank.append(np.array(take, np.uint64))
    fl = (
        np.unique(np.concatenate(flank)) if flank else np.empty(0, np.uint64)
    )
    sp = (
        np.unique(np.concatenate(special)) if special else np.empty(0, np.uint64)
    )
    return fl, sp


def _collect_canonical_kmers(seqs: Sequence[str], k: int) -> np.ndarray:
    parts = []
    for s in seqs:
        if len(s) < k:
            continue
        codes = BASE_CODE[np.frombuffer(s.encode(), dtype=np.uint8)]
        km, valid = pack_kmers(codes, k)
        canon, _ = canonicalize(km[valid], k)
        parts.append(canon)
    if not parts:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(parts))


def _oriented_successors(
    keys: np.ndarray, oriented: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """For each oriented k-mer, its de Bruijn successors among `keys`.

    Returns (outdeg [M], succ_idx [M], succ_orient [M]); succ_* are valid only
    where outdeg == 1 (the only case unitig chaining needs).
    succ_orient is 0 when the successor k-mer equals its canonical form.
    """
    mask = np.uint64((1 << (2 * k)) - 1)
    outdeg = np.zeros(oriented.shape[0], np.int32)
    succ_idx = np.full(oriented.shape[0], -1, np.int64)
    succ_orient = np.zeros(oriented.shape[0], np.uint8)
    base = (oriented << np.uint64(2)) & mask
    for b in range(4):
        cand = base | np.uint64(b)
        canon, is_fw = canonicalize(cand, k)
        idx = np.searchsorted(keys, canon)
        idx_c = np.minimum(idx, keys.shape[0] - 1)
        present = keys[idx_c] == canon
        outdeg += present
        succ_idx = np.where(present, idx_c, succ_idx)
        succ_orient = np.where(present, np.where(is_fw, 0, 1).astype(np.uint8), succ_orient)
    return outdeg, succ_idx, succ_orient


def _build_unitigs(keys: np.ndarray, k: int):
    """Compact the k-mer de Bruijn graph into unitigs (maximal non-branching
    paths), vectorized: all chains advance one step per iteration.

    Equivalent in content to Bifrost's CompactedDBG::build + unitig
    compaction (ext/bifrost/src/CompactedDBG.tcc); orientation/order of the
    unitig list is our own deterministic convention.

    Returns (kmer_uid, kmer_pos, kmer_fw, unitig_nkmers, chains) where
    chains is a list of (kmer_idx array, orient array) per unitig.
    """
    N = keys.shape[0]
    if N == 0:
        return (
            np.empty(0, np.int32), np.empty(0, np.int32), np.empty(0, bool),
            np.empty(0, np.int32), [],
        )
    rc = revcomp_kmers(keys, k)

    # orientation 0 walks the canonical k-mer forward, 1 walks its twin
    outdeg = np.empty((2, N), np.int32)
    succ_idx = np.empty((2, N), np.int64)
    succ_orient = np.empty((2, N), np.uint8)
    for o, arr in ((0, keys), (1, rc)):
        outdeg[o], succ_idx[o], succ_orient[o] = _oriented_successors(keys, arr, k)

    def is_start(i: np.ndarray, o: np.ndarray) -> np.ndarray:
        # (i,o) starts a unitig iff no simple edge enters it: either its
        # reverse side branches (indeg != 1), or its unique predecessor's
        # forward side branches
        rev_deg = outdeg[1 - o, i]
        has_unique_pred = rev_deg == 1
        q = np.where(has_unique_pred, succ_idx[1 - o, i], 0)
        qo = np.where(has_unique_pred, succ_orient[1 - o, i], 0)
        pred_out = outdeg[1 - qo, q]
        return ~has_unique_pred | (pred_out != 1)

    all_i = np.arange(N, dtype=np.int64)
    starts = []
    for o in (0, 1):
        oo = np.full(N, o, np.int64)
        s = is_start(all_i, oo)
        starts.append(np.stack([all_i[s], oo[s]], axis=1))
    starts = np.concatenate(starts, axis=0)  # [S, 2] (kmer idx, orient)

    # simultaneous chain stepping; records (chain, step) visits
    S = starts.shape[0]
    visit_chain: List[np.ndarray] = []
    visit_kmer: List[np.ndarray] = []
    visit_orient: List[np.ndarray] = []

    chain_ids = np.arange(S, dtype=np.int64)
    cur_i = starts[:, 0].copy()
    cur_o = starts[:, 1].copy()
    active = np.ones(S, bool)
    step = 0
    chain_len = np.zeros(S, np.int64)
    while active.any():
        ai = chain_ids[active]
        visit_chain.append(ai)
        visit_kmer.append(cur_i[active])
        visit_orient.append(cur_o[active])
        chain_len[active] += 1
        # can we extend? need outdeg==1 here and indeg==1 at the successor
        io, oo = cur_i[active], cur_o[active]
        can = outdeg[oo, io] == 1
        ni = np.where(can, succ_idx[oo, io], 0)
        no = np.where(can, succ_orient[oo, io], 0)
        can &= outdeg[1 - no, ni] == 1
        # never extend a unitig into its own twin (immediate hairpin)
        can &= ni != io
        # a successor that is itself a unitig start would mean a cycle of
        # simple edges; linear chains never hit one (their far end branches)
        nxt_active = np.zeros(S, bool)
        nxt_active[ai[can]] = True
        cur_i[ai[can]] = ni[can]
        cur_o[ai[can]] = no[can]
        active = nxt_active
        step += 1
        if step > N + 1:
            raise RuntimeError("unitig chaining failed to terminate")

    if visit_chain:
        vc = np.concatenate(visit_chain)
        vk = np.concatenate(visit_kmer)
        vo = np.concatenate(visit_orient)
    else:
        # purely cyclic graph (e.g. a repeat-only sequence): no starts at all
        vc = np.empty(0, np.int64)
        vk = np.empty(0, np.int64)
        vo = np.empty(0, np.uint8)
    # order visits by (chain, step): steps were appended in order, and within
    # a step chains are ascending, so a stable sort by chain yields (chain, step)
    order = np.argsort(vc, kind="stable")
    vk = vk[order]
    vo = vo[order]
    chain_ptr = np.zeros(S + 1, np.int64)
    np.cumsum(chain_len, out=chain_ptr[1:])

    # each linear unitig was traversed twice (once per direction); keep the
    # traversal whose (first kmer, orient) tuple is smaller than its
    # partner's start (= last kmer, flipped orientation)
    first_i = vk[chain_ptr[:-1]]
    first_o = vo[chain_ptr[:-1]]
    last_i = vk[chain_ptr[1:] - 1]
    last_o = vo[chain_ptr[1:] - 1]
    partner_i, partner_o = last_i, 1 - last_o
    keep = (first_i < partner_i) | ((first_i == partner_i) & (first_o < partner_o))

    kmer_uid = np.full(N, -1, np.int32)
    kmer_pos = np.full(N, -1, np.int32)
    kmer_fw = np.zeros(N, bool)
    chains: List[Tuple[np.ndarray, np.ndarray]] = []

    kept = np.flatnonzero(keep)
    for uid, c in enumerate(kept):
        sl = slice(chain_ptr[c], chain_ptr[c + 1])
        ki, ko = vk[sl], vo[sl]
        kmer_uid[ki] = uid
        kmer_pos[ki] = np.arange(ki.shape[0], dtype=np.int32)
        kmer_fw[ki] = ko == 0
        chains.append((ki, ko))

    # cycles of simple edges (no start): walk them with a scalar loop
    unassigned = np.flatnonzero(kmer_uid < 0)
    while unassigned.size:
        i0 = int(unassigned[0])
        uid = len(chains)
        ki_list, ko_list = [], []
        i, o = i0, 0
        while True:
            ki_list.append(i)
            ko_list.append(o)
            kmer_uid[i] = uid
            kmer_pos[i] = len(ki_list) - 1
            kmer_fw[i] = o == 0
            i2, o2 = int(succ_idx[o, i]), int(succ_orient[o, i])
            if kmer_uid[i2] >= 0:
                break
            i, o = i2, o2
        chains.append((np.array(ki_list, np.int64), np.array(ko_list, np.uint8)))
        unassigned = np.flatnonzero(kmer_uid < 0)

    unitig_nkmers = np.array([c[0].shape[0] for c in chains], np.int32)
    return kmer_uid, kmer_pos, kmer_fw, unitig_nkmers, chains


def _unitig_sequences(keys: np.ndarray, chains, k: int):
    """Reconstruct unitig base-code sequences from their k-mer chains."""
    rc_all = revcomp_kmers(keys, k)
    offs = [0]
    parts = []
    for ki, ko in chains:
        ov = np.where(ko == 0, keys[ki], rc_all[ki])
        L = ki.shape[0] + k - 1
        seq = np.empty(L, np.uint8)
        first = int(ov[0])
        for j in range(k):
            seq[j] = (first >> (2 * (k - 1 - j))) & 3
        if ki.shape[0] > 1:
            seq[k:] = (ov[1:] & np.uint64(3)).astype(np.uint8)
        parts.append(seq)
        offs.append(offs[-1] + L)
    seqpool = np.concatenate(parts) if parts else np.empty(0, np.uint8)
    return np.array(offs, np.int64), seqpool


def _transcript_runs(
    seqs: Sequence[str],
    k: int,
    keys: np.ndarray,
    kmer_uid: np.ndarray,
    kmer_pos: np.ndarray,
    kmer_fw: np.ndarray,
):
    """Walk every transcript through the graph, emitting coverage runs.

    A run corresponds to one TRInfo of the reference
    (reference: src/KmerIndex.cpp:1030-1080): a maximal stretch of
    consecutive transcript k-mers advancing along one unitig in one
    direction.  Returns arrays (run_uid, run_trid, run_start, run_stop,
    run_pos) where run_pos = transcript position of the run's first k-mer
    with bit 31 set when the walk is antisense.
    """
    r_uid, r_trid, r_start, r_stop, r_pos = [], [], [], [], []
    for j, s in enumerate(seqs):
        if len(s) < k:
            continue
        codes = BASE_CODE[np.frombuffer(s.encode(), dtype=np.uint8)]
        km, valid = pack_kmers(codes, k)
        canon, is_fw = canonicalize(km, k)
        idx = np.minimum(np.searchsorted(keys, canon), keys.shape[0] - 1)
        uid = kmer_uid[idx]
        upos = kmer_pos[idx]
        # walking forward in the unitig iff the transcript k-mer orientation
        # matches the orientation of the canonical k-mer within the unitig
        strand = is_fw == kmer_fw[idx]
        n = uid.shape[0]
        stepv = np.where(strand, 1, -1).astype(np.int64)
        brk = np.ones(n, bool)
        if n > 1:
            brk[1:] = (
                (uid[1:] != uid[:-1])
                | (strand[1:] != strand[:-1])
                | (upos[1:].astype(np.int64) != upos[:-1].astype(np.int64) + stepv[:-1])
                # N-containing k-mers (possible in --aa CFC space) break runs
                | ~valid[1:]
                | ~valid[:-1]
            )
        run_first = np.flatnonzero(brk)
        run_last = np.empty_like(run_first)
        run_last[:-1] = run_first[1:] - 1
        run_last[-1] = n - 1
        # invalid (N-containing) k-mers form their own single runs (every
        # boundary around them breaks); drop those runs entirely
        keep = valid[run_first]
        run_first = run_first[keep]
        run_last = run_last[keep]
        if run_first.size == 0:
            continue
        p0 = upos[run_first].astype(np.int64)
        p1 = upos[run_last].astype(np.int64)
        st = strand[run_first]
        r_uid.append(uid[run_first].astype(np.int64))
        r_trid.append(np.full(run_first.shape[0], j, np.int64))
        r_start.append(np.minimum(p0, p1))
        r_stop.append(np.maximum(p0, p1) + 1)
        r_pos.append(
            run_first.astype(np.uint32) | np.where(st, 0, 0x80000000).astype(np.uint32)
        )
    if not r_uid:
        z = np.empty(0, np.int64)
        return z, z, z, z, np.empty(0, np.uint32)
    return (
        np.concatenate(r_uid),
        np.concatenate(r_trid),
        np.concatenate(r_start),
        np.concatenate(r_stop),
        np.concatenate(r_pos),
    )


def _build_blocks(
    num_unitigs: int,
    unitig_nkmers: np.ndarray,
    run_uid: np.ndarray,
    run_trid: np.ndarray,
    run_start: np.ndarray,
    run_stop: np.ndarray,
    run_pos: np.ndarray,
    max_ec_size: int,
):
    """Mosaic-EC block construction (reference: PopulateMosaicECs,
    src/KmerIndex.cpp:1110-1168) + EC-content deduplication.

    Unitigs whose run count exceeds max_ec_size (when > 0) are discarded:
    their single block gets the empty/wildcard EC
    (reference: src/KmerIndex.cpp:1047-1097).
    """
    order = np.lexsort((run_trid, run_uid))
    run_uid = run_uid[order]
    run_trid = run_trid[order]
    run_start = run_start[order]
    run_stop = run_stop[order]
    run_pos = run_pos[order]

    uptr = np.zeros(num_unitigs + 1, np.int64)
    counts = np.bincount(run_uid, minlength=num_unitigs)
    np.cumsum(counts, out=uptr[1:])

    block_uid: List[int] = []
    block_start: List[int] = []
    block_end: List[int] = []
    bp_tx_parts: List[np.ndarray] = []
    bp_pos_parts: List[np.ndarray] = []
    bp_rstart_parts: List[np.ndarray] = []
    bp_rstop_parts: List[np.ndarray] = []
    bp_strand_parts: List[np.ndarray] = []
    bp_counts: List[int] = []

    ec_rows: Dict[Tuple[int, ...], int] = {}
    block_ec: List[int] = []

    empty_tx = np.empty(0, np.int64)
    empty_pos = np.empty(0, np.uint32)

    for u in range(num_unitigs):
        lo, hi = uptr[u], uptr[u + 1]
        nk = int(unitig_nkmers[u])
        n_runs = hi - lo
        capped = max_ec_size > 0 and n_runs > max_ec_size
        if n_runs == 0 or capped:
            block_uid.append(u)
            block_start.append(0)
            block_end.append(nk)
            block_ec.append(-1)
            bp_tx_parts.append(empty_tx)
            bp_pos_parts.append(empty_pos)
            bp_rstart_parts.append(empty_tx)
            bp_rstop_parts.append(empty_tx)
            bp_strand_parts.append(np.empty(0, np.uint8))
            bp_counts.append(0)
            continue
        starts = run_start[lo:hi]
        stops = run_stop[lo:hi]
        trids = run_trid[lo:hi]
        poss = run_pos[lo:hi]
        brk = np.unique(np.concatenate([starts, stops]))
        # every unitig k-mer comes from some transcript, so runs tile it
        # exactly (reference asserts this too, src/KmerIndex.cpp:1132-1133)
        assert brk[0] == 0 and brk[-1] == nk, (u, brk[0], brk[-1], nk)
        for bi in range(brk.shape[0] - 1):
            bs, be = int(brk[bi]), int(brk[bi + 1])
            cover = (starts <= bs) & (stops >= be)
            tx = trids[cover]
            px = poss[cover]
            rs = starts[cover]
            re = stops[cover]
            # a transcript may cover the block via multiple runs: keep the
            # MINIMUM raw pos (SparseVector.minimum() semantics) and mark the
            # strand char ambiguous (2) when both orientations occur
            if tx.shape[0] > 1:
                order2 = np.lexsort((px, tx))
                tx, px, rs, re = tx[order2], px[order2], rs[order2], re[order2]
                first = np.ones(tx.shape[0], bool)
                first[1:] = tx[1:] != tx[:-1]
                bits = (px >> 31).astype(np.uint8)
                grp = np.cumsum(first) - 1
                n_grp = int(grp[-1]) + 1
                any0 = np.zeros(n_grp, bool)
                any1 = np.zeros(n_grp, bool)
                np.logical_or.at(any0, grp, bits == 0)
                np.logical_or.at(any1, grp, bits == 1)
                strand = np.where(
                    any0 & any1, 2, np.where(any0, 1, 0)
                ).astype(np.uint8)
                tx, px, rs, re = tx[first], px[first], rs[first], re[first]
            else:
                strand = np.where((px >> 31) == 0, 1, 0).astype(np.uint8)
            key = tuple(int(t) for t in tx)
            row = ec_rows.setdefault(key, len(ec_rows))
            block_uid.append(u)
            block_start.append(bs)
            block_end.append(be)
            block_ec.append(row)
            bp_tx_parts.append(tx)
            bp_pos_parts.append(px)
            bp_rstart_parts.append(rs)
            bp_rstop_parts.append(re)
            bp_strand_parts.append(strand)
            bp_counts.append(tx.shape[0])

    NB = len(block_uid)
    row_list = sorted(ec_rows.items(), key=lambda kv: kv[1])
    sizes = np.array([len(t) for t, _ in row_list], np.int64)
    ec_ptr = np.zeros(len(row_list) + 1, np.int64)
    np.cumsum(sizes, out=ec_ptr[1:])
    ec_tx = (
        np.concatenate([np.array(t, np.int32) for t, _ in row_list])
        if row_list and ec_ptr[-1] > 0
        else np.empty(0, np.int32)
    )

    bp_ptr = np.zeros(NB + 1, np.int64)
    np.cumsum(np.array(bp_counts, np.int64), out=bp_ptr[1:])
    bp_tx = (
        np.concatenate(bp_tx_parts).astype(np.int32)
        if bp_tx_parts
        else np.empty(0, np.int32)
    )
    bp_pos = (
        np.concatenate(bp_pos_parts).astype(np.uint32)
        if bp_pos_parts
        else np.empty(0, np.uint32)
    )
    bp_rstart = (
        np.concatenate(bp_rstart_parts).astype(np.int32)
        if bp_rstart_parts
        else np.empty(0, np.int32)
    )
    bp_rstop = (
        np.concatenate(bp_rstop_parts).astype(np.int32)
        if bp_rstop_parts
        else np.empty(0, np.int32)
    )
    bp_strand = (
        np.concatenate(bp_strand_parts).astype(np.uint8)
        if bp_strand_parts
        else np.empty(0, np.uint8)
    )

    return (
        np.array(block_uid, np.int32),
        np.array(block_start, np.int32),
        np.array(block_end, np.int32),
        np.array(block_ec, np.int32),
        ec_ptr,
        ec_tx,
        bp_ptr,
        bp_tx,
        bp_pos,
        bp_rstart,
        bp_rstop,
        bp_strand,
    )


def build_index(
    fasta_paths: Sequence[str],
    k: int = 31,
    make_unique: bool = False,
    max_ec_size: int = -1,
    dlist_paths: Optional[Sequence[str]] = None,
    aa: bool = False,
    distinguish: bool = False,
) -> TpuIndex:
    if k % 2 == 0 or k < 3 or k > 31:
        raise ValueError("k must be odd and in [3, 31]")

    seq_color = seq_shade = None
    if distinguish:
        # sequences distinguished by (integer) name: one target per color
        # plus one per shade variant; no sanitization, no EC thresholding
        # (reference: BuildDistinguishingGraph, src/KmerIndex.cpp:413-570)
        (
            base_seqs, seq_color, seq_shade, base_names, base_lens, _ncolors,
        ) = _parse_distinguish(fasta_paths, k)
        max_ec_size = -1
        san = None
    else:
        san = sanitize_transcripts(fasta_paths, make_unique=make_unique, aa=aa)
        base_seqs = san.seqs
        base_names = san.names
        base_lens = np.array(san.lens, np.uint32)
    num_targets = len(base_names)
    keys = _collect_canonical_kmers(base_seqs, k)

    # -- D-list (reference: KmerIndex::DListFlankingKmers,
    #    src/KmerIndex.cpp:682-1003): flanking k-mers of masked sequences
    #    become k-length pseudo-targets past the on-list boundary; one
    #    "dummy" k-mer joins the graph so D-list hits resolve to a
    #    sentinel EC that vetoes the read by empty intersection.
    dl_all = np.empty(0, np.uint64)
    dummy_canon = None
    if dlist_paths:
        flank, special = _dlist_collect(dlist_paths, keys, k)
        in_graph_fl = np.isin(flank, keys)
        dl_all = np.unique(np.concatenate([flank[~in_graph_fl], special]))
        not_in_graph = dl_all[~np.isin(dl_all, keys)]
        if not_in_graph.size:
            dummy_canon = np.uint64(not_in_graph[0])
            keys = np.unique(np.concatenate([keys, not_in_graph[:1]]))
        elif dl_all.size:
            dummy_canon = np.uint64(dl_all[0])  # special k-mer already in graph

    kmer_uid, kmer_pos, kmer_fw, unitig_nkmers, chains = _build_unitigs(keys, k)
    useq_off, useq = _unitig_sequences(keys, chains, k)

    walk_seqs = list(base_seqs)
    num_seqs = len(base_seqs)
    trid_remap = (
        seq_color.copy() if distinguish
        else np.arange(num_seqs, dtype=np.int64)
    )
    dl_names: List[str] = []
    if dl_all.size:
        dl_names = [f"d_list.{j}" for j in range(dl_all.shape[0])]
        # pseudo-targets whose k-mer is in the graph participate in EC
        # construction (the reference appends them to the tmp FASTA)
        extra_ids = []
        for j, c in enumerate(dl_all):
            idx = np.searchsorted(keys, np.uint64(c))
            if idx < keys.shape[0] and keys[idx] == np.uint64(c):
                walk_seqs.append(_kmer_string(int(c), k))
                extra_ids.append(num_targets + j)
        trid_remap = np.concatenate(
            [trid_remap, np.array(extra_ids, np.int64)]
        )

    runs = _transcript_runs(walk_seqs, k, keys, kmer_uid, kmer_pos, kmer_fw)
    if distinguish and (seq_shade >= 0).any():
        # a shaded sequence contributes each run TWICE: once under its color
        # and once under its shade target (reference: src/KmerIndex.cpp:551-559)
        widx = runs[1]
        is_shaded = (widx < num_seqs) & (seq_shade[np.minimum(widx, num_seqs - 1)] >= 0)
        sh = np.flatnonzero(is_shaded)
        runs = tuple(
            np.concatenate([a, a[sh]]) for a in runs
        )
        trids = trid_remap[runs[1]]
        trids[runs[1].shape[0] - sh.shape[0]:] = seq_shade[widx[sh]]
        runs = (runs[0], trids, *runs[2:])
    else:
        runs = (runs[0], trid_remap[runs[1]], *runs[2:])
    (
        block_uid, block_start, block_end, block_ec,
        ec_ptr, ec_tx, bp_ptr, bp_tx, bp_pos, bp_rstart, bp_rstop, bp_strand,
    ) = _build_blocks(len(chains), unitig_nkmers, *runs, max_ec_size)

    # per-kmer block id: blocks are emitted unitig-major with ascending
    # intervals, so assign by searching each unitig's block starts
    NB = block_uid.shape[0]
    kmer_block = np.full(keys.shape[0], -1, np.int32)
    # block index ranges per unitig
    ub_ptr = np.zeros(len(chains) + 1, np.int64)
    np.cumsum(np.bincount(block_uid, minlength=len(chains)), out=ub_ptr[1:])
    for u in range(len(chains)):
        lo, hi = int(ub_ptr[u]), int(ub_ptr[u + 1])
        ki = chains[u][0]
        pos = kmer_pos[ki]
        bstarts = block_start[lo:hi]
        bidx = np.searchsorted(bstarts, pos, side="right") - 1
        kmer_block[ki] = (lo + bidx).astype(np.int32)

    if dl_all.size and dummy_canon is not None:
        di = int(np.searchsorted(keys, dummy_canon))
        d_uid = kmer_uid[di]
        d_pos = kmer_pos[di]
        d_fw = kmer_fw[di]
        d_block = kmer_block[di]
        # special k-mers living on real unitigs still veto: point their
        # table entries at the dummy/sentinel block (reference: the final
        # match() D-list scan appends a dummy hit for them regardless of
        # graph membership, src/KmerIndex.cpp:1930-1940)
        for c in dl_all:
            idx = int(np.searchsorted(keys, np.uint64(c)))
            if idx < keys.shape[0] and keys[idx] == np.uint64(c):
                kmer_uid[idx] = d_uid
                kmer_pos[idx] = d_pos
                kmer_fw[idx] = d_fw
                kmer_block[idx] = d_block
        # remaining D-list k-mers (absent from the graph) enter the lookup
        # table pointing at the dummy block (reference: match() probes the
        # d_list set and pushes {um_dummy, pos})
        absent = dl_all[~np.isin(dl_all, keys)]
        if absent.size:
            ins = np.searchsorted(keys, absent)
            keys = np.insert(keys, ins, absent)
            kmer_uid = np.insert(kmer_uid, ins, d_uid)
            kmer_pos = np.insert(kmer_pos, ins, d_pos)
            kmer_fw = np.insert(kmer_fw, ins, d_fw)
            kmer_block = np.insert(kmer_block, ins, d_block)

    return TpuIndex(
        k=k,
        target_names=base_names + dl_names,
        target_lens=np.concatenate(
            [np.asarray(base_lens, np.uint32),
             np.full(len(dl_names), k, np.uint32)]
        ),
        num_onlist=num_targets,
        kmer_keys=keys,
        kmer_uid=kmer_uid,
        kmer_pos=kmer_pos,
        kmer_fw=kmer_fw,
        kmer_block=kmer_block,
        block_uid=block_uid,
        block_start=block_start,
        block_end=block_end,
        block_ec=block_ec,
        ec_ptr=ec_ptr,
        ec_tx=ec_tx,
        bp_ptr=bp_ptr,
        bp_tx=bp_tx,
        bp_pos=bp_pos,
        bp_rstart=bp_rstart,
        bp_rstop=bp_rstop,
        bp_strand=bp_strand,
        unitig_nkmers=unitig_nkmers,
        unitig_seq_off=useq_off,
        unitig_seq=useq,
        # per-target sequences only exist when targets map 1:1 to inputs
        # (distinguish colors aggregate many sequences; bias is unsupported)
        target_seq_off=(
            np.zeros(num_targets + 1, np.int64) if distinguish
            else np.concatenate(
                [[0], np.cumsum([len(s) for s in base_seqs])]
            ).astype(np.int64)
        ),
        target_seq=(
            BASE_CODE[
                np.frombuffer("".join(base_seqs).encode(), dtype=np.uint8)
            ]
            if base_seqs and not distinguish else np.empty(0, np.uint8)
        ),
        dlist_keys=dl_all,
        aa=aa,
    )
