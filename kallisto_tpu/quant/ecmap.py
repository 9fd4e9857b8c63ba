"""Dynamic equivalence-class discovery and counting (host side).

The reference maintains a mutable hash map Roaring-set -> EC id that worker
threads race to update under transfer locks (reference:
src/MinCollector.cpp:251-269, src/ProcessReads.cpp:1148-1161, 424-646).
Here the device reduces each read to its sorted set of distinct EC *rows*
(static index content rows); the host then:

1. deduplicates row-set keys per batch (np.unique over the padded key
   matrix) -- thousands of unique keys per million reads,
2. resolves each new key once: intersect the row transcript lists with the
   reference's non-strict paired rules (src/MinCollector.cpp:160-218),
3. counts final per-read transcript sets, assigning EC ids in first-seen
   read order (deterministic, matching a single-threaded reference run).

Resolution (key -> transcript set) and counting (set -> EC id, += count)
are separate because filters (fragment-length position filter, strand
specificity) may shrink a read's set *after* resolution but *before*
counting, and only counted sets enter the EC map
(reference: ProcessReads.cpp:1091-1161).
"""

from typing import Dict, List, Optional, Tuple

import numpy as np

INT32_MAX = np.int32(2**31 - 1)


class _GrowCounts:
    """Growable int64 count vector with list-like [] access (the EC count
    table; reference: MinCollector::counts)."""

    def __init__(self):
        self._a = np.zeros(1024, np.int64)
        self.n = 0

    def append(self, v: int) -> None:
        if self.n == self._a.shape[0]:
            b = np.zeros(self._a.shape[0] * 2, np.int64)
            b[: self.n] = self._a
            self._a = b
        self._a[self.n] = v
        self.n += 1

    def __getitem__(self, i):
        return self._a[i]

    def __setitem__(self, i, v):
        self._a[i] = v

    def __len__(self):
        return self.n

    def add_at(self, idx: np.ndarray, occ: np.ndarray) -> None:
        np.add.at(self._a, idx, occ)

    def array(self) -> np.ndarray:
        return self._a[: self.n].copy()


class _SortedCache128:
    """Batch-lookup map from 128-bit hashes to int64 values.

    Keys live as a V16 (memcmp-ordered void) sorted array; a whole
    batch's worth of lookups is one searchsorted.  Inserts re-sort
    (microseconds up to millions of keys, once per batch at most).
    """

    def __init__(self):
        self._keys = np.empty(0, "V16")
        self._vals = np.empty(0, np.int64)

    @staticmethod
    def _as_void(h: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(h).view("V16").reshape(-1)

    def lookup(self, h: np.ndarray):
        """h: [n, 2] int64 -> (values [n] int64, found [n] bool)."""
        q = self._as_void(h)
        if self._keys.shape[0] == 0:
            return np.empty(q.shape[0], np.int64), np.zeros(q.shape[0], bool)
        pos = np.searchsorted(self._keys, q)
        pos_c = np.minimum(pos, self._keys.shape[0] - 1)
        found = self._keys[pos_c] == q
        return self._vals[pos_c], found

    def insert(self, h: np.ndarray, vals: np.ndarray) -> None:
        q = self._as_void(h)
        keys = np.concatenate([self._keys, q])
        vv = np.concatenate([self._vals, vals.astype(np.int64)])
        o = np.argsort(keys, kind="stable")
        self._keys = keys[o]
        self._vals = vv[o]


class EcResolver:
    def __init__(self, index, mask_offlist: bool = True,
                 dfk_onlist: bool = False):
        self.ec_ptr = index.ec_ptr
        self.ec_tx = index.ec_tx
        self.num_onlist = index.num_onlist
        # mask_offlist=False keeps raw sets (the --aa 6-frame combiner needs
        # to see off-list members before masking, MinCollector.cpp:51-71)
        self.has_offlist = mask_offlist and index.num_onlist < index.num_trans
        # --dfk-onlist: D-list members are not intersected away; a fragment
        # touching the D-list keeps a sentinel target (= num_onlist) unless
        # ALL its members are off-list (reference: includeDList,
        # src/MinCollector.cpp:37-42,147-151,190-193; ProcessReads.cpp:1713-1722)
        self.dfk_onlist = dfk_onlist
        # shades: targets named "<color>_shade_<variant>" from a --distinguish
        # index.  Detected from names exactly like the reference's load path
        # (src/KmerIndex.cpp:1506-1517).
        self.use_shade = False
        shade_ids = [
            i for i, n in enumerate(index.target_names) if "_shade_" in n
        ]
        if shade_ids:
            T = index.num_trans
            self.use_shade = True
            self._shade_mask = np.zeros(T, bool)
            self._shade_mask[shade_ids] = True
            self._shade_color = np.full(T, -1, np.int64)
            name_pos = {}
            for i, n in enumerate(index.target_names):
                name_pos.setdefault(n, i)
            for i in shade_ids:
                n = index.target_names[i]
                tname = n[: n.find("_shade_")]
                if tname in name_pos:
                    self._shade_color[i] = name_pos[tname]
        # dynamic EC map: key = sorted transcript-id int32 bytes -> ec id
        self.ecmapinv: Dict[bytes, int] = {}
        self.ec_sets: List[np.ndarray] = []
        self.counts = _GrowCounts()
        self.num_mapped = 0  # running total for progress reporting
        # cache: raw row-set key bytes -> resolved transcript set (or None)
        self._key_cache: Dict[bytes, Optional[np.ndarray]] = {}
        # cache: 128-bit device key hash -> resolved transcript set (or None)
        self._hash_cache: Dict[bytes, Optional[np.ndarray]] = {}
        # vectorized 128-bit key-hash -> EC id cache for the compact path
        # (-1 = resolves to no set); lookups/inserts are batch numpy ops
        self._ec_cache = _SortedCache128()
        # single-row / two-row-combo -> EC id caches for the bulk simple-
        # key path (human-scale batches carry ~1 distinct key per pair)
        self._row_ec: Dict[int, int] = {}
        self._combo_ec: Dict[Tuple[int, int], int] = {}
        # optional per-key post-resolution filter for the compact path:
        # fn(u, flags, tail_cols, paired) -> set | None.  Keys carry the
        # filter inputs (min_range veto bits in flags; first-hit
        # block/strand columns in the tail), so filtering per KEY equals
        # filtering per read; plain (full-path) keys have no tail and no
        # veto bits, making this a no-op there.
        self.compact_postfilter = None

    # -- EC id management ------------------------------------------------

    def ec_id_for(self, u: np.ndarray) -> int:
        """Find or create the EC id for a sorted transcript set
        (reference: MinCollector::increaseCount, src/MinCollector.cpp:251)."""
        kb = u.astype(np.int32).tobytes()
        ec = self.ecmapinv.get(kb)
        if ec is None:
            ec = len(self.ec_sets)
            self.ecmapinv[kb] = ec
            self.ec_sets.append(u.astype(np.int32))
            self.counts.append(0)
        return ec

    def _row(self, r: int) -> np.ndarray:
        return self.ec_tx[self.ec_ptr[r] : self.ec_ptr[r + 1]]

    def _intersect_rows(self, rows: np.ndarray) -> np.ndarray:
        """Intersection of the transcript lists of non-empty EC rows.

        Content-equivalent to MinCollector::intersectECs
        (src/MinCollector.cpp:425-496): empty/wildcard rows never reach here
        (the device already dropped them) and duplicate rows are idempotent.
        With shades, every row is stripped of shade targets first; rows that
        become empty are skipped as wildcards (MinCollector.cpp:443-465).
        """
        if not self.use_shade:
            u = self._row(int(rows[0]))
            for r in rows[1:]:
                if u.shape[0] == 0:
                    break
                u = _intersect_sorted(u, self._row(int(r)))
            return u
        u = None
        for r in rows:
            row = self._row(int(r))
            row = row[~self._shade_mask[row]]
            if row.shape[0] == 0:
                continue
            u = row if u is None else _intersect_sorted(u, row)
            if u.shape[0] == 0:
                return u
        return u if u is not None else np.empty(0, np.int32)

    def _union_rows(self, rows: np.ndarray) -> np.ndarray:
        u = self._row(int(rows[0]))
        for r in rows[1:]:
            u = np.union1d(u, self._row(int(r)))
        return u

    # -- key resolution --------------------------------------------------

    def _resolve_key(
        self, key: np.ndarray, R: int, paired: bool, do_union: bool
    ) -> Optional[np.ndarray]:
        """Resolve one deduplicated read key -> transcript set (None = none).

        key layout: [rows1 (R), rows2 (R if paired), flags] where flags bit0 =
        mate1 had any k-mer hit, bit1 = mate2 did.  Implements the non-strict
        paired intersection (reference: MinCollector::intersectKmers,
        src/MinCollector.cpp:160-218): a mate with hits but an empty EC
        intersection vetoes the fragment; a mate with no hits at all defers
        to the other mate.
        """
        kb = key.tobytes()
        if kb in self._key_cache:
            return self._key_cache[kb]

        rows1 = key[:R]
        rows1 = rows1[rows1 != INT32_MAX]
        if paired:
            rows2 = key[R : 2 * R]
            rows2 = rows2[rows2 != INT32_MAX]
            flags = int(key[2 * R])
            tail = key[2 * R + 1 :]
            hits1, hits2 = bool(flags & 1), bool(flags & 2)
        else:
            rows2 = np.empty(0, np.int32)
            flags = int(key[R])
            tail = key[R + 1 :]
            hits1, hits2 = bool(flags & 1), False

        u = self.resolve_rows(rows1, hits1, rows2, hits2, paired, do_union)
        if self.compact_postfilter is not None:
            u = self.compact_postfilter(u, flags, tail, paired)
            if u is not None and u.shape[0] == 0:
                u = None
        self._key_cache[kb] = u
        return u

    def resolve_rows(
        self,
        rows1: np.ndarray,
        hits1: bool,
        rows2: np.ndarray,
        hits2: bool,
        paired: bool,
        do_union: bool = False,
    ) -> Optional[np.ndarray]:
        """Core intersection + non-strict pairing on explicit row lists."""
        combine = self._union_rows if do_union else self._intersect_rows
        u1 = combine(rows1) if rows1.shape[0] else np.empty(0, np.int32)
        u2 = combine(rows2) if rows2.shape[0] else np.empty(0, np.int32)

        u: Optional[np.ndarray]
        if u1.shape[0] == 0 and u2.shape[0] == 0:
            u = None
        elif u1.shape[0] == 0:
            u = u2 if not hits1 else None
        elif u2.shape[0] == 0:
            if paired:
                u = u1 if not hits2 else None
            else:
                u = u1
        else:
            if self.dfk_onlist and (
                (u1 >= self.num_onlist).any() or (u2 >= self.num_onlist).any()
            ):
                # includeDList: a shared sentinel keeps D-list-touching
                # fragments alive through the intersection
                # (reference: src/MinCollector.cpp:37-42)
                s = np.int32(self.num_onlist)
                u1 = np.union1d(u1, [s]).astype(u1.dtype)
                u2 = np.union1d(u2, [s]).astype(u2.dtype)
            if self.use_shade:
                # shades never participate in the cross-mate intersection
                # (MinCollector.cpp:194-195; no-op unless do_union)
                u1 = u1[~self._shade_mask[u1]]
                u2 = u2[~self._shade_mask[u2]]
            u = _intersect_sorted(u1, u2)
            if u.shape[0] == 0:
                u = None

        if u is not None and self.use_shade:
            # add back every seen shade whose color is in the intersection
            # (MinCollector.cpp:204-214: union of both mates' row unions,
            # restricted to shades of retained colors)
            seen = [self._row(int(r)) for r in rows1] + [
                self._row(int(r)) for r in rows2
            ]
            if seen:
                allv = np.unique(np.concatenate(seen))
                shades = allv[self._shade_mask[allv]]
                keep = shades[np.isin(self._shade_color[shades], u)]
                if keep.shape[0]:
                    u = np.union1d(u, keep).astype(np.int32)

        # off-list mask (u &= onlist_sequences, ProcessReads.cpp:1072);
        # a no-op until D-list support adds off-list pseudo-targets
        if u is not None and self.has_offlist:
            masked = u[u < self.num_onlist]
            if (self.dfk_onlist and masked.shape[0] != u.shape[0]
                    and masked.shape[0] > 0):
                # re-add the sentinel when a D-list member was stripped but
                # not every member was (reference: ProcessReads.cpp:1713-1722)
                masked = np.append(masked, np.int32(self.num_onlist))
            u = masked
        if u is not None and u.shape[0] == 0:
            u = None
        return u

    # -- batch processing ------------------------------------------------

    def resolve_batch(
        self,
        rows1: np.ndarray,
        has_hits1: np.ndarray,
        rows2: Optional[np.ndarray] = None,
        has_hits2: Optional[np.ndarray] = None,
        do_union: bool = False,
        overflow1: Optional[np.ndarray] = None,
        overflow2: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, List[Optional[np.ndarray]]]:
        """Deduplicate and resolve a batch.

        Returns (read_uidx [B] indices into uniq_sets, uniq_sets); entries of
        uniq_sets are sorted transcript-id arrays or None (fragment rejected).

        Deduplication hashes each key row to one int64 (a full-width
        np.unique over the key matrix costs ~100x more) and then *verifies*
        the grouping exactly: reads whose key differs from their hash
        group's representative (a 64-bit collision, astronomically rare)
        are resolved individually.
        """
        B, R = rows1.shape
        paired = rows2 is not None
        # overflow bits keep truncated keys distinct from genuinely-full ones;
        # overflowed reads are re-resolved via the host fallback afterwards
        fl = has_hits1.astype(np.int32)
        if overflow1 is not None:
            fl = fl + 4 * overflow1.astype(np.int32)
        if paired:
            fl = fl + 2 * has_hits2.astype(np.int32)
            if overflow2 is not None:
                fl = fl + 8 * overflow2.astype(np.int32)
            keys = np.concatenate([rows1, rows2, fl[:, None]], axis=1)
        else:
            keys = np.concatenate([rows1, fl[:, None]], axis=1)

        h = _hash_rows(keys)
        _, first_idx, inverse = np.unique(h, return_index=True, return_inverse=True)
        inverse = inverse.reshape(-1)
        rep = keys[first_idx]
        exact = (keys == rep[inverse]).all(axis=1)

        uniq_sets = [
            self._resolve_key(rep[qi], R, paired, do_union)
            for qi in range(rep.shape[0])
        ]
        read_uidx = inverse.copy()
        if not exact.all():
            for r in np.flatnonzero(~exact):
                read_uidx[r] = len(uniq_sets)
                uniq_sets.append(self._resolve_key(keys[r], R, paired, do_union))
        return read_uidx, uniq_sets

    def resolve_batch_hashed(
        self,
        h128: np.ndarray,
        fetch_exemplars,
        R: int,
        paired: bool,
        do_union: bool = False,
    ) -> Tuple[np.ndarray, List[Optional[np.ndarray]]]:
        """Resolve a batch from device-computed 128-bit key hashes.

        Only 16 bytes/read cross the device->host link; the full row lists
        of first-seen keys are fetched via `fetch_exemplars(read_indices) ->
        key matrix [n, 2R+1 or R+1]` (a device-side gather).  Returns
        (read_uidx, uniq_sets) like resolve_batch.
        """
        hv = np.ascontiguousarray(h128).reshape(-1, 2)
        struct = hv.view([("a", "<i8"), ("b", "<i8")]).reshape(-1)
        uniq, first_idx, inverse = np.unique(
            struct, return_index=True, return_inverse=True
        )
        raw = uniq.tobytes()
        hkeys = [raw[16 * i : 16 * (i + 1)] for i in range(uniq.shape[0])]
        new_q = [qi for qi, kb in enumerate(hkeys) if kb not in self._hash_cache]
        if new_q:
            keys = fetch_exemplars(first_idx[new_q])
            for j, qi in enumerate(new_q):
                self._hash_cache[hkeys[qi]] = self._resolve_key(
                    keys[j], R, paired, do_union
                )
        uniq_sets = [self._hash_cache[kb] for kb in hkeys]
        return inverse.reshape(-1).copy(), uniq_sets

    def process_compact(
        self,
        uniq_h: np.ndarray,     # [K, 2] int64
        occ: np.ndarray,        # [K] int32
        first_idx: np.ndarray,  # [K] int32
        fetch_exemplars,
        R: int,
        paired: bool,
        do_union: bool = False,
    ) -> None:
        """Count a batch from its device-side key histogram (CompactKeys).

        EC ids are assigned in first-occurrence read order, identical to the
        per-read path.  Used on the hot path once flens collection is done
        and no per-read filters are active.
        """
        valid = np.flatnonzero(occ > 0)
        order = valid[np.argsort(first_idx[valid], kind="stable")]
        h = np.ascontiguousarray(uniq_h[order])
        vals, found = self._ec_cache.lookup(h)
        new_pos = np.flatnonzero(~found)
        if new_pos.size:
            # first-seen keys only: resolve from fetched exemplars, in read
            # order (EC ids are assigned first-seen, like the reference's
            # single-threaded ecmapinv updates)
            keys = fetch_exemplars(first_idx[order[new_pos]])
            newvals = np.empty(new_pos.shape[0], np.int64)
            for j in range(new_pos.shape[0]):
                u = self._resolve_key(keys[j], R, paired, do_union)
                newvals[j] = self.ec_id_for(u) if u is not None else -1
            self._ec_cache.insert(h[new_pos], newvals)
            vals = vals.copy()
            vals[new_pos] = newvals
        occ_o = occ[order].astype(np.int64)
        m = vals >= 0
        self.counts.add_at(vals[m], occ_o[m])
        self.num_mapped += int(occ_o[m].sum())

    def process_compact_parts(
        self,
        parts,
        paired: bool,
        do_union: bool = False,
        return_key_ecs: bool = False,
    ):
        """Count a batch from MULTIPLE key histograms sharing one read-index
        space (host wave-1 keys + device wave-2 keys; see ops/hostprobe.py).

        parts: list of (uniq_h [K,2] int64, occ, first_idx -- GLOBAL read
        indices -- , exemplar_of, R) where exemplar_of(sel) -> [len(sel), W]
        int32 returns key content for positions `sel` into that part's own
        arrays and R is that part's per-mate row width (host wave-1 keys
        use R=16, device wave-2 keys may use a wider row budget).  Keys are
        processed in global first-occurrence order, so EC numbering matches
        the single-stream per-read path exactly; the parts' key hashes live
        in disjoint namespaces (host vs device hash constants), so
        cross-part collisions cannot merge keys.
        """
        sizes = [p[0].shape[0] for p in parts]
        parts = [p for p in parts if p[0].shape[0]]
        if not parts:
            return [np.empty(0, np.int64)] * len(sizes) if return_key_ecs \
                else None
        hs = np.concatenate([np.ascontiguousarray(p[0]) for p in parts])
        occ = np.concatenate([np.asarray(p[1], np.int64) for p in parts])
        first = np.concatenate([np.asarray(p[2], np.int64) for p in parts])
        pid = np.concatenate(
            [np.full(p[0].shape[0], i, np.int32) for i, p in enumerate(parts)]
        )
        loc = np.concatenate(
            [np.arange(p[0].shape[0], dtype=np.int64) for p in parts]
        )
        order = np.argsort(first, kind="stable")
        h = np.ascontiguousarray(hs[order])
        vals, found = self._ec_cache.lookup(h)
        new_pos = np.flatnonzero(~found)
        if new_pos.size:
            sel = order[new_pos]
            n_new = new_pos.shape[0]
            # vectorizable layer: at human scale nearly every key is NEW
            # and carries <=1 EC row per mate, so per-key python
            # resolution dominated the run.  When a part provides a SLIM
            # fetch (first two rows per mate + flags; 20 B/key instead of
            # the full exemplar) and no postfilter/special mode is active,
            # single-row keys resolve through bulk numpy + dict lookups;
            # only multi-row keys pay the full fetch + python resolver.
            fast_ok = (
                paired and not do_union and self.compact_postfilter is None
                and not self.use_shade and not self.dfk_onlist
                and not self.has_offlist
            )
            slim = np.zeros((n_new, 5), np.int64)
            have_slim = np.zeros(n_new, bool)
            fetched: Dict[int, np.ndarray] = {}
            r_of: Dict[int, int] = {}
            for i, p in enumerate(parts):
                m = np.flatnonzero(pid[sel] == i)
                if not m.size:
                    continue
                fslim = p[5] if len(p) > 5 else None
                if fast_ok and fslim is not None:
                    slim[m] = fslim(loc[sel[m]])
                    have_slim[m] = True
                else:
                    ex = p[3](loc[sel[m]])
                    for j, row in zip(m, ex):
                        fetched[int(j)] = row
                        r_of[int(j)] = p[4]
            simple = (
                have_slim & (slim[:, 1] == INT32_MAX)
                & (slim[:, 3] == INT32_MAX)
            )
            # non-simple slim keys need the full exemplar after all
            for i, p in enumerate(parts):
                m = np.flatnonzero((pid[sel] == i) & have_slim & ~simple)
                if m.size:
                    ex = p[3](loc[sel[m]])
                    for j, row in zip(m, ex):
                        fetched[int(j)] = row
                        r_of[int(j)] = p[4]
            # classify simple keys: kind 0 = unmapped/vetoed, 1 = one
            # index row (shared row, or one mate hit), 2 = two-row
            # intersection (the non-strict pairing rules of
            # MinCollector::intersectKmers reduced to the <=1-row case)
            a, b, fl = slim[:, 0], slim[:, 2], slim[:, 4]
            va = a != INT32_MAX
            vb = b != INT32_MAX
            kind = np.zeros(n_new, np.int8)
            ia = np.where(va, a, 0).astype(np.int64)
            ib = np.where(vb, b, 0).astype(np.int64)
            m1 = simple & (fl == 1) & va
            m2 = simple & (fl == 2) & vb
            mb = simple & (fl == 3) & va & vb
            kind[m1] = 1
            kind[m2] = 1
            ia[m2] = b[m2]
            kind[mb & (a == b)] = 1
            kind[mb & (a != b)] = 2
            row_ec = self._row_ec
            combo_ec = self._combo_ec
            newvals = np.empty(n_new, np.int64)
            for j in range(n_new):
                if simple[j]:
                    kj = kind[j]
                    if kj == 0:
                        newvals[j] = -1
                        continue
                    if kj == 1:
                        key = int(ia[j])
                        e = row_ec.get(key)
                        if e is None:
                            e = self.ec_id_for(self._row(key))
                            row_ec[key] = e
                    else:
                        key2 = (int(ia[j]), int(ib[j]))
                        e = combo_ec.get(key2)
                        if e is None:
                            u = _intersect_sorted(
                                self._row(key2[0]), self._row(key2[1])
                            )
                            e = self.ec_id_for(u) if u.shape[0] else -1
                            combo_ec[key2] = e
                    newvals[j] = e
                    continue
                u = self._resolve_key(
                    fetched[j], r_of[j], paired, do_union
                )
                newvals[j] = self.ec_id_for(u) if u is not None else -1
            self._ec_cache.insert(h[new_pos], newvals)
            vals = vals.copy()
            vals[new_pos] = newvals
        occ_o = occ[order]
        m = vals >= 0
        self.counts.add_at(vals[m], occ_o[m])
        self.num_mapped += int(occ_o[m].sum())
        if return_key_ecs:
            # per-key EC ids back in concatenated-part order, split to the
            # CALLER's part list (empty parts get empty vectors) -- the
            # pseudobam fast path maps each read's key slot to its EC
            out = np.empty(vals.shape[0], np.int64)
            out[order] = vals
            res = []
            off = 0
            for n in sizes:
                res.append(out[off : off + n])
                off += n
            return res

    def count_batch(
        self,
        final_idx: np.ndarray,
        final_sets: List[Optional[np.ndarray]],
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Count one batch of resolved reads (in read order).

        final_idx: [B] per-read index into final_sets (entries mapping to
        None are unmapped).  Assigns EC ids to new transcript sets at their
        first counted read, in read order, then accumulates counts.
        Returns (read_ec [B] with -1 for unmapped, read_card [B]).
        """
        uniq_f, first_idx, inv_f = np.unique(
            final_idx, return_index=True, return_inverse=True
        )
        occ = np.bincount(inv_f, minlength=uniq_f.shape[0])
        ec_of = np.full(uniq_f.shape[0], -1, np.int64)
        card_of = np.zeros(uniq_f.shape[0], np.int64)
        for qi in np.argsort(first_idx, kind="stable"):
            s = final_sets[int(uniq_f[qi])]
            if s is None or s.shape[0] == 0:
                continue
            ec = self.ec_id_for(s)
            self.counts[ec] += int(occ[qi])
            self.num_mapped += int(occ[qi])
            ec_of[qi] = ec
            card_of[qi] = s.shape[0]
        return ec_of[inv_f], card_of[inv_f]

    # -- outputs ---------------------------------------------------------

    def counts_array(self) -> np.ndarray:
        return self.counts.array()

    def num_unique_reads(self) -> int:
        c = self.counts.array()
        card = np.array([s.shape[0] for s in self.ec_sets], np.int64)
        return int(c[card == 1].sum()) if c.shape[0] else 0


def _hash_rows(keys: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit polynomial hash of each row (splitmix finalizer)."""
    h = np.full(keys.shape[0], 0x9E3779B97F4A7C15, np.uint64)
    mult = np.uint64(0x100000001B3)
    for c in range(keys.shape[1]):
        h = (h ^ keys[:, c].astype(np.uint64)) * mult
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h.view(np.int64)


def _intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two sorted unique int arrays."""
    if a.shape[0] == 0 or b.shape[0] == 0:
        return np.empty(0, a.dtype)
    if a.shape[0] > b.shape[0]:
        a, b = b, a
    idx = np.searchsorted(b, a)
    idx[idx >= b.shape[0]] = b.shape[0] - 1
    return a[b[idx] == a]
