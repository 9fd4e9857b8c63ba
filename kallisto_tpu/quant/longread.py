"""Long-read (--long) EC resolution: strict intersection with mode fallback.

reference: MinCollector::modeKmers / modeECs (src/MinCollector.cpp:121-157,
283-355) and the long-read branches of ReadProcessor::processBuffer
(src/ProcessReads.cpp:1051-1090, 1222-1235).  A read whose exhaustive k-mer
scan leaves more than threshold*len k-mers unmapped is "novel" and excluded
from counting (written to novel.fastq).
"""

from typing import List, Optional

import numpy as np


def mode_ecs(groups: np.ndarray, resolver) -> Optional[np.ndarray]:
    """Port of MinCollector::modeECs over the ordered group EC-row list.

    groups: int32 row ids in hit order (-1 = empty/wildcard EC group).
    Returns the winning EC content (sorted transcript ids) or None.
    State machine transcribed verbatim (including its quirks: the mode is
    only promoted when the *next* distinct EC is a singleton or the
    current candidate is flagged multi-mapping).
    """
    n = groups.shape[0]
    if n == 0:
        return None
    # content equality == row-id equality (rows are content-deduplicated)
    mode = int(groups[0])
    found_nonempty = mode >= 0
    mode_multi = False
    last = mode
    mode_count = 0
    cur_count = 0
    for i in range(1, n):
        g = int(groups[i])
        if not found_nonempty:
            mode = g
            found_nonempty = g >= 0
            if found_nonempty and resolver._row(g).shape[0] == 1:
                mode_multi = True
        # every element here is already a distinct group boundary
        if g == last and g >= 0:
            cur_count += 1
        if g != last and g >= 0:
            card = resolver._row(g).shape[0]
            if cur_count > mode_count and (card == 1 or mode_multi):
                if card == 1:
                    mode_multi = False
                mode = last
                mode_count = cur_count
            cur_count = 0
            last = g
    if mode_count > 0 and mode >= 0:
        return resolver._row(mode)
    return None


def resolve_long_batch(
    rows: np.ndarray,        # [B, R] sorted distinct rows (INT32_MAX pad)
    groups: np.ndarray,      # [B, G] ordered group rows (-2 pad)
    n_groups: np.ndarray,    # [B]
    resolver,                # unmasked EcResolver (mask_offlist=False)
    num_onlist: int,
) -> List[Optional[np.ndarray]]:
    """Per-read EC sets: intersect distinct rows; empty -> modeECs fallback;
    then the on-list mask (reference: modeKmers + ProcessReads.cpp:1072)."""
    INT32_MAX = np.int32(2**31 - 1)
    B = rows.shape[0]
    out: List[Optional[np.ndarray]] = []
    for r in range(B):
        rr = rows[r]
        rr = rr[rr != INT32_MAX]
        u = resolver._intersect_rows(rr) if rr.shape[0] else np.empty(0, np.int32)
        if u.shape[0] == 0:
            g = groups[r, : n_groups[r]]
            g = g[g != -2]
            m = mode_ecs(g, resolver)
            u = m if m is not None else np.empty(0, np.int32)
        u = u[u < num_onlist]
        out.append(u if u.shape[0] else None)
    return out
