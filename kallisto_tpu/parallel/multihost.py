"""Multi-host data parallelism: per-host file shards + deterministic
cross-host EC merge.

The reference's merge point is a writer-locked in-memory map update
(reference: MasterProcessor::update, src/ProcessReads.cpp:424-646); its
only parallelism is single-node pthreads.  The TPU-native multi-host
story (SURVEY §2.3/§5):

- `jax.distributed.initialize()` connects the hosts; each host owns its
  local chips (the in-host mesh DP of parallel/mesh.py still applies),
- input FASTQ file pairs are assigned to hosts CONTIGUOUSLY in command
  line order, so the global read order is host 0's reads, then host 1's,
  ...  (exactly the order a single process would see),
- every host pseudoaligns its shard independently and ends with a local
  (transcript-set -> count) map whose EC ids are first-seen in ITS read
  order,
- the tiny local maps are allgathered and re-merged ON EVERY HOST in
  rank order.  Because EC ids are first-seen order and the rank order
  equals the global read order, the merged map is bit-identical to the
  single-process map -- same matrix.ec, same counts, same est_counts,
- everything after the merge (EM, bootstraps, outputs) is replicated;
  rank 0 writes the output directory.
"""

import pickle
from typing import List, Tuple

import numpy as np


def shard_files(files: List[str], paired: bool, process_id: int,
                num_processes: int) -> List[str]:
    """Contiguous per-host assignment of files (pairs stay together)."""
    step = 2 if paired else 1
    units = [files[i : i + step] for i in range(0, len(files), step)]
    per = -(-len(units) // num_processes)
    mine = units[process_id * per : (process_id + 1) * per]
    return [f for u in mine for f in u]


def allgather_bytes(payload: bytes) -> List[bytes]:
    """Allgather variable-length byte strings over jax.distributed."""
    import jax
    from jax.experimental import multihost_utils

    arr = np.frombuffer(payload, np.uint8)
    n = np.array([arr.shape[0]], np.int64)
    lens = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    m = int(lens.max())
    pad = np.zeros(m, np.uint8)
    pad[: arr.shape[0]] = arr
    all_p = np.asarray(multihost_utils.process_allgather(pad))
    all_p = all_p.reshape(jax.process_count(), m)
    return [bytes(all_p[i, : lens[i]]) for i in range(all_p.shape[0])]


def merge_host_ec_maps(
    ec_sets: List[np.ndarray], counts: np.ndarray
) -> Tuple[List[np.ndarray], np.ndarray]:
    """Allgather per-host (set, count) maps; merge in rank order.

    Returns the merged (ec_sets, counts), identical on every host and
    bit-identical to a single-process run over the concatenated inputs.
    """
    local = [(s.astype(np.int32), int(c)) for s, c in zip(ec_sets, counts)]
    blobs = allgather_bytes(pickle.dumps(local))
    merged: dict = {}
    order: List[np.ndarray] = []
    out_counts: List[int] = []
    for blob in blobs:
        for s, c in pickle.loads(blob):
            kb = s.tobytes()
            ec = merged.get(kb)
            if ec is None:
                ec = len(order)
                merged[kb] = ec
                order.append(s)
                out_counts.append(0)
            out_counts[ec] += c
    return order, np.array(out_counts, np.int64)
