"""Multi-chip data parallelism over a `reads` mesh axis.

The reference's only parallelism is single-node pthreads over read batches
merged under a writer lock (reference: src/ProcessReads.cpp:307-646,
MasterProcessor::update merge at 424-646).  The TPU-native equivalent:

- the index is **replicated** across devices (NamedSharding P()),
- each read batch is padded to a multiple of the mesh size and **sharded
  contiguously** over a 1-D `reads` axis (shard s = reads
  [s*B/n, (s+1)*B/n) -- read order is preserved across shards),
- each device pseudoaligns its shard and reduces it to a fixed-width
  per-key histogram *locally* (shard_map; no collective needed -- the
  histogram is tiny and device-order concatenation is the deterministic
  merge),
- the host walks the shard histograms **in mesh order**, which reproduces
  the exact global first-seen key order of a single-device run, so dynamic
  EC ids (and therefore counts, matrix.ec, est_counts) are bit-identical
  to the 1-device pipeline.

Multi-host: call `jax.distributed.initialize()` before building the
MeshRunner; `make_mesh` then spans all processes' devices and each host
feeds its own contiguous file shard (the EC merge stays deterministic as
long as shard order == read order).  Everything after the EC histogram
(EM, outputs) is tiny and replicated.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pseudoalign import (
    pair_compact_core,
    single_compact_core,
)


def make_mesh(n_devices: Optional[int] = None, axis: str = "reads") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def replicate_index(mesh: Mesh, didx):
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, rep), didx)


class MeshRunner:
    """Data-parallel pseudoalignment runner used by quant/pipeline.py.

    Owns the mesh, the input shardings, and the jitted shard_map'ped
    compact-step functions (cached per static (k, L, widths) signature).
    """

    def __init__(self, n_devices: Optional[int] = None, axis: str = "reads"):
        self.mesh = make_mesh(n_devices, axis)
        self.axis = axis
        self.ndev = int(np.prod(self.mesh.devices.shape))
        self.shard = NamedSharding(self.mesh, P(axis))
        self.rep = NamedSharding(self.mesh, P())
        self._pair_fns = {}
        self._single_fns = {}

    # -- placement helpers -------------------------------------------------

    def replicate(self, didx):
        return jax.tree.map(lambda a: jax.device_put(a, self.rep), didx)

    def put_batch(self, b):
        """Pad a PackedBatch's arrays to a multiple of the mesh size and
        place them sharded over the reads axis.

        Pad reads have lens=0 (no valid k-mer window), so they pseudoalign
        to the no-hit key, which resolves to None and is never counted.
        Returns (packed, nmask, lens) device arrays; the caller remembers
        the real read count b.n.
        """
        B = b.n
        Bp = ((B + self.ndev - 1) // self.ndev) * self.ndev
        packed, nmask, lens = b.packed, b.nmask, b.lens
        if Bp != B:
            packed = np.concatenate(
                [packed, np.zeros((Bp - B, packed.shape[1]), np.uint8)]
            )
            nmask = np.concatenate(
                [nmask, np.zeros((Bp - B, nmask.shape[1]), np.uint8)]
            )
            lens = np.concatenate([lens, np.zeros(Bp - B, np.int32)])
        return (
            jax.device_put(packed, self.shard),
            jax.device_put(nmask, self.shard),
            jax.device_put(lens, self.shard),
        )

    # -- sharded compact steps ----------------------------------------------

    def _get_pair_fn(self, k: int, L: int, max_rows: int, max_keys: int,
                     min_range: int = 0, strand_key: bool = False,
                     pos_fl: int = -1, pos_depth: int = 0):
        key = (k, L, max_rows, max_keys, min_range, strand_key,
               pos_fl, pos_depth)
        f = self._pair_fns.get(key)
        if f is None:
            ax = self.axis

            def shard_fn(didx, p1, n1, l1, p2, n2, l2):
                r1, r2, ckflat = pair_compact_core(
                    didx, p1, n1, l1, p2, n2, l2, k, L, max_rows, max_keys,
                    min_range, strand_key, pos_fl, pos_depth,
                )
                # leading length-1 axis stacks per-shard histograms into
                # [ndev, K+1, 5] under out_specs P(axis)
                return r1, r2, ckflat[None]

            f = jax.jit(
                jax.shard_map(
                    shard_fn,
                    mesh=self.mesh,
                    in_specs=(P(),) + (P(ax),) * 6,
                    out_specs=(P(ax), P(ax), P(ax)),
                )
            )
            self._pair_fns[key] = f
        return f

    def _get_single_fn(self, k: int, L: int, max_rows: int, max_keys: int,
                       min_range: int = 0, strand_key: bool = False,
                       pos_fl: int = -1, pos_depth: int = 0):
        key = (k, L, max_rows, max_keys, min_range, strand_key,
               pos_fl, pos_depth)
        f = self._single_fns.get(key)
        if f is None:
            ax = self.axis

            def shard_fn(didx, p1, n1, l1):
                r1, ckflat = single_compact_core(
                    didx, p1, n1, l1, k, L, max_rows, max_keys,
                    min_range, strand_key, pos_fl, pos_depth,
                )
                return r1, ckflat[None]

            f = jax.jit(
                jax.shard_map(
                    shard_fn,
                    mesh=self.mesh,
                    in_specs=(P(),) + (P(ax),) * 3,
                    out_specs=(P(ax), P(ax)),
                )
            )
            self._single_fns[key] = f
        return f

    def pair_compact(self, didx, b1, b2, k: int, max_rows=16, max_keys=16384,
                     min_range: int = 0, strand_key: bool = False,
                     pos_fl: int = -1, pos_depth: int = 0):
        """Sharded fused pair step.  Returns (r1, r2, ckstack, shard_B):
        SideResults over the padded batch and the [ndev, K+1, 5] per-shard
        key histograms; shard_B = reads per shard (for first_idx offsets).
        min_range/strand_key/pos_* extend the keys with filter inputs (see
        ops/pseudoalign.py compact_pair_keys)."""
        p1, n1, l1 = self.put_batch(b1)
        p2, n2, l2 = self.put_batch(b2)
        f = self._get_pair_fn(k, b1.Lp, max_rows, max_keys, min_range,
                              strand_key, pos_fl, pos_depth)
        r1, r2, ckstack = f(didx, p1, n1, l1, p2, n2, l2)
        return r1, r2, ckstack, int(l1.shape[0]) // self.ndev

    def single_compact(self, didx, b1, k: int, max_rows=16, max_keys=16384,
                       min_range: int = 0, strand_key: bool = False,
                       pos_fl: int = -1, pos_depth: int = 0):
        p1, n1, l1 = self.put_batch(b1)
        f = self._get_single_fn(k, b1.Lp, max_rows, max_keys, min_range,
                                strand_key, pos_fl, pos_depth)
        r1, ckstack = f(didx, p1, n1, l1)
        return r1, ckstack, int(l1.shape[0]) // self.ndev
