"""Multi-chip data parallelism over a `reads` mesh axis.

The reference's only parallelism is single-node pthreads over read batches
merged under a writer lock (reference: src/ProcessReads.cpp:307-646).  The
TPU-native equivalent: the index is replicated across devices, read batches
are sharded over a 1-D `reads` mesh axis, each device pseudoaligns its shard
and reduces it to an EC-row histogram, and histograms merge with psum over
ICI.  Everything after the histogram (EM, outputs) is tiny and replicated.

The host-side dynamic-EC path (quant/ecmap.py) consumes per-read row sets;
under the mesh the per-device SideResults are simply gathered back per host
shard -- the deterministic first-seen ordering is preserved because shards
are concatenated in mesh order.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pseudoalign import (
    DeviceIndex,
    lookup_kmers,
    pseudoalign_batch,
    rolling_canonical_kmers,
)


def make_mesh(n_devices: int | None = None, axis: str = "reads") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def _ec_row_histogram(didx: DeviceIndex, codes, lens, k: int, num_rows: int):
    """Per-shard histogram of EC-row hits (device-side reduction)."""
    canon, _, valid = rolling_canonical_kmers(codes, lens, k)
    idx, hit, ec = lookup_kmers(didx, canon, valid)
    row = jnp.where(hit & (ec >= 0), ec, num_rows)
    return jnp.zeros(num_rows + 1, jnp.int32).at[row.reshape(-1)].add(
        hit.reshape(-1).astype(jnp.int32)
    )


def distributed_quant_step(mesh: Mesh, didx: DeviceIndex, k: int, num_rows: int):
    """Build the jitted data-parallel step: shard reads, psum histograms,
    run one (replicated) EM-style normalization on the merged histogram.

    Returns a function (codes [B, L], lens [B]) -> (histogram [num_rows+1],
    normalized [num_rows+1]); B must divide by the mesh size.
    """
    axis = mesh.axis_names[0]

    @jax.jit
    def step(codes, lens):
        def shard_fn(didx_s, codes_s, lens_s):
            h = _ec_row_histogram(didx_s, codes_s, lens_s, k, num_rows)
            return jax.lax.psum(h, axis)

        hist = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=P(),
        )(didx, codes, lens)
        total = jnp.maximum(hist.sum(), 1)
        return hist, hist.astype(jnp.float32) / total.astype(jnp.float32)

    return step


def shard_batch(mesh: Mesh, codes: np.ndarray, lens: np.ndarray):
    """Place a host batch sharded over the reads axis."""
    axis = mesh.axis_names[0]
    s_codes = NamedSharding(mesh, P(axis))
    s_lens = NamedSharding(mesh, P(axis))
    return jax.device_put(codes, s_codes), jax.device_put(lens, s_lens)


def replicate_index(mesh: Mesh, didx: DeviceIndex) -> DeviceIndex:
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, rep), didx)
