"""Map-sharded nearest-neighbor search over a device mesh.

The local map (the large array in scan-to-map association) shards across
devices; queries replicate.  Each device computes k-NN against its map shard
on its own MXU, then the per-shard candidates are all-gathered over ICI and
reduced to the global k — the distance matrix never materializes on one
chip.  This is the map-block partitioning of BASELINE.json's multi-host
configuration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from lego_loam_tpu.ops.knn import knn
from lego_loam_tpu.utils.precision import f32_matmuls


def knn_sharded(query, map_pts, map_valid, k: int, mesh: Mesh,
                axis: str = "map", query_tile: int = 0,
                backend: str = "xla"):
    """Global k-NN with the reference set sharded along `axis`.

    query: (Q, 3) replicated.  map_pts: (M, 3), M divisible by mesh[axis].
    Returns (idx (Q, k) into the global map array, d2 (Q, k)).
    backend: per-shard search backend (see ops/knn.knn) — "pallas" runs the
    fused VMEM kernel on each device's shard.
    """
    n_dev = mesh.shape[axis]
    M = map_pts.shape[0]
    assert M % n_dev == 0, "map size must divide the mesh axis"
    shard = M // n_dev

    @jax.jit
    @f32_matmuls
    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(axis), P(axis)),
             out_specs=(P(), P()),
             check_vma=False)
    def run(q, pts, val):
        li, ld2 = knn(q, pts, val, k, query_tile, backend=backend)
        gi = li + jax.lax.axis_index(axis) * shard
        # gather all shards' candidates and reduce to the global k
        ai = jax.lax.all_gather(gi, axis)          # (n_dev, Q, k)
        ad = jax.lax.all_gather(ld2, axis)
        ai = jnp.moveaxis(ai, 0, 1).reshape(q.shape[0], -1)
        ad = jnp.moveaxis(ad, 0, 1).reshape(q.shape[0], -1)
        nd2, sel = jax.lax.top_k(-ad, k)
        idx = jnp.take_along_axis(ai, sel, axis=1)
        return idx.astype(jnp.int32), -nd2

    return run(query, map_pts, map_valid)
