"""Voxel-grid downsampling (PCL VoxelGrid replacement).

The reference instantiates eight pcl::VoxelGrid filters
(reference: featureAssociation.cpp:225, mapOptmization.cpp:249-257); each
keeps the centroid of the points in every occupied leaf.  Same semantics
here, fixed-shape: sort by quantized voxel key, segment-mean, compact the
group leaders into a padded output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def voxel_downsample(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    leaf: float,
    out_cap: int,
    aux: jnp.ndarray | None = None,
):
    """Centroid-per-voxel downsample of a padded point set.

    Args:
      xyz: (N, 3) float32.
      valid: (N,) bool.
      leaf: voxel edge length (static).
      out_cap: output capacity (static).  Extra voxels beyond out_cap are
        dropped deterministically (largest keys first).
      aux: optional (N, K) extra per-point features, averaged per voxel.

    Returns (xyz_out (out_cap, 3), valid_out (out_cap,)) or
    (xyz_out, aux_out, valid_out) when aux is given.
    """
    n = xyz.shape[0]
    big = jnp.int32(2**30)
    q = jnp.floor(xyz / leaf).astype(jnp.int32)
    qx = jnp.where(valid, q[:, 0], big)
    qy = jnp.where(valid, q[:, 1], big)
    qz = jnp.where(valid, q[:, 2], big)
    # Primary sort key: a hash of the voxel id.  A lexicographic primary key
    # would make the out_cap truncation drop a spatially coherent slab (e.g.
    # all the highest-z voxels); hash order makes the dropped excess
    # pseudo-random across space.  Invalid rows sort strictly last.
    h = (q[:, 0] * jnp.int32(73856093)
         ^ q[:, 1] * jnp.int32(19349663)
         ^ q[:, 2] * jnp.int32(83492791)) & jnp.int32((1 << 30) - 1)
    h = jnp.where(valid, h, big)

    # lexsort: last key is primary
    order = jnp.lexsort((qx, qy, qz, h))
    sx, sy, sz = qx[order], qy[order], qz[order]
    sv = valid[order]
    sxyz = xyz[order]

    new_group = jnp.concatenate([
        jnp.ones((1,), bool),
        (sx[1:] != sx[:-1]) | (sy[1:] != sy[:-1]) | (sz[1:] != sz[:-1]),
    ])
    gid = jnp.cumsum(new_group.astype(jnp.int32)) - 1

    counts = jax.ops.segment_sum(sv.astype(jnp.float32), gid, num_segments=n)
    sums = jax.ops.segment_sum(
        jnp.where(sv[:, None], sxyz, 0.0), gid, num_segments=n
    )
    centroids = sums / jnp.maximum(counts[:, None], 1.0)

    n_groups = jnp.max(jnp.where(sv, gid + 1, 0))
    slot = jnp.arange(out_cap, dtype=jnp.int32)
    valid_out = slot < jnp.minimum(n_groups, out_cap)
    xyz_out = jnp.where(valid_out[:, None], centroids[slot], 0.0)

    if aux is None:
        return xyz_out, valid_out
    saux = aux[order]
    aux_sums = jax.ops.segment_sum(
        jnp.where(sv[:, None], saux, 0.0), gid, num_segments=n
    )
    aux_out = aux_sums / jnp.maximum(counts[:, None], 1.0)
    aux_out = jnp.where(valid_out[:, None], aux_out[slot], 0.0)
    return xyz_out, aux_out, valid_out
