"""Voxel-grid downsampling (PCL VoxelGrid replacement).

The reference instantiates eight pcl::VoxelGrid filters
(reference: featureAssociation.cpp:225, mapOptmization.cpp:249-257); each
keeps the centroid of the points in every occupied leaf.  Same semantics
here, fixed-shape: sort by quantized voxel key, segment-mean, compact the
group leaders into a padded output.

TPU notes: the sort is ONE multi-operand ``lax.sort`` carrying the payload
columns along (a 4-key ``jnp.lexsort`` + post-gathers costs 4 stable sorts
plus 5 gathers at 100k+ points — the dominant cost of local-map assembly).
The primary key is a murmur-mixed hash of the voxel id, so the out_cap
truncation drops a pseudo-random subset of voxels instead of a spatially
coherent slab; the two secondary keys pack the exact quantized coordinates
(20 bits per axis), so voxel identity is exact — no hash-collision merges.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _fmix32(h: jnp.ndarray) -> jnp.ndarray:
    """Murmur3 finalizer: breaks the linear structure of combined keys.
    A linear hash (XOR of per-axis products) collides systematically on
    sign/reflection-symmetric voxel ids — real point clouds straddle the
    sensor origin, so those ids co-occur constantly."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _voxel_keys(xyz: jnp.ndarray, valid: jnp.ndarray, leaf: float,
                cls: jnp.ndarray | None = None):
    """Sort keys for floor(xyz / leaf): (hash, exact-id lo, exact-id hi).

    The hash orders voxels pseudo-randomly (drop order under out_cap); the
    two exact keys pack 20 bits per axis, injective for |q| < 2^19 leaves
    (~100 km extent at 0.2 m) — voxel identity never collides.  Invalid rows
    sort last (all keys maxed).

    `cls` (optional bool): points with different class never share a voxel
    (the class offsets the quantized z far outside the scene extent, so a
    leaf straddling a class boundary — e.g. the ground/wall-base transition
    — splits instead of producing a centroid lying off BOTH surfaces).
    Injectivity then needs |q_z| < 2^17 (~26 km at 0.2 m).
    """
    big = jnp.int32(2**30)
    q = jnp.floor(xyz / leaf).astype(jnp.int32)
    if cls is not None:
        q = q.at[:, 2].add(jnp.where(cls, jnp.int32(1 << 18), jnp.int32(0)))
    qu = q.astype(jnp.uint32)
    mixed = ((qu[:, 0] * jnp.uint32(0x9E3779B1) + qu[:, 1])
             * jnp.uint32(0x85EBCA77) + qu[:, 2])
    h = (_fmix32(mixed) & jnp.uint32((1 << 30) - 1)).astype(jnp.int32)
    m20 = jnp.uint32((1 << 20) - 1)
    m10 = jnp.uint32((1 << 10) - 1)
    k1 = (((qu[:, 0] & m20) << 10) | (qu[:, 1] & m10)).astype(jnp.int32)
    k2 = ((((qu[:, 1] >> 10) & m10) << 20) | (qu[:, 2] & m20)).astype(jnp.int32)
    h = jnp.where(valid, h, big)
    k1 = jnp.where(valid, k1, big)
    k2 = jnp.where(valid, k2, big)
    return h, k1, k2


def voxel_downsample(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    leaf: float,
    out_cap: int,
    aux: jnp.ndarray | None = None,
    cls: jnp.ndarray | None = None,
):
    """Centroid-per-voxel downsample of a padded point set.

    Args:
      xyz: (N, 3) float32.
      valid: (N,) bool.
      leaf: voxel edge length (static).
      out_cap: output capacity (static).  Extra voxels beyond out_cap are
        dropped deterministically; because the sort key is a hash of the
        voxel id, the dropped excess is pseudo-random across space rather
        than a spatially coherent slab.
      aux: optional (N, K) extra per-point features, averaged per voxel.
      cls: optional (N,) bool class; differing-class points never merge
        into one centroid (see _voxel_keys).

    Returns (xyz_out (out_cap, 3), valid_out (out_cap,)) or
    (xyz_out, aux_out, valid_out) when aux is given.
    """
    n = xyz.shape[0]
    h, k1, k2 = _voxel_keys(xyz, valid, leaf, cls)

    ops = [h, k1, k2, xyz[:, 0], xyz[:, 1], xyz[:, 2],
           valid.astype(jnp.float32)]
    n_aux = 0
    if aux is not None:
        n_aux = aux.shape[1]
        ops += [aux[:, k] for k in range(n_aux)]
    sorted_ops = jax.lax.sort(tuple(ops), dimension=0, num_keys=3)
    s1, s2 = sorted_ops[1], sorted_ops[2]   # exact voxel-id keys
    sxyz = jnp.stack(sorted_ops[3:6], axis=1)
    sv = sorted_ops[6] > 0.5

    new_group = jnp.concatenate([
        jnp.ones((1,), bool),
        (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1]),
    ])
    gid = jnp.cumsum(new_group.astype(jnp.int32)) - 1

    # gid ascends (it is a cumsum over the sorted keys): declaring it sorted
    # lets the scatter-adds take the sorted fast path.  (A scatter-free
    # Hillis-Steele segmented suffix scan was measured at 1.8x the scatter
    # cost here: power-of-two rolls along the lane axis lower to unaligned
    # slices that cost far more than their bandwidth.)
    counts = jax.ops.segment_sum(sv.astype(jnp.float32), gid, num_segments=n,
                                 indices_are_sorted=True)
    sums = jax.ops.segment_sum(
        jnp.where(sv[:, None], sxyz, 0.0), gid, num_segments=n,
        indices_are_sorted=True,
    )
    centroids = sums / jnp.maximum(counts[:, None], 1.0)

    n_groups = jnp.max(jnp.where(sv, gid + 1, 0))
    slot = jnp.arange(out_cap, dtype=jnp.int32)
    valid_out = slot < jnp.minimum(n_groups, out_cap)
    xyz_out = jnp.where(valid_out[:, None], centroids[slot], 0.0)

    if aux is None:
        return xyz_out, valid_out
    saux = jnp.stack(sorted_ops[7:7 + n_aux], axis=1)
    aux_sums = jax.ops.segment_sum(
        jnp.where(sv[:, None], saux, 0.0), gid, num_segments=n,
        indices_are_sorted=True,
    )
    aux_out = aux_sums / jnp.maximum(counts[:, None], 1.0)
    aux_out = jnp.where(valid_out[:, None], aux_out[slot], 0.0)
    return xyz_out, aux_out, valid_out
