"""Batched point-to-point ICP (PCL IterativeClosestPoint replacement).

The reference aligns loop-closure candidates with pcl::ICP (100 iterations,
max correspondence distance 100, reference: mapOptmization.cpp:892-904).
Here: fixed-iteration ICP with chunked MXU nearest-neighbor search and a
weighted Kabsch (SVD) update per iteration; fitness is PCL's score (mean
squared NN distance of the matched source points).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lego_loam_tpu.utils.precision import f32_matmuls

from lego_loam_tpu.ops.knn import knn
from lego_loam_tpu.utils.math3d import Pose


def _kabsch(src, dst, w):
    """Weighted rigid alignment src -> dst.  w: per-pair weights (N,)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * w[:, None], axis=0) / wsum
    S = ((src - mu_s) * w[:, None]).T @ (dst - mu_d)
    U, _, Vt = jnp.linalg.svd(S)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    flip = jnp.diag(jnp.array([1.0, 1.0, 1.0]).at[2].set(d))
    R = Vt.T @ flip @ U.T
    t = mu_d - R @ mu_s
    return Pose(R.astype(src.dtype), t.astype(src.dtype))


@partial(jax.jit, static_argnames=("iters", "query_tile", "nn_backend"))
@f32_matmuls
def icp_align(
    src, src_valid, dst, dst_valid, T0: Pose,
    iters: int = 30,
    max_corr_dist: float = 100.0,
    query_tile: int = 0,
    nn_backend: str = "auto",
):
    """Align src onto dst starting from T0.

    Returns (T, fitness): T maps src into dst's frame; fitness is the mean
    squared NN distance of valid matched points at the final pose (PCL
    getFitnessScore semantics).  nn_backend picks the per-iteration 1-NN
    path (ops/knn.knn); "auto" = fused Pallas kernel on TPU (the (src, dst)
    distance matrix otherwise re-materializes in HBM every iteration).
    """
    max_d2 = max_corr_dist * max_corr_dist

    def body(_, T):
        q = src @ T.R.T + T.t
        idx, d2 = knn(q, dst, dst_valid, 1, query_tile, backend=nn_backend)
        m = src_valid & (d2[:, 0] < max_d2)
        w = m.astype(src.dtype)
        upd = _kabsch(q, dst[idx[:, 0]], w)
        return upd.compose(T)

    T = jax.lax.fori_loop(0, iters, body, T0)

    q = src @ T.R.T + T.t
    idx, d2 = knn(q, dst, dst_valid, 1, query_tile, backend=nn_backend)
    m = src_valid & (d2[:, 0] < max_d2)
    n_match = jnp.sum(m)
    fitness = jnp.sum(jnp.where(m, d2[:, 0], 0.0)) / jnp.maximum(n_match, 1)
    # PCL returns +inf-like when nothing matches; a handful of matches is
    # equally meaningless and must not read as a perfect alignment
    fitness = jnp.where(n_match >= 10, fitness, 1.0e9)
    return T, fitness
