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
from lego_loam_tpu.ops.lin3 import eigvalsh3, principal_axis3
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


def plane_information(q, match, dst, dst_valid,
                      query_tile: int = 0, nn_backend: str = "auto"):
    """Translational point-to-plane information matrix of an alignment.

    q: (N, 3) source points already placed at the converged pose; match:
    (N,) bool valid-correspondence mask.  For each matched point the local
    target surface normal is estimated from its 5-NN in dst (covariance
    smallest-eigvec), and the 3x3 matrix sum_k m_k n_k n_k^T is returned.

    A point-to-POINT ICP fit (icp_align) is always translationally "stiff"
    at frozen correspondences, so its own Hessian cannot express surface
    slip; the point-to-plane form can: translating along a smooth corridor
    axis keeps every n.(q-p) residual unchanged, so that direction
    contributes ~0 here.  Callers compare the eigenvalue spread of the
    returned matrix to detect such unobservable alignments (the aperture
    problem that makes the reference's fitness-only loop acceptance,
    mapOptmization.cpp:904, unsafe in self-similar geometry).
    """
    idx, _ = knn(q, dst, dst_valid, 5, query_tile, backend=nn_backend)
    nbrs = dst[idx]                                   # (N, 5, 3)
    c = jnp.mean(nbrs, axis=1)
    X = nbrs - c[:, None, :]
    cov = jnp.einsum("nki,nkj->nij", X, X) / nbrs.shape[1]
    lam = eigvalsh3(cov)                              # ascending
    # smallest-eigenvalue eigenvector of cov == largest of (tr(cov) I - cov)
    tr = (lam[:, 0] + lam[:, 1] + lam[:, 2])[:, None]
    B = tr[..., None] * jnp.eye(3, dtype=cov.dtype) - cov
    lamB = jnp.stack([tr[:, 0] - lam[:, 2], tr[:, 0] - lam[:, 1],
                      tr[:, 0] - lam[:, 0]], axis=-1)
    n = principal_axis3(B, lamB)                      # (N, 3) unit normals
    # a 5-NN set that does not span a surface (isolated pole tip, padding)
    # has no meaningful normal: require the tangent spread lam[1] to
    # dominate the normal direction's lam[0]
    surf_ok = match & (lam[:, 1] > 4.0 * lam[:, 0] + 1e-8)
    w = surf_ok.astype(q.dtype)
    return jnp.einsum("n,ni,nj->ij", w, n, n)
