"""Closed-form 3x3 linear algebra vs numpy/LAPACK."""

import jax.numpy as jnp
import numpy as np

from lego_loam_tpu.ops.lin3 import eigvalsh3, principal_axis3, solve3


def _rand_sym(rng, n, scale=1.0):
    X = rng.normal(size=(n, 5, 3)).astype(np.float32) * scale
    return np.einsum("nki,nkj->nij", X, X) / 5.0


def test_solve3_matches_numpy():
    rng = np.random.default_rng(0)
    A = _rand_sym(rng, 256) + 1e-3 * np.eye(3, dtype=np.float32)
    b = rng.normal(size=(256, 3)).astype(np.float32)
    x = np.asarray(solve3(jnp.asarray(A), jnp.asarray(b)))
    x_ref = np.linalg.solve(
        A.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(x, x_ref, rtol=2e-3, atol=2e-3)


def test_eigvalsh3_matches_numpy():
    rng = np.random.default_rng(1)
    A = _rand_sym(rng, 512)
    lam = np.asarray(eigvalsh3(jnp.asarray(A)))
    lam_ref = np.linalg.eigvalsh(A.astype(np.float64))
    assert np.all(np.diff(lam, axis=1) >= -1e-5)  # ascending
    np.testing.assert_allclose(lam, lam_ref, rtol=5e-4, atol=5e-5)


def test_eigvalsh3_isotropic_and_rank1():
    # A = qI (p == 0 branch) and rank-1 (degenerate pair at 0)
    A = np.stack([
        2.5 * np.eye(3, dtype=np.float32),
        np.outer([1.0, 2.0, 3.0], [1.0, 2.0, 3.0]).astype(np.float32),
    ])
    lam = np.asarray(eigvalsh3(jnp.asarray(A)))
    np.testing.assert_allclose(lam[0], [2.5, 2.5, 2.5], atol=1e-6)
    # float32 closed form: error scales with the spectral radius (~1e-4 rel)
    np.testing.assert_allclose(lam[1], [0.0, 0.0, 14.0], atol=5e-3)


def test_principal_axis3_matches_numpy():
    rng = np.random.default_rng(2)
    # anisotropic sets: stretch along a random direction so the top
    # eigenvalue is well separated (the regime the line fit consumes)
    n = 256
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    t = rng.normal(size=(n, 5, 1)) * 2.0
    pts = t * dirs[:, None, :] + 0.05 * rng.normal(size=(n, 5, 3))
    pts = pts.astype(np.float32)
    c = pts.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", pts - c, pts - c) / 5.0

    lam = eigvalsh3(jnp.asarray(cov))
    v = np.asarray(principal_axis3(jnp.asarray(cov), lam))
    w_ref, V_ref = np.linalg.eigh(cov.astype(np.float64))
    v_ref = V_ref[:, :, 2]
    # sign-agnostic alignment
    dots = np.abs(np.sum(v * v_ref, axis=1))
    assert np.all(dots > 1.0 - 1e-4)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)


def test_principal_axis3_degenerate_stays_finite():
    A = np.stack([
        np.eye(3, dtype=np.float32),            # fully degenerate
        np.diag([1.0, 1.0, 0.0]).astype(np.float32),  # top pair degenerate
    ])
    lam = eigvalsh3(jnp.asarray(A))
    v = np.asarray(principal_axis3(jnp.asarray(A), lam))
    assert np.all(np.isfinite(v))
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)
