"""Parity: fused Pallas kNN kernel vs the exact XLA path.

Runs the kernel in interpret mode on CPU (tests/conftest.py forces the CPU
platform); the distances and neighbor sets must match ops/knn.knn with
exact=True bit-for-bit up to tie ordering.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lego_loam_tpu.ops.knn import knn
from lego_loam_tpu.ops.knn_pallas import knn_pallas


def _random_cloud(rng, n, scale=20.0):
    return (rng.standard_normal((n, 3)) * scale).astype(np.float32)


@pytest.mark.parametrize("q_n,r_n,k", [(100, 300, 5), (256, 2048, 5),
                                       (70, 130, 1), (512, 513, 8)])
def test_matches_exact_xla(q_n, r_n, k):
    rng = np.random.default_rng(q_n + r_n + k)
    q = _random_cloud(rng, q_n)
    r = _random_cloud(rng, r_n)
    valid = rng.random(r_n) > 0.2

    xi, xd = knn(jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid), k,
                 exact=True)
    pi, pd = knn_pallas(jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid),
                        k, interpret=True)
    xi, xd, pi, pd = map(np.asarray, (xi, xd, pi, pd))

    n_valid = int(valid.sum())
    for row in range(q_n):
        kk = min(k, n_valid)
        # distances must agree where a true neighbor exists (both paths
        # compute qq + rr - 2 q.r in f32; allow f32 rounding slack)
        np.testing.assert_allclose(pd[row, :kk], xd[row, :kk],
                                   rtol=1e-4, atol=1e-3)
        # indices: same point set (ties may reorder equals); every returned
        # index must be a valid point whose distance matches the slot (the
        # direct |q-r|^2 form differs from qq+rr-2qr by f32 cancellation)
        d_true = np.sum((q[row] - r[pi[row, :kk]]) ** 2, axis=1)
        np.testing.assert_allclose(d_true, pd[row, :kk], rtol=1e-4, atol=1e-3)
        assert valid[pi[row, :kk]].all()
        # beyond the valid count the sentinel stays huge
        assert (pd[row, kk:] > 1e29).all()


def test_all_invalid_refs():
    rng = np.random.default_rng(0)
    q = _random_cloud(rng, 16)
    r = _random_cloud(rng, 64)
    valid = np.zeros(64, bool)
    pi, pd = knn_pallas(jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid),
                        5, interpret=True)
    assert (np.asarray(pd) > 1e29).all()


def test_duplicate_points_tie_handling():
    # many identical reference points: the k slots must fill with distinct
    # indices of equal distance, lowest indices first
    q = jnp.zeros((4, 3), jnp.float32)
    r = jnp.ones((32, 3), jnp.float32)
    valid = jnp.ones(32, bool)
    pi, pd = knn_pallas(q, r, valid, 5, interpret=True)
    pi, pd = np.asarray(pi), np.asarray(pd)
    np.testing.assert_allclose(pd, 3.0, rtol=1e-6)
    for row in range(4):
        assert sorted(pi[row].tolist()) == [0, 1, 2, 3, 4]


def test_knn_auto_backend_dispatch():
    # backend="auto" on CPU must stay on the XLA path (and agree with it)
    rng = np.random.default_rng(3)
    q = _random_cloud(rng, 32)
    r = _random_cloud(rng, 128)
    valid = np.ones(128, bool)
    ai, ad = knn(jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid), 5,
                 exact=True, backend="auto")
    xi, xd = knn(jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid), 5,
                 exact=True, backend="xla")
    np.testing.assert_array_equal(np.asarray(ai), np.asarray(xi))
    np.testing.assert_allclose(np.asarray(ad), np.asarray(xd))
