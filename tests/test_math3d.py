import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lego_loam_tpu.utils import math3d as m3


def rand_rot(rng):
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * rng.uniform(0.01, 3.0)
    return np.asarray(m3.so3_exp(jnp.asarray(w, jnp.float32)))


def test_euler_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        roll, pitch, yaw = rng.uniform(-1.4, 1.4, size=3)
        R = m3.euler_to_mat(jnp.float32(roll), jnp.float32(pitch), jnp.float32(yaw))
        r2, p2, y2 = m3.mat_to_euler(R)
        np.testing.assert_allclose([r2, p2, y2], [roll, pitch, yaw], atol=3e-5)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(30):
        R = rand_rot(rng)
        w = m3.so3_log(jnp.asarray(R))
        R2 = m3.so3_exp(w)
        np.testing.assert_allclose(R2, R, atol=3e-5)


def test_exp_log_small_and_pi():
    # near-zero
    w = jnp.array([1e-8, -2e-8, 3e-8], jnp.float32)
    np.testing.assert_allclose(m3.so3_exp(w), np.eye(3), atol=1e-6)
    # near pi about an arbitrary axis
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    w = jnp.asarray(axis * (np.pi - 1e-4), jnp.float32)
    R = m3.so3_exp(w)
    w2 = m3.so3_log(R)
    np.testing.assert_allclose(m3.so3_exp(w2), R, atol=1e-4)


def test_pose_compose_inverse():
    rng = np.random.default_rng(2)
    Ra, Rb = rand_rot(rng), rand_rot(rng)
    ta, tb = rng.normal(size=3).astype(np.float32), rng.normal(size=3).astype(np.float32)
    a = m3.Pose(jnp.asarray(Ra), jnp.asarray(ta))
    b = m3.Pose(jnp.asarray(Rb), jnp.asarray(tb))
    ab = a.compose(b)
    pts = jnp.asarray(rng.normal(size=(7, 3)), jnp.float32)
    np.testing.assert_allclose(ab.apply(pts), a.apply(b.apply(pts)), atol=3e-5)
    ident = a.compose(a.inverse())
    np.testing.assert_allclose(ident.R, np.eye(3), atol=3e-5)
    np.testing.assert_allclose(ident.t, 0, atol=3e-5)


def test_pose_interp_endpoints():
    rng = np.random.default_rng(3)
    R = rand_rot(rng)
    t = rng.normal(size=3).astype(np.float32)
    p = m3.Pose(jnp.asarray(R), jnp.asarray(t))
    p0 = m3.pose_interp(p, jnp.float32(0.0))
    p1 = m3.pose_interp(p, jnp.float32(1.0))
    np.testing.assert_allclose(p0.R, np.eye(3), atol=3e-5)
    np.testing.assert_allclose(p0.t, 0, atol=1e-6)
    np.testing.assert_allclose(p1.R, R, atol=3e-5)
    np.testing.assert_allclose(p1.t, t, atol=1e-6)
    # half-way rotation composes with itself to the full rotation
    ph = m3.pose_interp(p, jnp.float32(0.5))
    np.testing.assert_allclose(ph.R @ ph.R, R, atol=3e-5)


def test_batched_ops():
    rng = np.random.default_rng(4)
    Rs = jnp.asarray(np.stack([rand_rot(rng) for _ in range(5)]))
    ws = m3.so3_log(Rs)
    assert ws.shape == (5, 3)
    np.testing.assert_allclose(m3.so3_exp(ws), Rs, atol=3e-5)


def test_jit_and_devices():
    # sanity: 8 virtual CPU devices are live for the mesh tests
    assert len(jax.devices()) == 8
    f = jax.jit(lambda w: m3.so3_log(m3.so3_exp(w)))
    w = jnp.array([0.1, -0.2, 0.3], jnp.float32)
    np.testing.assert_allclose(f(w), w, atol=1e-6)


def test_config_hashable_static():
    from lego_loam_tpu import config_for

    cfg = config_for("vlp16")
    assert hash(cfg) == hash(config_for("vlp16"))
    cfg2 = cfg.replace(edge_threshold=0.2)
    assert cfg2.edge_threshold == pytest.approx(0.2)
    assert cfg.edge_threshold == pytest.approx(0.1)
