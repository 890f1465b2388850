"""Scan-to-scan odometry: unit pieces + synthetic-trajectory regression."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lego_loam_tpu import config_for
from lego_loam_tpu.io import synthetic as syn
from lego_loam_tpu.models import odometry as odo
from lego_loam_tpu.ops.compaction import segment_scan
from lego_loam_tpu.ops.features import extract_features
from lego_loam_tpu.ops.projection import project_scan
from lego_loam_tpu.utils.math3d import Pose, euler_to_mat, so3_log

CFG = config_for("vlp16", deskew=False)


def make_features(world, R, t, noise=0.0, seed=0):
    xyz, valid, ring = syn.raycast(
        world, R, t, CFG.sensor, noise=noise, rng=np.random.default_rng(seed))
    img = project_scan(jnp.asarray(xyz), jnp.asarray(valid), CFG, jnp.asarray(ring))
    packed, o_rel, _, _ = segment_scan(img, CFG)
    return extract_features(packed, o_rel, CFG)


def test_warp_roundtrip():
    rel = Pose(euler_to_mat(jnp.float32(0.01), jnp.float32(-0.02), jnp.float32(0.05)),
               jnp.array([0.3, 0.1, -0.02], jnp.float32))
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(10, 3)), jnp.float32)
    s = jnp.asarray(np.random.default_rng(1).uniform(size=10), jnp.float32)
    p_start = odo.warp_to_start(rel, pts, s)
    # s=1 must equal applying rel
    p1 = odo.warp_to_start(rel, pts, jnp.ones(10))
    np.testing.assert_allclose(p1, rel.apply(pts), atol=1e-5)
    # warp_to_end at s=1 is identity
    p_end = odo.warp_to_end(rel, pts, jnp.ones(10))
    np.testing.assert_allclose(p_end, pts, atol=1e-5)
    # s=0: start warp is identity, end warp applies rel^-1
    p0 = odo.warp_to_start(rel, pts, jnp.zeros(10))
    np.testing.assert_allclose(p0, pts, atol=1e-6)


def test_two_frame_motion_recovered():
    world = syn.default_world(seed=2)
    state = odo.init_state(CFG)

    R0, t0 = np.eye(3), np.array([0.0, 0.0, 1.6])
    yaw = 0.03
    R1 = np.array([[np.cos(yaw), -np.sin(yaw), 0], [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1.0]])
    t1 = t0 + np.array([0.25, 0.05, 0.01])

    f0 = make_features(world, R0, t0)
    f1 = make_features(world, R1, t1)

    state, pose, rel = odo.odometry_step(state, f0, CFG)
    np.testing.assert_allclose(np.asarray(pose.t), 0.0, atol=1e-6)  # first frame

    state, pose, rel = odo.odometry_step(state, f1, CFG)
    # true relative motion: rel = T0^-1 T1
    true_R = R0.T @ R1
    true_t = R0.T @ (t1 - t0)
    np.testing.assert_allclose(np.asarray(rel.t), true_t, atol=0.03)
    w_err = so3_log(jnp.asarray(true_R, jnp.float32).T @ rel.R)
    assert float(jnp.linalg.norm(w_err)) < 0.01  # < 0.6 deg


def test_trajectory_drift():
    """Odometry-only SLAM over a synthetic arc: bounded drift."""
    world = syn.default_world(seed=4)
    poses = syn.circle_trajectory(25, radius=10.0, arc=0.5 * np.pi)
    state = odo.init_state(CFG)

    est = []
    for k, (R, t) in enumerate(poses):
        f = make_features(world, R, t, noise=0.01, seed=k)
        state, pose, rel = odo.odometry_step(state, f, CFG)
        est.append((np.asarray(pose.R), np.asarray(pose.t)))

    # align: first estimated pose corresponds to world pose of scan 0
    R0, t0 = poses[0]
    errs = []
    for (Re, te), (Rg, tg) in zip(est, poses):
        # estimated pose is relative to scan-0 frame
        tw = R0 @ te + t0
        errs.append(np.linalg.norm(tw - tg))
    ate = np.sqrt(np.mean(np.square(errs)))
    total_len = sum(
        np.linalg.norm(poses[i + 1][1] - poses[i][1]) for i in range(len(poses) - 1))
    assert errs[-1] < 0.05 * total_len, f"final drift {errs[-1]:.3f} over {total_len:.1f} m"
    assert ate < 0.5, f"ATE {ate:.3f}"


def test_empty_features_noop():
    state = odo.init_state(CFG)
    world = syn.default_world(seed=2)
    f = make_features(world, np.eye(3), np.array([0.0, 0.0, 1.6]))
    state, _, _ = odo.odometry_step(state, f, CFG)
    # feed an empty feature set: pose advances by the constant-velocity seed
    from lego_loam_tpu.types import ScanFeatures, empty_feature_cloud

    empty = ScanFeatures(
        sharp=empty_feature_cloud(CFG.max_sharp),
        less_sharp=empty_feature_cloud(CFG.max_less_sharp),
        flat=empty_feature_cloud(CFG.max_flat),
        less_flat=empty_feature_cloud((CFG.max_less_flat // CFG.sensor.n_scan) * CFG.sensor.n_scan),
        outlier=empty_feature_cloud(CFG.max_outlier),
    )
    prev_rel = state.rel
    state2, pose, rel = odo.odometry_step(state, empty, CFG)
    np.testing.assert_allclose(np.asarray(rel.t), np.asarray(prev_rel.t), atol=1e-6)
    assert np.all(np.isfinite(np.asarray(pose.t)))
