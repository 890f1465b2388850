"""Degenerate-input robustness: the pipeline must never NaN or crash.

The reference's failure story is a hard shutdown on unexpected input
(imageProjection.cpp:174-177) and NaN-resets inside the solvers
(featureAssociation.cpp:1362-1365).  Here every stage is fixed-shape and
masked, so garbage in must produce finite, gated no-ops out.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lego_loam_tpu import config_for
from lego_loam_tpu.models.pipeline import LegoLoamPipeline

CFG = config_for(
    "vlp16", deskew=False,
    max_keyframes=32, max_map_corner=1024, max_map_surf=4096,
    kf_corner_cap=256, kf_surf_cap=1024, kf_outlier_cap=256,
    max_scan_corner_ds=256, max_scan_surf_ds=1024, nn_query_tile=256)

P = CFG.sensor.n_scan * CFG.sensor.horizon_scan


def _finite(pipe, res):
    assert np.isfinite(np.asarray(res.fused_pose.t)).all()
    assert np.isfinite(np.asarray(res.odom_pose.t)).all()
    assert np.isfinite(np.asarray(pipe.mstate.kf_t)).all()


def test_empty_and_sparse_scans():
    pipe = LegoLoamPipeline(CFG)
    rng = np.random.default_rng(0)
    ring = (np.arange(P) % 16).astype(np.int32)

    # all-invalid scan
    res = pipe.process_scan(np.zeros((P, 3), np.float32),
                            np.zeros(P, bool), ring)
    _finite(pipe, res)
    # a single valid point
    xyz = np.zeros((P, 3), np.float32)
    xyz[0] = [5.0, 1.0, 0.2]
    valid = np.zeros(P, bool)
    valid[0] = True
    res = pipe.process_scan(xyz, valid, ring)
    _finite(pipe, res)
    # 50 random points
    xyz = np.zeros((P, 3), np.float32)
    xyz[:50] = rng.uniform(-20, 20, (50, 3))
    valid = np.zeros(P, bool)
    valid[:50] = True
    res = pipe.process_scan(xyz, valid, ring)
    _finite(pipe, res)


def test_nan_and_extreme_points():
    pipe = LegoLoamPipeline(CFG)
    rng = np.random.default_rng(1)
    ring = (np.arange(P) % 16).astype(np.int32)

    xyz = rng.uniform(-30, 30, (P, 3)).astype(np.float32)
    xyz[::7] = np.nan          # NaNs marked invalid by the ingest path
    xyz[1::7] = 1e8            # absurd ranges get range-gated
    valid = np.ones(P, bool)
    valid[::7] = False
    xyz = np.where(valid[:, None], xyz, 0.0).astype(np.float32)
    for k in range(2):
        res = pipe.process_scan(xyz, valid, ring, t=0.1 * k)
        _finite(pipe, res)


def test_identical_repeated_scans():
    """Zero motion: the pipeline must report ~zero displacement, not drift."""
    from lego_loam_tpu.io import synthetic as syn

    world = syn.default_world(seed=2)
    xyz, valid, ring = syn.raycast(world, np.eye(3),
                                   np.array([0.0, 0.0, 1.6]), CFG.sensor)
    pipe = LegoLoamPipeline(CFG)
    for k in range(4):
        res = pipe.process_scan(xyz, valid, ring, t=0.1 * k)
        _finite(pipe, res)
    assert np.linalg.norm(np.asarray(res.fused_pose.t)) < 0.02


def test_garbage_then_recovery():
    """A burst of garbage scans must not poison subsequent good tracking."""
    from lego_loam_tpu.io import synthetic as syn

    world = syn.default_world(seed=3)
    pipe = LegoLoamPipeline(CFG)
    ring = (np.arange(P) % 16).astype(np.int32)

    poses = syn.circle_trajectory(6, radius=8.0, arc=0.15 * np.pi)
    R0, t0 = poses[0]
    for k in range(2):
        xyz, valid, r = syn.raycast(world, *poses[k], CFG.sensor)
        pipe.process_scan(xyz, valid, r, t=0.1 * k)
    # garbage burst
    for k in range(2):
        res = pipe.process_scan(np.zeros((P, 3), np.float32),
                                np.zeros(P, bool), ring, t=0.2 + 0.1 * k)
        _finite(pipe, res)
    # resume good scans near the garbage-coasted pose: feed the scan for the
    # pose where tracking left off
    for k in range(2, 6):
        xyz, valid, r = syn.raycast(world, *poses[k], CFG.sensor)
        res = pipe.process_scan(xyz, valid, r, t=0.2 + 0.1 * k)
        _finite(pipe, res)
