"""Chunked throughput mode == per-scan mode, scan for scan.

chunk_steps runs C scans in one device program (lax.scan with the mapping /
loop cadences as lax.cond); it must advance the state exactly as C
process_scan calls do (reference cadences: mapOptmization.cpp:1487-1499
throttle, loopClosureThread 1 Hz, mapOptmization.cpp:802).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lego_loam_tpu import config_for
from lego_loam_tpu.io import synthetic as syn
from lego_loam_tpu.models.pipeline import LegoLoamPipeline

CFG = config_for(
    "vlp16", deskew=False,
    max_keyframes=64, max_map_corner=2048, max_map_surf=8192,
    kf_corner_cap=512, kf_surf_cap=2048, kf_outlier_cap=512,
    max_scan_corner_ds=512, max_scan_surf_ds=2048, nn_query_tile=256,
    mapping_process_every=2,
)


def _scans(n, cfg, arc=0.35 * np.pi, seed=4):
    world = syn.default_world(seed=seed)
    poses = syn.circle_trajectory(n, radius=8.0, arc=arc)
    out = []
    for k, (R, t) in enumerate(poses):
        xyz, valid, ring = syn.raycast(world, R, t, cfg.sensor, noise=0.01,
                                       rng=np.random.default_rng(k))
        out.append((jnp.asarray(xyz, jnp.float32), jnp.asarray(valid),
                    jnp.asarray(ring, jnp.int32)))
    return out


def _run_per_scan(cfg, scans):
    pipe = LegoLoamPipeline(cfg)
    fused = [np.asarray(pipe.process_scan(*s).fused_pose.t) for s in scans]
    return pipe, np.stack(fused)


def _run_chunked(cfg, scans, chunk):
    pipe = LegoLoamPipeline(cfg)
    fused = []
    for i in range(0, len(scans), chunk):
        xyz = jnp.stack([s[0] for s in scans[i:i + chunk]])
        val = jnp.stack([s[1] for s in scans[i:i + chunk]])
        ring = jnp.stack([s[2] for s in scans[i:i + chunk]])
        res = pipe.process_chunk(xyz, val, ring)
        fused.append(np.asarray(res.fused_poses.t))
    return pipe, np.concatenate(fused)


def test_chunk_matches_per_scan():
    scans = _scans(12, CFG)
    pipe_a, fused_a = _run_per_scan(CFG, scans)
    pipe_b, fused_b = _run_chunked(CFG, scans, chunk=4)

    np.testing.assert_allclose(fused_b, fused_a, atol=1e-4)
    assert int(pipe_b.mstate.n_kf) == int(pipe_a.mstate.n_kf)
    n = int(pipe_a.mstate.n_kf)
    np.testing.assert_allclose(np.asarray(pipe_b.mstate.kf_t[:n]),
                               np.asarray(pipe_a.mstate.kf_t[:n]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pipe_b.ostate.pose.t),
                               np.asarray(pipe_a.ostate.pose.t), atol=1e-4)


def test_chunk_boundary_invariance():
    """Two chunks of 6 == one chunk of 12 (frame indices are absolute)."""
    scans = _scans(12, CFG)
    _, fused_a = _run_chunked(CFG, scans, chunk=12)
    _, fused_b = _run_chunked(CFG, scans, chunk=6)
    np.testing.assert_allclose(fused_b, fused_a, atol=1e-5)


def test_chunk_cadence_flags():
    scans = _scans(8, CFG)
    pipe = LegoLoamPipeline(CFG)
    xyz = jnp.stack([s[0] for s in scans])
    val = jnp.stack([s[1] for s in scans])
    ring = jnp.stack([s[2] for s in scans])
    res = pipe.process_chunk(xyz, val, ring)
    did = np.asarray(res.did_map)
    assert did.tolist() == [k % CFG.mapping_process_every == 0
                            for k in range(8)]
    assert np.asarray(res.stats).shape == (8, 5)
    assert (np.asarray(res.stats)[:, 3] > 10).all()   # n_sharp per scan


def test_chunk_with_loop_closure():
    cfg = config_for(
        "vlp16", deskew=False,
        max_keyframes=64, max_map_corner=2048, max_map_surf=8192,
        kf_corner_cap=512, kf_surf_cap=2048, kf_outlier_cap=512,
        max_scan_corner_ds=512, max_scan_surf_ds=2048, nn_query_tile=256,
        mapping_process_every=2, loop_closure_enabled=True,
        loop_min_time_gap=0.35, max_loop_edges=8,
    )
    scans = _scans(16, cfg, arc=2.0 * np.pi, seed=4)
    pipe_a = LegoLoamPipeline(cfg, loop_check_every=4)
    closed_a = [pipe_a.process_scan(*s).loop_closed for s in scans]

    pipe_b = LegoLoamPipeline(cfg, loop_check_every=4)
    xyz = jnp.stack([s[0] for s in scans])
    val = jnp.stack([s[1] for s in scans])
    ring = jnp.stack([s[2] for s in scans])
    res = pipe_b.process_chunk(xyz, val, ring)

    assert np.asarray(res.loop_closed).tolist() == closed_a
    assert int(pipe_b.mstate.n_loops) == int(pipe_a.mstate.n_loops)
    n = int(pipe_a.mstate.n_kf)
    np.testing.assert_allclose(np.asarray(pipe_b.mstate.kf_t[:n]),
                               np.asarray(pipe_a.mstate.kf_t[:n]), atol=1e-3)


def test_chunk_with_imu_matches_per_scan():
    """IMU-seeded replay: chunk == per-scan when the buffer holds the whole
    stream up front (the offline-replay contract)."""
    from lego_loam_tpu.models import imu as im
    from lego_loam_tpu.utils.math3d import euler_to_mat

    n = 8
    scans = _scans(n, CFG, arc=0.25 * np.pi)
    scan_dt = CFG.sensor.scan_period
    yaw_rate = (0.25 * np.pi) / ((n - 1) * scan_dt)

    def imu_samples():
        for k in range(n):
            for j in range(6):
                ti = k * scan_dt + j * scan_dt / 5
                yaw = yaw_rate * ti
                Ri = np.asarray(euler_to_mat(
                    jnp.float32(0), jnp.float32(0), jnp.float32(yaw)))
                acc_body = Ri.T @ np.array([0.0, 0.0, im.GRAVITY])
                yield k, ti, Ri, acc_body, np.array([0.0, 0.0, yaw_rate])

    pipe_a = LegoLoamPipeline(CFG, collect_stats=False)
    samples = list(imu_samples())
    fused_a = []
    for k in range(n):
        for kk, ti, Ri, acc, gyro in samples:
            if kk == k:
                pipe_a.push_imu(ti, Ri, acc, gyro)
        res = pipe_a.process_scan(*scans[k], t=k * scan_dt)
        fused_a.append(np.asarray(res.fused_pose.t))

    pipe_b = LegoLoamPipeline(CFG, collect_stats=False)
    for _, ti, Ri, acc, gyro in samples:   # whole stream up front
        pipe_b.push_imu(ti, Ri, acc, gyro)
    res = pipe_b.process_chunk(
        jnp.stack([s[0] for s in scans]),
        jnp.stack([s[1] for s in scans]),
        jnp.stack([s[2] for s in scans]), t0=0.0)

    # sub-mm agreement: the robust-scale mean reduction fuses differently
    # in the per-scan and chunked programs, so bit-exactness is not expected
    np.testing.assert_allclose(np.asarray(res.fused_poses.t),
                               np.stack(fused_a), atol=1e-3)
    assert int(pipe_b.mstate.n_kf) == int(pipe_a.mstate.n_kf)
