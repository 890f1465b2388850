"""IO: KITTI bin, native library, rosbag reader, metrics."""

import os

import numpy as np
import pytest

from lego_loam_tpu import config_for
from lego_loam_tpu.io import kitti, rosbag
from lego_loam_tpu.native import fast_io
from lego_loam_tpu.utils import metrics

from tests import rosbag_writer as bw

CFG = config_for("hdl64e")


def test_kitti_bin_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(5000, 4)).astype(np.float32)
    p = str(tmp_path / "000000.bin")
    pts.tofile(p)
    got = kitti.read_bin(p)
    np.testing.assert_array_equal(got, pts)


def test_pad_scan_nan_filter():
    pts = np.array([[1, 2, 3, 0.5], [np.nan, 0, 0, 0.1], [4, 5, 6, 0.2]],
                   np.float32)
    xyz, valid = kitti.pad_scan(pts, CFG)
    # cap covers real HDL-64E scan sizes (> the 64x1800 grid)
    assert xyz.shape == (max(CFG.sensor.n_scan * CFG.sensor.horizon_scan, 1 << 17), 3)
    assert valid[0] and not valid[1] and valid[2]
    np.testing.assert_array_equal(xyz[1], 0.0)


@pytest.mark.skipif(not fast_io.available(), reason="native lib not built")
def test_native_matches_numpy(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(3000, 4)).astype(np.float32)
    p = str(tmp_path / "scan.bin")
    pts.tofile(p)
    np.testing.assert_array_equal(fast_io.read_kitti_bin(p), pts)

    xyz, valid = fast_io.pad_scan_native(pts, 4096)
    assert valid[:3000].all() and not valid[3000:].any()
    np.testing.assert_array_equal(xyz[:3000], pts[:, :3])


@pytest.mark.skipif(not fast_io.available(), reason="native lib not built")
def test_native_prefetcher(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    clouds = []
    for k in range(6):
        pts = rng.normal(size=(100 + 10 * k, 4)).astype(np.float32)
        p = str(tmp_path / f"{k:06d}.bin")
        pts.tofile(p)
        paths.append(p)
        clouds.append(pts)
    pf = fast_io.Prefetcher(paths)
    got = list(pf)
    pf.close()
    assert len(got) == 6
    for g, c in zip(got, clouds):
        np.testing.assert_array_equal(g, c)


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_rosbag_roundtrip(tmp_path, compression):
    rng = np.random.default_rng(3)
    msgs = []
    clouds = []
    for k in range(3):
        xyz = rng.normal(size=(50, 3)).astype(np.float32)
        ring = (np.arange(50) % 16).astype(np.uint16)
        inten = rng.uniform(size=50).astype(np.float32)
        clouds.append((xyz, ring))
        msgs.append(("/velodyne_points", "sensor_msgs/PointCloud2", 10.0 + k,
                     bw.encode_pointcloud2(10.0 + k, xyz, ring, inten)))
        msgs.append(("/imu/data", "sensor_msgs/Imu", 10.0 + k + 0.01,
                     bw.encode_imu(10.0 + k + 0.01, [0, 0, 0, 1],
                                   [0.01, 0.02, 0.03], [0.1, 0.2, 9.8])))
    p = str(tmp_path / "test.bag")
    bw.write_bag(p, msgs, compression=compression)

    scans, imus = [], []
    for kind, payload in rosbag.BagSource(p):
        (scans if kind == "scan" else imus).append(payload)
    assert len(scans) == 3 and len(imus) == 3
    for s, (xyz, ring) in zip(scans, clouds):
        np.testing.assert_allclose(s["xyz"], xyz, atol=0)
        np.testing.assert_array_equal(s["ring"], ring.astype(np.int32))
        assert abs(s["t"] - 10.0) < 3.0
    np.testing.assert_allclose(imus[0]["gyro"], [0.01, 0.02, 0.03])
    np.testing.assert_allclose(imus[0]["acc"], [0.1, 0.2, 9.8])


def test_ate_alignment():
    rng = np.random.default_rng(4)
    gt = rng.normal(size=(40, 3))
    # est = rotated/translated copy -> ATE ~ 0 after alignment
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    est = gt @ R.T + np.array([5.0, -2.0, 1.0])
    assert metrics.ate_rmse(est, gt) < 1e-6
    assert metrics.ate_rmse(est, gt, align=False) > 1.0


def test_rpe():
    n = 20
    T = np.tile(np.eye(4), (n, 1, 1))
    T[:, 0, 3] = np.arange(n) * 1.0
    T2 = T.copy()
    T2[:, 0, 3] *= 1.1  # 10% scale drift per step
    tr, rot = metrics.rpe(T2, T, delta=1)
    assert abs(tr - 0.1) < 1e-6
    assert rot < 1e-6


def test_stage_timer_and_metrics_recorder():
    import time

    from lego_loam_tpu.utils.tracing import StageTimer

    st = StageTimer()
    for _ in range(3):
        with st.stage("work"):
            time.sleep(0.002)
    s = st.summary()
    assert s["work"]["n"] == 3
    assert s["work"]["mean_ms"] >= 1.0

    rec = metrics.MetricsRecorder()
    rec.add(fps=10.0, n=5)
    rec.add(fps=20.0, n=7)
    out = rec.summary()
    assert abs(out["fps"]["mean"] - 15.0) < 1e-9


def test_rosbag_example_quat_to_mat():
    """The bag-replay driver's quaternion decode must match SO(3) algebra."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from run_rosbag import quat_to_mat_np

    # identity
    np.testing.assert_allclose(
        quat_to_mat_np([0.0, 0.0, 0.0, 1.0]), np.eye(3), atol=1e-7)
    # 90 deg about z: q = (0, 0, sin45, cos45)
    s = np.sin(np.pi / 4)
    R = quat_to_mat_np([0.0, 0.0, s, s])
    np.testing.assert_allclose(
        R, [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6)
    # random unit quaternion: orthonormal, det +1
    rng = np.random.default_rng(0)
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    R = quat_to_mat_np(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert abs(np.linalg.det(R) - 1.0) < 1e-6
