"""Replay a ROS1 bag through the pipeline — the reference's primary workflow
(`rosbag play *.bag --topic /velodyne_points /imu/data`, reference:
README.md:98-113) without ROS.

Usage:
  python examples/run_rosbag.py --bag data.bag [--imu] [--loop] \
      [--frames N] [--sensor vlp16] [--export-dir /tmp] [--cpu] [--chunk C]

IMU messages (if --imu and the topic exists) feed odometry seeding, de-skew,
and the mapping attitude blend, exactly like the reference's optional 9-DOF
input.  --export-dir writes the reference's shutdown artifacts
(cornerMap/surfaceMap/trajectory/finalCloud .pcd, mapOptmization.cpp:731-755).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def quat_to_mat_np(q):
    """[x, y, z, w] quaternion -> rotation matrix (numpy, host-side)."""
    import numpy as np

    x, y, z, w = q
    n = x * x + y * y + z * z + w * w
    s = 0.0 if n == 0.0 else 2.0 / n
    xx, yy, zz = s * x * x, s * y * y, s * z * z
    xy, xz, yz = s * x * y, s * x * z, s * y * z
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    return np.array([
        [1.0 - (yy + zz), xy - wz, xz + wy],
        [xy + wz, 1.0 - (xx + zz), yz - wx],
        [xz - wy, yz + wx, 1.0 - (xx + yy)],
    ], dtype=np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bag", required=True)
    ap.add_argument("--cloud-topic", default="/velodyne_points")
    ap.add_argument("--imu-topic", default="/imu/data")
    ap.add_argument("--imu", action="store_true",
                    help="use IMU messages (ignored if the topic is absent)")
    ap.add_argument("--sensor", default="vlp16")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--loop", action="store_true")
    ap.add_argument("--export-dir", default=None,
                    help="write PCD map/trajectory artifacts at the end")
    ap.add_argument("--out", default=None, help="write TUM-format trajectory")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

    import numpy as np

    from lego_loam_tpu import config_for
    from lego_loam_tpu.io.kitti import pad_scan
    from lego_loam_tpu.io.rosbag import BagSource
    from lego_loam_tpu.models.pipeline import LegoLoamPipeline

    cfg = config_for(args.sensor, loop_closure_enabled=args.loop)
    pipe = LegoLoamPipeline(cfg)

    src = BagSource(args.bag, args.cloud_topic, args.imu_topic)
    stamps, n = [], 0
    for kind, msg in src:
        if kind == "imu":
            if args.imu:
                pipe.push_imu(msg["t"], quat_to_mat_np(msg["quat"]),
                              np.asarray(msg["acc"], np.float32),
                              np.asarray(msg["gyro"], np.float32))
            continue
        xyz, valid = pad_scan(msg["xyz"], cfg)
        cap = xyz.shape[0]
        ring = msg["ring"]
        if ring is not None:
            ring_p = np.zeros(cap, np.int32)
            ring_p[: min(len(ring), cap)] = ring[:cap]
            ring = ring_p
        elif cfg.sensor.use_ring:
            raise SystemExit(
                f"bag cloud has no ring channel; use an elevation-math "
                f"preset (--sensor hdl64e style), not {cfg.sensor.name}")
        res = pipe.process_scan(xyz, valid, ring, t=msg["t"])
        stamps.append(msg["t"])
        n += 1
        if n % 50 == 0:
            print(f"scan {n}  pos={np.asarray(res.fused_pose.t).round(2)}  "
                  f"{res.wall_ms:.0f} ms  "
                  f"kf={int(pipe.mstate.n_kf)}")
        if args.frames and n >= args.frames:
            break

    print(f"replayed {n} scans, {int(pipe.mstate.n_kf)} keyframes, "
          f"{int(pipe.mstate.n_loops)} loop closures")

    traj = np.asarray(jax.device_get(pipe.trajectory))
    if args.out:
        with open(args.out, "w") as f:
            for t, p in zip(stamps, traj):
                f.write(f"{t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                        "0 0 0 1\n")
        print(f"wrote {args.out}")

    if args.export_dir:
        from lego_loam_tpu.io.pcd import export_maps

        written = export_maps(pipe, args.export_dir)
        for path, count in written.items():
            print(f"wrote {path} ({count} pts)")


if __name__ == "__main__":
    main()
