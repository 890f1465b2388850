"""End-to-end demo: full SLAM on a synthetic world, with ATE report.

Usage:  python examples/run_synthetic.py [--frames N] [--loop] [--imu]
        [--sensor vlp16] [--out DIR] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--sensor", default="vlp16")
    ap.add_argument("--loop", action="store_true", help="enable loop closure")
    ap.add_argument("--imu", action="store_true", help="feed a synthetic IMU")
    ap.add_argument("--out", default=None, help="export PCD maps here")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from lego_loam_tpu import config_for
    from lego_loam_tpu.io import synthetic as syn
    from lego_loam_tpu.models import imu as imu_mod
    from lego_loam_tpu.models.pipeline import LegoLoamPipeline
    from lego_loam_tpu.utils.math3d import euler_to_mat
    from lego_loam_tpu.utils.metrics import ate_rmse

    cfg = config_for(
        args.sensor, deskew=False,
        max_keyframes=256,
        loop_closure_enabled=args.loop, loop_min_time_gap=5.0,
    )
    world = syn.default_world(seed=1)
    # ~0.6 m per scan (a brisk 6 m/s at 10 Hz), whatever the frame count
    arc = min(0.6 * (args.frames - 1) / 10.0, 1.9 * np.pi)
    poses = syn.circle_trajectory(args.frames, radius=10.0, arc=arc)
    pipe = LegoLoamPipeline(cfg, loop_check_every=5)

    scan_dt = cfg.sensor.scan_period
    yaw_rate = arc / ((args.frames - 1) * scan_dt)
    R0, t0 = poses[0]
    est, gt = [], []
    for k, (R, t) in enumerate(poses):
        if args.imu:
            for j in range(6):
                ti = k * scan_dt + j * scan_dt / 5
                yaw = yaw_rate * ti
                Ri = np.asarray(euler_to_mat(0.0, 0.0, yaw))
                speed = yaw_rate * 10.0
                acc_w = np.array([-speed * yaw_rate * np.sin(yaw),
                                  speed * yaw_rate * np.cos(yaw), 0.0])
                g = np.array([0.0, 0.0, imu_mod.GRAVITY])
                pipe.push_imu(ti, Ri, Ri.T @ (acc_w + g),
                              np.array([0.0, 0.0, yaw_rate]))
        xyz, valid, ring = syn.raycast(world, R, t, cfg.sensor, noise=0.02,
                                       rng=np.random.default_rng(k))
        res = pipe.process_scan(xyz, valid, ring, t=k * scan_dt)
        tw = R0 @ np.asarray(res.fused_pose.t) + t0
        est.append(tw)
        gt.append(t)
        flag = " LOOP" if res.loop_closed else ""
        print(f"frame {k:3d}: pos=({tw[0]:7.2f},{tw[1]:7.2f},{tw[2]:6.2f}) "
              f"err={np.linalg.norm(tw - t) * 100:6.1f}cm "
              f"{res.wall_ms:6.1f}ms "
              f"sharp={res.stats.get('n_sharp', '-'):>4}{flag}")

    print(f"\nATE RMSE (aligned): {ate_rmse(np.array(est), np.array(gt)):.3f} m"
          f" over {args.frames} frames, {int(pipe.mstate.n_kf)} keyframes,"
          f" {int(pipe.mstate.n_loops)} loop closures")

    if args.out:
        from lego_loam_tpu.io.pcd import export_maps

        written = export_maps(pipe, args.out)
        for p, n in written.items():
            print(f"wrote {p} ({n} pts)")


if __name__ == "__main__":
    main()
