"""Run the pipeline over a KITTI odometry sequence and report ATE/RPE.

Usage:
  python examples/run_kitti.py --seq /data/kitti/sequences/00 \
      [--poses /data/kitti/poses/00.txt] [--frames N] [--loop] \
      [--out traj.txt] [--cpu]

Expects the standard layout: <seq>/velodyne/*.bin and <seq>/calib.txt.
KITTI scans are motion-compensated, so de-skew is off and rows come from
elevation math (HDL-64E preset).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", required=True)
    ap.add_argument("--poses", default=None, help="ground-truth pose file")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--loop", action="store_true")
    ap.add_argument("--out", default=None, help="write KITTI-format trajectory")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--chunk", type=int, default=0,
                    help="process C scans per device dispatch (throughput "
                         "replay mode; 0 = per-scan)")
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
    from lego_loam_tpu.io import kitti
    from lego_loam_tpu.models.pipeline import LegoLoamPipeline
    from lego_loam_tpu.utils.metrics import ate_rmse, poses_to_mat, rpe

    cfg = config_for(
        "hdl64e", deskew=False,
        max_keyframes=4096,
        max_less_flat=8192, max_less_sharp=4096, max_sharp=1024,
        max_flat=2048, max_outlier=4096,
        loop_closure_enabled=args.loop,
    )
    seq = kitti.KittiSequence(args.seq, cfg, max_frames=args.frames)
    pipe = LegoLoamPipeline(cfg)

    est_R, est_t = [], []
    if args.chunk > 1:
        # throughput replay: C scans per dispatch; the ragged tail runs
        # through the per-scan path (chunk size is jit-static)
        buf = []
        C = args.chunk

        def flush_chunk():
            xyzs = np.stack([b[0] for b in buf])
            vals = np.stack([b[1] for b in buf])
            res = pipe.process_chunk(xyzs, vals, None, t0=buf[0][2])
            est_R.extend(np.asarray(res.fused_poses.R))
            est_t.extend(np.asarray(res.fused_poses.t))
            print(f"frame {len(est_t)}/{len(seq)}  pos="
                  f"{est_t[-1].round(1)}  "
                  f"{res.wall_ms / len(buf):.0f} ms/scan")
            buf.clear()

        for xyz, valid, t in seq:
            buf.append((xyz, valid, t))
            if len(buf) == C:
                flush_chunk()
        for xyz, valid, t in buf:
            res = pipe.process_scan(xyz, valid, None, t=t)
            est_R.append(np.asarray(res.fused_pose.R))
            est_t.append(np.asarray(res.fused_pose.t))
    else:
        for k, (xyz, valid, t) in enumerate(seq):
            res = pipe.process_scan(xyz, valid, None, t=t)
            est_R.append(np.asarray(res.fused_pose.R))
            est_t.append(np.asarray(res.fused_pose.t))
            if k % 50 == 0:
                print(f"frame {k}/{len(seq)}  pos="
                      f"{np.asarray(res.fused_pose.t).round(1)}  "
                      f"{res.wall_ms:.0f} ms")

    est_R = np.stack(est_R)
    est_t = np.stack(est_t)
    if args.out:
        kitti.write_poses_kitti(args.out, est_R, est_t)
        print(f"wrote {args.out}")

    if args.poses:
        T_cv = kitti.read_calib(args.seq)
        gt = kitti.read_poses(args.poses, T_cv)[: len(est_t)]
        # estimates live in the first-scan velodyne frame; gt likewise after
        # anchoring at its first pose
        gt0_inv = np.linalg.inv(gt[0])
        gt_rel = np.einsum("ij,njk->nik", gt0_inv, gt)
        ate = ate_rmse(est_t, gt_rel[:, :3, 3])
        est_T = poses_to_mat(est_R, est_t)
        delta = max(1, min(10, len(est_t) - 1))
        tr, rot = rpe(est_T, gt_rel, delta=delta)
        print(f"ATE RMSE: {ate:.3f} m   RPE@{delta}: {tr:.3f} m, "
              f"{np.degrees(rot):.3f} deg over {len(est_t)} frames")


if __name__ == "__main__":
    main()
