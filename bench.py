"""Benchmark: full SLAM pipeline frames/s + trajectory accuracy on synthetic
VLP-16 scans.

Measures, on the default JAX platform (the real TPU chip under the driver):

  * per-scan latency of the full front-end + scan-to-map pipeline in steady
    state (dispatch-bound on a tunneled device) — `value` is the MEDIAN of
    N_REP windows (round-3 verdict: best-of overstates by window jitter);
  * the same configuration with loop closure enabled (`loop_on_fps`);
  * chunked throughput mode (`chunk_fps`): C scans per device program via
    lax.scan — the number SCALING.md §1 claims, now a driver artifact;
  * trajectory accuracy (`accuracy_*`): a 640-scan two-lap loop with loop
    closure ON — ATE RMSE / RPE vs exact synthetic ground truth plus the
    number of accepted loop closures, asserted against a bound.  This is the
    per-round accuracy artifact standing in for the reference's only
    validation mechanism (rosbag replay + map inspection,
    reference: README.md:98-113); also written to ACCURACY.json.

Baseline: the reference claims real-time 10 Hz VLP-16 operation on its
target CPU (reference: README.md:3,106; BASELINE.md), so vs_baseline =
median_fps / 10.

Robustness: the measurement runs in a CHILD process and is retried on
failure — the tunneled TPU occasionally drops a window mid-run (BENCH_r02
recorded rc=1 from one such FAILED_PRECONDITION; the identical program ran
green before and after), and a dead TPU context cannot be revived
in-process.  The final attempt falls back to the conservative all-XLA
backends so a systematically-broken Pallas path still yields an honest
number instead of a crash.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

N_WARM, N_MEAS, N_REP = 6, 30, 3
ACC_FRAMES = 640          # two laps -> revisits pass the 30 s loop time gap
ACC_CHUNK = 64
ACC_ATE_BOUND = 0.75      # m, asserted on the CORRECTED keyframe
                          # trajectory (the reference's trajectory.pcd
                          # analog): loop closure must keep it well under
                          # the open-loop drift of a 190 m course
ACC_LIVE_BOUND = 1.5      # m, asserted on the LIVE (causal) trajectory,
                          # which necessarily bakes in lap-1 drift


def _build_scans(cfg, poses, noise=0.02, seed0=0):
    import jax.numpy as jnp

    from lego_loam_tpu.io import synthetic as syn

    world = syn.default_world(seed=0)
    scans = []
    for k, (R, t) in enumerate(poses):
        xyz, valid, ring = syn.raycast(
            world, R, t, cfg.sensor, noise=noise,
            rng=np.random.default_rng(seed0 + k))
        scans.append((
            jnp.asarray(xyz, jnp.float32),
            jnp.asarray(valid),
            jnp.asarray(ring, jnp.int32),
        ))
    return scans


def _two_lap_circle(n, radius=15.0, height=1.6):
    """Closed circular course traversed twice: lap 2 revisits lap 1's poses
    with a >30 s time offset, so the reference loop-closure rules fire."""
    poses = []
    for k in range(n):
        a = 2.0 * np.pi * (2.0 * k / n)          # two full laps
        t = np.array([radius * np.sin(a), radius * (1 - np.cos(a)), height])
        c, s = np.cos(a), np.sin(a)
        R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        poses.append((R, t))
    return poses


def measure(fallback: bool) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 1)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from lego_loam_tpu import config_for
    from lego_loam_tpu.io import synthetic as syn
    from lego_loam_tpu.models.pipeline import LegoLoamPipeline
    from lego_loam_tpu.utils.metrics import ate_rmse, poses_to_mat, rpe

    overrides = {}
    if fallback:
        overrides = dict(segmentation_backend="xla", segstats_backend="scatter",
                         feature_backend="xla", nn_backend="xla")
    cfg = config_for(
        "vlp16", deskew=False,
        max_keyframes=256,          # bounded pool for the short latency runs
        **overrides,
    )
    n_total = N_WARM + N_REP * N_MEAS
    lat_poses = syn.circle_trajectory(n_total, radius=12.0, arc=0.9 * np.pi)
    scans = _build_scans(cfg, lat_poses)

    def run_windows(pipe_cfg, loop_every):
        pipe = LegoLoamPipeline(pipe_cfg, collect_stats=False,
                                loop_check_every=loop_every)
        for k in range(N_WARM):
            pipe.process_scan(*scans[k])
        jax.block_until_ready(pipe.trajectory[-1])
        windows = []
        for r in range(N_REP):
            base = N_WARM + r * N_MEAS
            t0 = time.perf_counter()
            for k in range(base, base + N_MEAS):
                res = pipe.process_scan(*scans[k])
            jax.block_until_ready(res.fused_pose.t)
            windows.append(N_MEAS / (time.perf_counter() - t0))
        return windows

    def median(xs):
        return sorted(xs)[len(xs) // 2]

    windows = run_windows(cfg, loop_every=10)
    # loop-closure-enabled configuration: same scans, 1-in-10 loop checks
    loop_windows = run_windows(
        cfg.replace(loop_closure_enabled=True), loop_every=10)

    # --- chunked throughput mode (SCALING.md §1, now a driver artifact) ---
    C = 32
    n_chunks_warm, n_chunks_meas = 1, 2
    chunk_src = [scans[k % n_total] for k in range(C * (n_chunks_warm
                                                        + n_chunks_meas))]
    cpipe = LegoLoamPipeline(cfg, collect_stats=False)
    stack = lambda i: tuple(
        jnp.stack([chunk_src[i * C + k][j] for k in range(C)])
        for j in range(3))
    r = cpipe.process_chunk(*stack(0))
    jax.block_until_ready(r.fused_poses.t)
    t0 = time.perf_counter()
    for i in range(n_chunks_warm, n_chunks_warm + n_chunks_meas):
        r = cpipe.process_chunk(*stack(i))
    jax.block_until_ready(r.fused_poses.t)
    chunk_fps = C * n_chunks_meas / (time.perf_counter() - t0)

    # --- accuracy artifact: two-lap loop course, loop closure ON ---
    acc_cfg = config_for(
        "vlp16", deskew=False, loop_closure_enabled=True,
        max_keyframes=1024, **overrides)
    acc_poses = _two_lap_circle(ACC_FRAMES)
    acc_scans = _build_scans(acc_cfg, acc_poses, seed0=1000)
    gt = np.asarray([t for (_, t) in acc_poses]) - acc_poses[0][1]
    gt_R = np.asarray([R for (R, _) in acc_poses])
    apipe = LegoLoamPipeline(acc_cfg, collect_stats=False,
                             loop_check_every=10)
    t0 = time.perf_counter()
    n_loops_closed = 0
    fused_R = []
    for i in range(0, ACC_FRAMES, ACC_CHUNK):
        chunk = acc_scans[i:i + ACC_CHUNK]
        res = apipe.process_chunk(
            *(tuple(jnp.stack([s[j] for s in chunk]) for j in range(3))))
        n_loops_closed += int(np.asarray(res.loop_closed).sum())
        fused_R.append(np.asarray(res.fused_poses.R))
    acc_wall = time.perf_counter() - t0
    traj = np.concatenate([np.asarray(t) for t in apipe.trajectory])
    fused_R = np.concatenate(fused_R)
    ate = ate_rmse(traj, gt)
    rpe_t, rpe_r = rpe(poses_to_mat(fused_R, traj),
                       poses_to_mat(gt_R, gt), delta=10)
    # corrected keyframe trajectory — what the reference dumps as
    # trajectory.pcd after correctPoses (mapOptmization.cpp:731-755): the
    # loop-closure corrections reach these retroactively, unlike the
    # causal live trajectory above
    n_kf = int(apipe.mstate.n_kf)
    kf_t = np.asarray(apipe.mstate.kf_t)[:n_kf]
    kf_time = np.asarray(apipe.mstate.kf_time)[:n_kf]
    scan_period = acc_cfg.sensor.scan_period
    gt_idx = np.clip(np.round(kf_time / scan_period).astype(int), 0,
                     ACC_FRAMES - 1)
    ate_corr = ate_rmse(kf_t, gt[gt_idx])
    acc = {
        "accuracy_frames": ACC_FRAMES,
        "accuracy_course_m": round(2 * 2 * np.pi * 15.0, 1),
        "accuracy_ate_rmse_m": round(ate, 4),
        "accuracy_ate_corrected_m": round(ate_corr, 4),
        "accuracy_rpe_trans_m": round(rpe_t, 4),
        "accuracy_rpe_rot_deg": round(np.degrees(rpe_r), 4),
        "accuracy_loops_closed": n_loops_closed,
        "accuracy_n_kf": n_kf,
        "accuracy_fps": round(ACC_FRAMES / acc_wall, 2),
        "accuracy_ate_bound_m": ACC_ATE_BOUND,
        "accuracy_live_bound_m": ACC_LIVE_BOUND,
    }
    assert n_loops_closed >= 2, f"only {n_loops_closed} loop closures"
    assert ate_corr < ACC_ATE_BOUND, (
        f"corrected ATE {ate_corr:.3f} m exceeds {ACC_ATE_BOUND}")
    assert ate < ACC_LIVE_BOUND, f"live ATE {ate:.3f} m exceeds {ACC_LIVE_BOUND}"
    with open(__file__.rsplit("/", 1)[0] + "/ACCURACY.json", "w") as f:
        json.dump(acc, f, indent=1)

    fps = median(windows)
    print(json.dumps({
        "metric": "vlp16_scan_to_map_pipeline",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
        "method": f"median-of-{N_REP}x{N_MEAS}",
        "windows_fps": [round(w, 2) for w in windows],
        "best_fps": round(max(windows), 2),
        "loop_on_fps": round(median(loop_windows), 2),
        "chunk_fps": round(chunk_fps, 2),
        **acc,
        "fallback_backends": fallback,
    }))


def main() -> None:
    if os.environ.get("_LEGO_BENCH_CHILD"):
        measure(fallback=os.environ["_LEGO_BENCH_CHILD"] == "fallback")
        return
    # parent: run the measurement in a child; retry transient TPU failures
    attempts = ("normal", "normal", "fallback")
    for i, mode in enumerate(attempts):
        env = dict(os.environ, _LEGO_BENCH_CHILD=mode)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=3600)
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith("{")), None)
        if proc.returncode == 0 and line is not None:
            rec = json.loads(line)
            rec["attempt"] = i + 1
            print(json.dumps(rec))
            return
        sys.stderr.write(
            f"bench attempt {i + 1} ({mode}) failed rc={proc.returncode}\n"
            + proc.stderr[-2000:] + "\n")
    raise SystemExit("all bench attempts failed")


if __name__ == "__main__":
    main()
