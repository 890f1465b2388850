"""Benchmark: full SLAM pipeline frames/s + trajectory accuracy on synthetic
VLP-16 scans.

EVERY measurement here is forced with jax.device_get of data that depends on
the full computation.  Round-5 finding (examples/diag_chunk3.py): over the
tunneled TPU `jax.block_until_ready` can acknowledge BEFORE the remote
computation finishes, so earlier rounds' block-based numbers (per-scan
1000-2526 fps, chunk 7000-11800 fps) measured dispatch, not execution, and
are void.  Honest numbers are ~1-2 orders of magnitude lower and mutually
consistent: chunk mode (zero per-scan host work) is the fastest path, the
per-scan path pays ~2 ms/scan of host-side dispatch on top.

Measures, on the default JAX platform (the real TPU chip under the driver),
all at the SHIPPING capacity (max_keyframes=4096):

  * `value`: per-scan front-end + scan-to-map throughput, median of
    N_REP x N_MEAS windows, device_get-forced per window;
  * `loop_on_fps`: same with loop closure checks every 10th scan;
  * `chunk_fps`: chunked replay mode (lax.scan, C scans per program);
  * `stage_ms`: per-stage device time (frontend / mapping / loop check /
    pose-graph solve), chained windows, device_get-forced;
  * `deskew_*`: a motion-distorted fast-yaw course run with de-skew off vs
    on (constant-velocity warp) vs on+ideal-IMU — the adjustDistortion path
    (featureAssociation.cpp:491-619) as a driver-level accuracy artifact;
  * `accuracy_*`: a 640-scan two-lap loop-closure course — ATE/RPE vs exact
    ground truth on the live trajectory AND on the corrected keyframe
    trajectory (trajectory.pcd analog), asserted against bounds; also
    written to ACCURACY.json.

Baseline: the reference claims real-time 10 Hz VLP-16 operation on its
target CPU (reference: README.md:3,106; BASELINE.md), so vs_baseline =
median_fps / 10.

Robustness: the measurement runs in a CHILD process and is retried on
failure; the final attempt falls back to the all-XLA backends.

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
CHUNK_C = 32
ACC_FRAMES = 640          # two laps -> revisits pass the 30 s loop time gap
ACC_CHUNK = 64
ACC_ATE_BOUND = 0.75      # m, asserted on the CORRECTED keyframe trajectory
ACC_LIVE_BOUND = 1.5      # m, asserted on the LIVE (causal) trajectory
DSK_FRAMES = 96           # fast-yaw distorted course length


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


def _measure_per_scan(cfg, scans, loop_every):
    import jax

    from lego_loam_tpu.models.pipeline import LegoLoamPipeline

    pipe = LegoLoamPipeline(cfg, collect_stats=False,
                            loop_check_every=loop_every)
    for k in range(N_WARM):
        r = pipe.process_scan(*scans[k])
    jax.device_get(r.fused_pose.t)
    windows = []
    for rep in range(N_REP):
        base = N_WARM + rep * N_MEAS
        t0 = time.perf_counter()
        for k in range(base, base + N_MEAS):
            r = pipe.process_scan(*scans[k % len(scans)])
        # the state chain makes this force every dispatched scan
        jax.device_get(r.fused_pose.t)
        windows.append(N_MEAS / (time.perf_counter() - t0))
    return windows


def _measure_chunk(cfg, scans):
    import jax
    import jax.numpy as jnp

    from lego_loam_tpu.models.pipeline import LegoLoamPipeline

    pipe = LegoLoamPipeline(cfg, collect_stats=False)
    n = len(scans)
    stack = lambda i: tuple(
        jnp.stack([scans[(i * CHUNK_C + k) % n][j] for k in range(CHUNK_C)])
        for j in range(3))
    r = pipe.process_chunk(*stack(0))
    jax.device_get(r.fused_poses.t)
    windows = []
    for rep in range(N_REP):
        t0 = time.perf_counter()
        for i in (1, 2):
            r = pipe.process_chunk(*stack(2 * rep + i))
        jax.device_get(r.fused_poses.t)
        windows.append(2 * CHUNK_C / (time.perf_counter() - t0))
    return windows


def _stage_breakdown(cfg, scans):
    """Per-stage device time: chained calls, forced once per window."""
    import jax
    import jax.numpy as jnp

    from lego_loam_tpu.models import loop as lc
    from lego_loam_tpu.models import mapping as mp
    from lego_loam_tpu.models.pipeline import LegoLoamPipeline, frontend_step
    from lego_loam_tpu.models.posegraph import solve_pose_graph

    pipe = LegoLoamPipeline(cfg.replace(loop_closure_enabled=True),
                            collect_stats=False)
    for k in range(12):
        r = pipe.process_scan(*scans[k])
    jax.device_get(r.fused_pose.t)
    ostate, mstate = pipe.ostate, pipe.mstate
    xyz, valid, ring = scans[12]
    acfg = pipe.cfg

    def win(fn, n=20):
        out = fn()
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        return round((time.perf_counter() - t0) / n * 1e3, 3)

    ms_fe = win(lambda: frontend_step(
        ostate, xyz, valid, ring, mstate.bef_mapped, mstate.aft_mapped,
        jnp.float32(1.2), acfg, acfg.sensor.use_ring)[2].t)
    _, feats, opose, _, _, _ = frontend_step(
        ostate, xyz, valid, ring, mstate.bef_mapped, mstate.aft_mapped,
        jnp.float32(1.2), acfg, acfg.sensor.use_ring)
    mfeats = feats._replace(less_sharp=ostate.ref_corner,
                            less_flat=ostate.ref_surf)
    def fresh():
        # mapping_step / loop_closure_step donate their state arg — feed a
        # fresh copy per call (the copy rides HBM, ~0.1 ms at K=4096)
        return jax.tree_util.tree_map(lambda x: x.copy(), mstate)

    ms_map = win(lambda: mp.mapping_step(
        fresh(), mfeats, opose, jnp.float32(1.2), acfg)[1].t)
    ms_loop = win(lambda: lc.loop_closure_step(
        fresh(), jnp.float32(1.2), acfg)[1].fitness, n=10)
    ms_pg = win(lambda: solve_pose_graph(mstate, acfg).kf_t, n=10)
    return {"frontend": ms_fe, "mapping": ms_map, "loop_check": ms_loop,
            "pose_graph": ms_pg}


def _deskew_artifact(base_cfg):
    """Fast-yaw motion-distorted course, de-skew off / on / on+ideal IMU.

    Sweeps are raycast along the true in-sweep motion (io/synthetic.
    raycast_swept), so each scan carries the rotational distortion the
    de-skew path (featureAssociation.cpp:491-619) exists to remove."""
    import jax
    import jax.numpy as jnp

    from lego_loam_tpu.io import synthetic as syn
    from lego_loam_tpu.models.pipeline import LegoLoamPipeline

    cfg = base_cfg.replace(deskew=True)
    world = syn.default_world(seed=3)
    radius, speed = 6.0, 0.45            # m, m/scan -> 4.3 deg yaw per scan
    dt = cfg.sensor.scan_period
    wz = speed / radius / dt             # rad/s yaw rate
    poses = []
    for k in range(DSK_FRAMES + 1):
        a = speed * k / radius
        t = np.array([radius * np.sin(a), radius * (1 - np.cos(a)), 1.6])
        c, s = np.cos(a), np.sin(a)
        poses.append((np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]]), t))
    scans = []
    for k in range(DSK_FRAMES):
        (R0, t0), (R1, t1) = poses[k], poses[k + 1]
        xyz, valid, ring = syn.raycast_swept(
            world, R0, t0, R1, t1, cfg.sensor, noise=0.02,
            rng=np.random.default_rng(7000 + k))
        scans.append((jnp.asarray(xyz, jnp.float32), jnp.asarray(valid),
                      jnp.asarray(ring, jnp.int32)))
    gt = np.asarray([t for (_, t) in poses[:DSK_FRAMES]]) - poses[0][1]

    from lego_loam_tpu.utils.metrics import ate_rmse

    def run(deskew: bool, imu: bool):
        pipe = LegoLoamPipeline(cfg.replace(deskew=deskew),
                                collect_stats=False)
        g = 9.80665
        for k in range(DSK_FRAMES):
            if imu:
                # ideal AHRS + accelerometer at 10 samples/sweep: constant
                # speed circular motion (centripetal specific force)
                for j in range(10):
                    tj = (k + j / 10.0) * dt
                    a = speed * (k + j / 10.0) / radius
                    c, s = np.cos(a), np.sin(a)
                    Rj = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
                    # centripetal: a_w points from the pose toward the
                    # circle centre (0, radius)
                    a_w = (speed / dt) ** 2 / radius * np.array(
                        [-np.sin(a), np.cos(a), 0.0])
                    acc_body = Rj.T @ (a_w + np.array([0.0, 0.0, g]))
                    pipe.push_imu(tj, Rj, acc_body, np.array([0.0, 0.0, wz]))
            r = pipe.process_scan(*scans[k], t=k * dt)
        jax.device_get(r.fused_pose.t)
        traj = np.asarray(jax.device_get(
            jnp.stack([t for t in pipe.trajectory])))
        return float(ate_rmse(traj, gt))

    ate_off = run(False, False)
    ate_on = run(True, False)
    ate_imu = run(True, True)
    return {"deskew_frames": DSK_FRAMES,
            "deskew_yaw_deg_per_scan": round(np.degrees(speed / radius), 2),
            "deskew_off_ate_m": round(ate_off, 4),
            "deskew_on_ate_m": round(ate_on, 4),
            "deskew_imu_ate_m": round(ate_imu, 4)}


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
    # SHIPPING capacity: the default max_keyframes=4096 pool
    cfg = config_for("vlp16", deskew=False, **overrides)
    assert cfg.max_keyframes == 4096
    n_total = N_WARM + N_REP * N_MEAS
    lat_poses = syn.circle_trajectory(n_total, radius=12.0, arc=0.9 * np.pi)
    scans = _build_scans(cfg, lat_poses)

    def median(xs):
        return sorted(xs)[len(xs) // 2]

    windows = _measure_per_scan(cfg, scans, loop_every=10)
    loop_windows = _measure_per_scan(
        cfg.replace(loop_closure_enabled=True), scans, loop_every=10)
    chunk_windows = _measure_chunk(cfg, scans)
    stage_ms = _stage_breakdown(cfg, scans)
    dsk = _deskew_artifact(cfg)

    # --- accuracy artifact: two-lap loop course, loop closure ON ---
    acc_cfg = cfg.replace(loop_closure_enabled=True)
    acc_poses = _two_lap_circle(ACC_FRAMES)
    acc_scans = _build_scans(acc_cfg, acc_poses, seed0=1000)
    gt = np.asarray([t for (_, t) in acc_poses]) - acc_poses[0][1]
    gt_R = np.asarray([R for (R, _) in acc_poses])
    apipe = LegoLoamPipeline(acc_cfg, collect_stats=False,
                             loop_check_every=10)
    # warm-compile the chunk program on a throwaway pipeline so the timed
    # region below is execution only
    wpipe = LegoLoamPipeline(acc_cfg, collect_stats=False,
                             loop_check_every=10)
    r = wpipe.process_chunk(*(tuple(
        jnp.stack([s[j] for s in acc_scans[:ACC_CHUNK]]) for j in range(3))))
    jax.device_get(r.fused_poses.t)
    del wpipe

    t0 = time.perf_counter()
    n_loops_closed = 0
    fused_R = []
    for i in range(0, ACC_FRAMES, ACC_CHUNK):
        chunk = acc_scans[i:i + ACC_CHUNK]
        res = apipe.process_chunk(
            *(tuple(jnp.stack([s[j] for s in chunk]) for j in range(3))))
        n_loops_closed += int(jax.device_get(res.loop_closed).sum())
        fused_R.append(np.asarray(jax.device_get(res.fused_poses.R)))
    acc_wall = time.perf_counter() - t0
    traj = np.concatenate(
        [np.asarray(jax.device_get(t)) for t in apipe.trajectory])
    fused_R = np.concatenate(fused_R)
    ate = ate_rmse(traj, gt)
    rpe_t, rpe_r = rpe(poses_to_mat(fused_R, traj),
                       poses_to_mat(gt_R, gt), delta=10)
    # corrected keyframe trajectory — what the reference dumps as
    # trajectory.pcd after correctPoses (mapOptmization.cpp:731-755): the
    # loop-closure corrections reach these retroactively, unlike the causal
    # live trajectory above.  RPE here separates odometry drift from the
    # live trajectory's loop-correction jumps (round-4 verdict item 6).
    n_kf = int(jax.device_get(apipe.mstate.n_kf))
    kf_t = np.asarray(jax.device_get(apipe.mstate.kf_t))[:n_kf]
    kf_R = np.asarray(jax.device_get(apipe.mstate.kf_R))[:n_kf]
    kf_time = np.asarray(jax.device_get(apipe.mstate.kf_time))[:n_kf]
    scan_period = acc_cfg.sensor.scan_period
    gt_idx = np.clip(np.round(kf_time / scan_period).astype(int), 0,
                     ACC_FRAMES - 1)
    ate_corr = ate_rmse(kf_t, gt[gt_idx])
    # delta=4 keyframes ~ 10-12 scans, comparable to the live delta=10
    rpe_tc, rpe_rc = rpe(poses_to_mat(kf_R, kf_t),
                         poses_to_mat(gt_R[gt_idx], gt[gt_idx]), delta=4)
    acc = {
        "accuracy_frames": ACC_FRAMES,
        "accuracy_course_m": round(2 * 2 * np.pi * 15.0, 1),
        "accuracy_ate_rmse_m": round(ate, 4),
        "accuracy_ate_corrected_m": round(ate_corr, 4),
        "accuracy_rpe_trans_m": round(rpe_t, 4),
        "accuracy_rpe_rot_deg": round(np.degrees(rpe_r), 4),
        "accuracy_rpe_trans_corrected_m": round(rpe_tc, 4),
        "accuracy_rpe_rot_corrected_deg": round(np.degrees(rpe_rc), 4),
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
    assert dsk["deskew_on_ate_m"] < dsk["deskew_off_ate_m"], (
        "de-skew did not reduce ATE on the distorted course: "
        f"{dsk['deskew_on_ate_m']} vs {dsk['deskew_off_ate_m']}")
    with open(__file__.rsplit("/", 1)[0] + "/ACCURACY.json", "w") as f:
        json.dump({**acc, **dsk}, f, indent=1)

    fps = median(windows)
    print(json.dumps({
        "metric": "vlp16_scan_to_map_pipeline",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
        "method": f"median-of-{N_REP}x{N_MEAS}, device_get-forced, K=4096",
        "windows_fps": [round(w, 2) for w in windows],
        "loop_on_fps": round(median(loop_windows), 2),
        "chunk_fps": round(median(chunk_windows), 2),
        "chunk_windows_fps": [round(w, 2) for w in chunk_windows],
        "stage_ms": stage_ms,
        **dsk,
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
