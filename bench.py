"""Benchmark: full SLAM pipeline frames/s on synthetic VLP-16 scans.

Measures the end-to-end per-scan latency (front-end jit + scan-to-map jit on
its reference cadence) in steady state on the default JAX platform (the real
TPU chip under the driver).  Baseline: the reference claims real-time 10 Hz
VLP-16 operation on its target CPU (reference: README.md:3,106; BASELINE.md),
so vs_baseline = fps / 10.

Robustness: the measurement runs in a CHILD process and is retried on
failure — the tunneled TPU occasionally drops a window mid-run (BENCH_r02
recorded rc=1 from one such FAILED_PRECONDITION; the identical program ran
green before and after), and a dead TPU context cannot be revived in-process.
The final attempt falls back to the conservative all-XLA backends so a
systematically-broken Pallas path still yields an honest number instead of a
crash.

Prints ONE JSON line (extra keys document methodology: "method" names the
window policy, "windows_fps" the raw windows, "loop_on_fps" the
loop-closure-enabled configuration at loop_check_every=10 — the reference's
1 Hz loop thread analog, mapOptmization.cpp:802-812).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

N_WARM, N_MEAS, N_REP = 6, 30, 3


def measure(fallback: bool) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 1)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from lego_loam_tpu import config_for
    from lego_loam_tpu.io import synthetic as syn
    from lego_loam_tpu.models.pipeline import LegoLoamPipeline

    overrides = {}
    if fallback:
        overrides = dict(segmentation_backend="xla", segstats_backend="scatter",
                         feature_backend="xla", nn_backend="xla")
    cfg = config_for(
        "vlp16", deskew=False,
        max_keyframes=256,          # bounded pool for the short bench run
        **overrides,
    )
    world = syn.default_world(seed=0)
    n_total = N_WARM + N_REP * N_MEAS
    poses = syn.circle_trajectory(n_total, radius=12.0, arc=0.9 * np.pi)

    scans = []
    for k, (R, t) in enumerate(poses):
        xyz, valid, ring = syn.raycast(
            world, R, t, cfg.sensor, noise=0.02,
            rng=np.random.default_rng(k))
        scans.append((
            jnp.asarray(xyz, jnp.float32),
            jnp.asarray(valid),
            jnp.asarray(ring, jnp.int32),
        ))

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

    windows = run_windows(cfg, loop_every=10)
    # loop-closure-enabled configuration: same scans, 1-in-10 loop checks
    loop_windows = run_windows(
        cfg.replace(loop_closure_enabled=True), loop_every=10)

    fps = max(windows)
    print(json.dumps({
        "metric": "vlp16_scan_to_map_pipeline",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
        "method": f"best-of-{N_REP}x{N_MEAS}",
        "windows_fps": [round(w, 2) for w in windows],
        "median_fps": round(sorted(windows)[N_REP // 2], 2),
        "loop_on_fps": round(max(loop_windows), 2),
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
