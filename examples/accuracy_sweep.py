"""Accuracy of the shipping TPU-default backends vs the reference-faithful
paths, measured as trajectory RMSE vs ground truth on a synthetic sequence.

VERDICT r2 weakness 4: the default config (nn_exact=False approx_min_k,
Pallas feature/segmentation kernels, matmul cluster stats, block GN) was
never parity-tested at the trajectory level.  This sweep isolates each knob.
Run on the real chip (default platform) or --cpu.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--sensor", type=str, default="vlp16")
    ap.add_argument("--configs", type=str, default="")
    ap.add_argument("--precision", type=str, default="",
                    help="jax default_matmul_precision override, e.g. "
                         "'highest' (float32 MXU passes) — isolates bf16 "
                         "matmul error from algorithmic deltas")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.precision:
        jax.config.update("jax_default_matmul_precision", args.precision)
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache" if not args.cpu
                                   else ".jax_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from lego_loam_tpu import config_for
    from lego_loam_tpu.io import synthetic as syn
    from lego_loam_tpu.models.pipeline import LegoLoamPipeline

    base = dict(deskew=False, max_keyframes=256)
    sensor = args.sensor
    VARIANTS = {
        "default": {},
        "exact_nn": dict(nn_exact=True),
        "exact_nn_xla": dict(nn_exact=True, nn_backend="xla"),
        "xla_feats": dict(feature_backend="xla", sector_parallel=True),
        "seq_feats": dict(feature_backend="xla", sector_parallel=False),
        "xla_seg": dict(segmentation_backend="xla",
                        segstats_backend="scatter"),
        "two_step": dict(odom_mode="two_step"),
        "faithful": dict(nn_exact=True, nn_backend="xla",
                         feature_backend="xla", sector_parallel=False,
                         segmentation_backend="xla",
                         segstats_backend="scatter", odom_mode="two_step"),
    }
    names = (args.configs.split(",") if args.configs
             else list(VARIANTS.keys()))

    world = syn.default_world(seed=0)
    n = args.frames
    spec = config_for(sensor).sensor
    poses = syn.circle_trajectory(96, radius=12.0, arc=0.9 * np.pi)[:n]
    gt = np.asarray([t for (_, t) in poses]) - poses[0][1]
    scans = []
    for k, (R, t) in enumerate(poses):
        xyz, valid, ring = syn.raycast(world, R, t, spec, noise=0.02,
                                       rng=np.random.default_rng(k))
        scans.append((jnp.asarray(xyz, jnp.float32), jnp.asarray(valid),
                      jnp.asarray(ring, jnp.int32)))

    for name in names:
        cfg = config_for(sensor, **base, **VARIANTS[name])
        t0 = time.perf_counter()
        pipe = LegoLoamPipeline(cfg, collect_stats=False)
        for s in scans:
            pipe.process_scan(*s)
        traj = np.asarray([np.asarray(t) for t in pipe.trajectory])
        rmse = float(np.sqrt(np.mean(np.sum((traj - gt) ** 2, axis=1))))
        final = float(np.linalg.norm(traj[-1] - gt[-1]))
        print(f"{name:14s} rmse={rmse:7.3f} m  final={final:7.3f} m  "
              f"n_kf={int(pipe.mstate.n_kf):3d}  "
              f"({time.perf_counter() - t0:6.1f} s)", flush=True)


if __name__ == "__main__":
    main()
