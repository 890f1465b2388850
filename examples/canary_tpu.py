"""Canary: compile+run each TPU-default device program in isolation on the
real chip, pulling results synchronously so a failure names its program.

Usage: python examples/canary_tpu.py [stage ...]
Stages: frontend frontend_xla mapping loop chunk
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(msg):
    print(f"[canary +{time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


T0 = time.perf_counter()


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from lego_loam_tpu import config_for
    from lego_loam_tpu.io import synthetic as syn
    from lego_loam_tpu.models import mapping as mp
    from lego_loam_tpu.models import odometry as odo
    from lego_loam_tpu.models.pipeline import frontend_step
    from lego_loam_tpu.utils.math3d import Pose

    stages = sys.argv[1:] or ["frontend"]
    log(f"platform={jax.devices()[0].platform} stages={stages}")

    cfg = config_for("vlp16", deskew=False, max_keyframes=256)
    world = syn.default_world(seed=0)
    xyz, valid, ring = syn.raycast(
        world, np.eye(3), np.array([0.0, 0.0, 1.6]), cfg.sensor,
        noise=0.02, rng=np.random.default_rng(0))
    xyz = jnp.asarray(xyz, jnp.float32)
    valid = jnp.asarray(valid)
    ring = jnp.asarray(ring, jnp.int32)
    ident = Pose.identity()

    def run_frontend(c, tag):
        ostate = odo.init_state(c)
        log(f"{tag}: dispatch")
        out = frontend_step(ostate, xyz, valid, ring, ident, ident,
                            jnp.float32(0.0), c, True)
        stats = np.asarray(out[5])
        log(f"{tag}: OK stats={stats.tolist()}")
        return out

    for stage in stages:
        if stage == "frontend":
            run_frontend(cfg, "frontend(default auto)")
        elif stage == "frontend_xla":
            run_frontend(cfg.replace(
                segmentation_backend="xla", segstats_backend="scatter",
                feature_backend="xla", odom_mode="two_step"),
                "frontend(all-xla two_step)")
        elif stage == "fe_seg_pallas":
            run_frontend(cfg.replace(
                segstats_backend="scatter", feature_backend="xla",
                odom_mode="two_step"), "frontend(seg pallas only)")
        elif stage == "fe_segstats":
            run_frontend(cfg.replace(
                segmentation_backend="xla", feature_backend="xla",
                odom_mode="two_step"), "frontend(segstats matmul only)")
        elif stage == "fe_feat_pallas":
            run_frontend(cfg.replace(
                segmentation_backend="xla", segstats_backend="scatter",
                odom_mode="two_step"), "frontend(features pallas only)")
        elif stage == "fe_block":
            run_frontend(cfg.replace(
                segmentation_backend="xla", segstats_backend="scatter",
                feature_backend="xla"), "frontend(block GN only)")
        elif stage == "mapping":
            ostate = odo.init_state(cfg)
            out = frontend_step(ostate, xyz, valid, ring, ident, ident,
                                jnp.float32(0.0), cfg, True)
            ostate, feats = out[0], out[1]
            mstate = mp.init_state(cfg)
            mfeats = feats._replace(less_sharp=ostate.ref_corner,
                                    less_flat=ostate.ref_surf)
            log("mapping: dispatch")
            mstate, mpose = mp.mapping_step(
                mstate, mfeats, out[2], jnp.float32(0.0), cfg)
            log(f"mapping: OK t={np.asarray(mpose.t).round(3).tolist()}")
        elif stage == "loop":
            from lego_loam_tpu.models import loop as lc
            mstate = mp.init_state(cfg)
            # fabricate a few keyframes so the gather paths run
            n = 8
            mstate = mstate._replace(n_kf=jnp.int32(n))
            log("loop: dispatch")
            mstate, res = lc.loop_closure_step(mstate, jnp.float32(100.0), cfg)
            log(f"loop: OK closed={bool(res.closed)}")
        else:
            raise SystemExit(f"unknown stage {stage}")
    log("ALL OK")


if __name__ == "__main__":
    main()
