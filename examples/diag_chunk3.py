"""Chunk-slowness isolation round 3: backend ablation under lax.scan.

Rounds 1-2 (diag_chunk.py on the real chip): per-scan blocked 0.59 ms but
chunk_steps 5.8 ms/scan, and frontend-ONLY under lax.scan is equally slow
(5.84 ms/scan) — so the regression is inside the front-end ops when they run
inside a while loop.  Prime suspect: the Pallas custom calls (segmentation
CCL, feature picks, fused NN) behave differently under `lax.scan` than as
top-level ops on the axon platform.

This round times the frontend-only scan variant under each backend config:

  P. shipped defaults (pallas segmentation + features)
  X. all-XLA fallbacks (segmentation_backend=xla, segstats_backend=scatter,
     feature_backend=xla, nn_backend=xla)
  S. pallas segmentation only (features=xla)
  F. pallas features only (segmentation=xla)

Run:  python examples/diag_chunk3.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  __file__.rsplit("/", 2)[0] + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from lego_loam_tpu import config_for
from lego_loam_tpu.io import synthetic as syn
from lego_loam_tpu.models import odometry as odo
from lego_loam_tpu.models.pipeline import frontend_step
from lego_loam_tpu.utils.math3d import Pose
from lego_loam_tpu.utils.precision import f32_matmuls

C = 32


def build(cfg, n):
    world = syn.default_world(seed=0)
    poses = syn.circle_trajectory(n, radius=12.0, arc=0.9 * np.pi)
    out = []
    for k, (R, t) in enumerate(poses):
        xyz, valid, ring = syn.raycast(world, R, t, cfg.sensor, noise=0.02,
                                       rng=np.random.default_rng(k))
        out.append((jnp.asarray(xyz, jnp.float32), jnp.asarray(valid),
                    jnp.asarray(ring, jnp.int32)))
    return out


def frontend_chunk(cfg):
    use_ring = cfg.sensor.use_ring

    @jax.jit
    @f32_matmuls
    def run(ostate, xyz, valid, ring, times):
        def step(ostate, inp):
            xyz_k, valid_k, ring_k, t_k = inp
            bef = aft = Pose.identity()
            ostate, feats, opose, rel, fused_fe, stats = frontend_step(
                ostate, xyz_k, valid_k, ring_k, bef, aft, t_k, cfg, use_ring)
            return ostate, (opose, fused_fe)

        ostate, outs = jax.lax.scan(step, ostate, (xyz, valid, ring, times))
        return ostate, outs

    return run


def main():
    print(f"platform={jax.default_backend()} C={C}")
    variants = {
        "P shipped-pallas": {},
        "X all-xla": dict(segmentation_backend="xla",
                          segstats_backend="scatter",
                          feature_backend="xla", nn_backend="xla"),
        "S pallas-seg-only": dict(feature_backend="xla", nn_backend="xla"),
        "F pallas-feat-only": dict(segmentation_backend="xla",
                                   segstats_backend="scatter",
                                   nn_backend="xla"),
    }
    base = config_for("vlp16", deskew=False, max_keyframes=256)
    scans = build(base, 3 * C)
    stackc = lambda i: tuple(
        jnp.stack([scans[i * C + k][j] for k in range(C)]) for j in range(3))
    times0 = jnp.arange(C, dtype=jnp.float32) * base.sensor.scan_period

    for label, kw in variants.items():
        cfg = config_for("vlp16", deskew=False, max_keyframes=256, **kw)
        run = frontend_chunk(cfg)
        ostate = odo.init_state(cfg)
        t0 = time.perf_counter()
        ostate, outs = run(ostate, *stackc(0), times0)
        jax.block_until_ready(outs[1].t)
        print(f"  ({label} compile+first: {time.perf_counter()-t0:.1f} s)",
              flush=True)
        t0 = time.perf_counter()
        for i in (1, 2):
            ostate, outs = run(ostate, *stackc(i), times0)
        jax.block_until_ready(outs[1].t)
        w = time.perf_counter() - t0
        # forcing check: block_until_ready over the axon tunnel may ack
        # before the remote computation finishes; device_get of the result
        # cannot lie.  If w_get >> w, the blocked number is fake.
        t0 = time.perf_counter()
        _ = jax.device_get(outs[1].t)
        w_get = time.perf_counter() - t0
        print(f"{label:20s}: {w/(2*C)*1e3:7.2f} ms/scan -> {2*C/w:8.1f} fps"
              f"   (+device_get {w_get*1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
