"""Chunked-replay throughput on the current default device (diagnostic).

Measures process_chunk (C scans per device dispatch, models/pipeline.py
chunk_steps) in steady state — the sequence-replay throughput mode.  Prints
per-C fps for a few chunk sizes to pick the bench configuration.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from lego_loam_tpu import config_for
    from lego_loam_tpu.io import synthetic as syn
    from lego_loam_tpu.models.pipeline import LegoLoamPipeline

    cfg = config_for("vlp16", deskew=False, max_keyframes=256)
    world = syn.default_world(seed=0)
    n = 192
    poses = syn.circle_trajectory(n, radius=12.0, arc=0.9 * np.pi)
    scans = []
    for k, (R, t) in enumerate(poses):
        xyz, valid, ring = syn.raycast(
            world, R, t, cfg.sensor, noise=0.02,
            rng=np.random.default_rng(k))
        scans.append((xyz, valid, ring))

    for C in (16, 32):
        pipe = LegoLoamPipeline(cfg, collect_stats=False)
        xyzs = jnp.stack([jnp.asarray(s[0], jnp.float32)
                          for s in scans])
        vals = jnp.stack([jnp.asarray(s[1]) for s in scans])
        rings = jnp.stack([jnp.asarray(s[2], jnp.int32) for s in scans])
        # warm: first two chunks (compile + cache load)
        res = pipe.process_chunk(xyzs[:C], vals[:C], rings[:C])
        res = pipe.process_chunk(xyzs[C:2 * C], vals[C:2 * C], rings[C:2 * C])
        jax.block_until_ready(res.fused_poses.t)
        # several measurement windows; report best + median so one
        # tunnel-latency hiccup cannot define the figure
        window_fps = []
        for i in range(2 * C, n - C + 1, C):
            t0 = time.perf_counter()
            res = pipe.process_chunk(xyzs[i:i + C], vals[i:i + C],
                                     rings[i:i + C])
            jax.block_until_ready(res.fused_poses.t)
            window_fps.append(C / (time.perf_counter() - t0))
        window_fps.sort()
        best = window_fps[-1]
        med = window_fps[len(window_fps) // 2]
        print(f"C={C}: best {best:.1f} fps ({1e3 / best:.2f} ms/scan), "
              f"median {med:.1f} fps over {len(window_fps)} windows")


if __name__ == "__main__":
    main()
