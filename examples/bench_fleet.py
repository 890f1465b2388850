"""Fleet-replay throughput: B sequences vmapped into one device program
(models/batch.BatchPipeline), aggregate scans/s on one chip.

The reference binds one sensor stream to one machine (4 ROS processes,
run.launch:13-16); reprocessing a fleet's worth of logs is its unreachable
configuration.  Here the whole pipeline vmaps over sequences, so kernels get
B times wider and the MXU/VPU amortize per-op overheads across the fleet.
Prints aggregate scans/s for each B.
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

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from lego_loam_tpu import config_for
    from lego_loam_tpu.io import synthetic as syn
    from lego_loam_tpu.models.batch import BatchPipeline

    cfg = config_for("vlp16", deskew=False, max_keyframes=256)
    world = syn.default_world(seed=0)
    C, n_chunks = 16, 5
    n = C * n_chunks

    for B in (2, 4, 8):
        # B distinct trajectories (different arcs) over the same world
        seqs = []
        for b in range(B):
            poses = syn.circle_trajectory(
                n, radius=10.0 + b, arc=(0.5 + 0.05 * b) * np.pi)
            xyzs, vals, rings = [], [], []
            for k, (R, t) in enumerate(poses):
                xyz, valid, ring = syn.raycast(
                    world, R, t, cfg.sensor, noise=0.02,
                    rng=np.random.default_rng(1000 * b + k))
                xyzs.append(xyz)
                vals.append(valid)
                rings.append(ring)
            seqs.append((np.stack(xyzs), np.stack(vals), np.stack(rings)))
        xyz = jnp.asarray(np.stack([s[0] for s in seqs]), jnp.float32)
        val = jnp.asarray(np.stack([s[1] for s in seqs]))
        ring = jnp.asarray(np.stack([s[2] for s in seqs]), jnp.int32)

        bp = BatchPipeline(cfg, batch=B)
        # warm: 2 chunks (compile + steady state)
        res = bp.process_chunk(xyz[:, :C], val[:, :C], ring[:, :C])
        res = bp.process_chunk(xyz[:, C:2 * C], val[:, C:2 * C],
                               ring[:, C:2 * C])
        jax.block_until_ready(res.fused_poses.t)

        window_fps = []
        for i in range(2, n_chunks):
            sl = slice(i * C, (i + 1) * C)
            t0 = time.perf_counter()
            res = bp.process_chunk(xyz[:, sl], val[:, sl], ring[:, sl])
            jax.block_until_ready(res.fused_poses.t)
            window_fps.append(B * C / (time.perf_counter() - t0))
        window_fps.sort()
        print(f"B={B}: best {window_fps[-1]:8.1f} scans/s aggregate, "
              f"median {window_fps[len(window_fps) // 2]:8.1f} "
              f"({B}x{C} scans/chunk)", flush=True)


if __name__ == "__main__":
    main()
