"""Diagnose the chunk-mode vs per-scan throughput gap (round-4 VERDICT §weak-2).

BENCH_r04 reported per-scan async 2526 fps vs chunk mode 173 fps — chunk mode
(zero dispatch overhead, same math under lax.scan) 14.5x SLOWER, which is
physically backwards.  This script isolates where chunk-mode device time goes
by timing, on the current default platform:

  A. per-scan path, block EVERY scan        (true per-scan latency)
  B. per-scan path, block once per window   (bench-style pipelined number)
  C. chunk_steps as shipped                 (frontend + cond-mapping + fuse)
  D. chunk variant: frontend only           (no mapping cond at all)
  E. chunk variant: mapping every scan      (cond replaced by direct call)
  F. chunk variant: frontend + cond-mapping, no donation

plus XLA cost analysis (flops / bytes accessed) for each compiled program.

Run:  python examples/diag_chunk.py [C] [K]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  __file__.rsplit("/", 2)[0] + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from lego_loam_tpu import config_for
from lego_loam_tpu.io import synthetic as syn
from lego_loam_tpu.models import mapping as mp
from lego_loam_tpu.models import odometry as odo
from lego_loam_tpu.models.fusion import fuse_pose
from lego_loam_tpu.models.pipeline import LegoLoamPipeline, chunk_steps, frontend_step
from lego_loam_tpu.utils.precision import f32_matmuls

C = int(sys.argv[1]) if len(sys.argv) > 1 else 32
K = int(sys.argv[2]) if len(sys.argv) > 2 else 256


def build(cfg, n, seed0=0):
    world = syn.default_world(seed=0)
    poses = syn.circle_trajectory(n, radius=12.0, arc=0.9 * np.pi)
    scans = []
    for k, (R, t) in enumerate(poses):
        xyz, valid, ring = syn.raycast(world, R, t, cfg.sensor, noise=0.02,
                                       rng=np.random.default_rng(seed0 + k))
        scans.append((jnp.asarray(xyz, jnp.float32), jnp.asarray(valid),
                      jnp.asarray(ring, jnp.int32)))
    return scans


def cost(compiled, label):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        print(f"  [{label}] flops={ca.get('flops', 0):.3e} "
              f"bytes={ca.get('bytes accessed', 0):.3e}")
    except Exception as e:  # noqa: BLE001
        print(f"  [{label}] cost_analysis unavailable: {e}")


def chunk_variant(mode):
    """mode: 'frontend' (no mapping), 'always' (mapping every scan, no cond),
    'shipped-nodonate' (same as chunk_steps, without donation)."""

    @partial(jax.jit, static_argnames=("cfg", "use_ring"))
    @f32_matmuls
    def run(ostate, mstate, xyz, valid, ring, frames, times, cfg, use_ring):
        def step(carry, inp):
            ostate, mstate = carry
            xyz_k, valid_k, ring_k, frame_k, t_k = inp
            ostate, feats, opose, rel, fused_fe, stats = frontend_step(
                ostate, xyz_k, valid_k, ring_k,
                mstate.bef_mapped, mstate.aft_mapped, t_k, cfg, use_ring)
            mfeats = feats._replace(
                less_sharp=ostate.ref_corner, less_flat=ostate.ref_surf)
            if mode == "frontend":
                mpose = mstate.aft_mapped
            elif mode == "always":
                mstate, mpose = mp.mapping_step(mstate, mfeats, opose, t_k, cfg)
            else:
                do_map = (frame_k % cfg.mapping_process_every) == 0
                mstate, mpose = jax.lax.cond(
                    do_map,
                    lambda m: mp.mapping_step(m, mfeats, opose, t_k, cfg),
                    lambda m: (m, m.aft_mapped),
                    mstate)
            fused = fuse_pose(mstate, opose)
            return (ostate, mstate), (opose, fused)

        (ostate, mstate), outs = jax.lax.scan(
            step, (ostate, mstate), (xyz, valid, ring, frames, times))
        return ostate, mstate, outs

    return run


def main():
    print(f"platform={jax.default_backend()} devices={jax.devices()} "
          f"C={C} K={K}")
    cfg = config_for("vlp16", deskew=False, max_keyframes=K)
    n_warm, n_meas = 6, 30
    scans = build(cfg, max(n_warm + 2 * n_meas, 3 * C))

    # ---- A/B: per-scan ----
    pipe = LegoLoamPipeline(cfg, collect_stats=False)
    for k in range(n_warm):
        pipe.process_scan(*scans[k])
    jax.block_until_ready(pipe.trajectory[-1])
    # A: block every scan
    lat = []
    for k in range(n_warm, n_warm + n_meas):
        t0 = time.perf_counter()
        r = pipe.process_scan(*scans[k])
        jax.block_until_ready(r.fused_pose.t)
        lat.append(time.perf_counter() - t0)
    lat = np.array(lat)
    print(f"A per-scan blocked : mean {lat.mean()*1e3:7.2f} ms  "
          f"median {np.median(lat)*1e3:7.2f} ms  -> {1/np.median(lat):8.1f} fps")
    # B: window
    base = n_warm + n_meas
    t0 = time.perf_counter()
    for k in range(base, base + n_meas):
        r = pipe.process_scan(*scans[k])
    jax.block_until_ready(r.fused_pose.t)
    w = time.perf_counter() - t0
    print(f"B per-scan window  : {w/n_meas*1e3:7.2f} ms/scan -> "
          f"{n_meas/w:8.1f} fps")

    # ---- C: shipped chunk mode ----
    def stackc(i, src):
        return tuple(jnp.stack([src[i * C + k][j] for k in range(C)])
                     for j in range(3))

    src = [scans[k % len(scans)] for k in range(3 * C)]
    cpipe = LegoLoamPipeline(cfg, collect_stats=False)
    t0 = time.perf_counter()
    r = cpipe.process_chunk(*stackc(0, src))
    jax.block_until_ready(r.fused_poses.t)
    print(f"  (chunk compile+first: {time.perf_counter()-t0:.1f} s)")
    t0 = time.perf_counter()
    for i in (1, 2):
        r = cpipe.process_chunk(*stackc(i, src))
    jax.block_until_ready(r.fused_poses.t)
    w = time.perf_counter() - t0
    print(f"C chunk shipped    : {w/(2*C)*1e3:7.2f} ms/scan -> "
          f"{2*C/w:8.1f} fps")

    # ---- D/E/F: chunk variants ----
    for label, mode in (("D chunk frontend-only", "frontend"),
                        ("E chunk map-every-scan", "always"),
                        ("F chunk cond-no-donate", "shipped-nodonate")):
        run = chunk_variant(mode)
        ostate, mstate = odo.init_state(cfg), mp.init_state(cfg)
        xyzs, valids, rings = stackc(0, src)
        frames = jnp.arange(C, dtype=jnp.int32)
        times = jnp.arange(C, dtype=jnp.float32) * cfg.sensor.scan_period
        t0 = time.perf_counter()
        ostate, mstate, outs = run(ostate, mstate, xyzs, valids, rings,
                                   frames, times, cfg, cfg.sensor.use_ring)
        jax.block_until_ready(outs[1].t)
        print(f"  ({label} compile+first: {time.perf_counter()-t0:.1f} s)")
        t0 = time.perf_counter()
        for i in (1, 2):
            xyzs, valids, rings = stackc(i, src)
            frames = frames + C
            ostate, mstate, outs = run(ostate, mstate, xyzs, valids, rings,
                                       frames, times, cfg, cfg.sensor.use_ring)
        jax.block_until_ready(outs[1].t)
        w = time.perf_counter() - t0
        print(f"{label:19s}: {w/(2*C)*1e3:7.2f} ms/scan -> {2*C/w:8.1f} fps")


if __name__ == "__main__":
    main()
