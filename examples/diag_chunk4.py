"""HONEST throughput measurement (round 5): every window is forced with
jax.device_get, never block_until_ready.

Round-5 finding (diag_chunk.py / diag_chunk2.py / diag_chunk3.py): over the
axon tunnel `jax.block_until_ready` can return BEFORE the remote computation
finishes (diag_chunk3: a "0.26 ms/scan" chunk window followed by a 2647 ms
device_get of the same 32x3 floats).  Every previously-published number that
relied on block_until_ready (per-scan 1000-2526 fps, chunk 7000-11800 fps)
is therefore unreliable; numbers that were followed by a data-dependent
device_get (chunk ~5.8 ms/scan, all-XLA 9.1 ms/scan) reproduce.  This script
re-measures the shipped paths with device_get forcing only:

  * per-scan path (front-end every scan, mapping every 3rd), K=256 / K=4096
  * chunk mode (lax.scan, C=32), same configs
  * loop-closure-enabled per-scan path
  * backend mix ablation: default (pallas seg+feat) vs feat=xla
  * per-stage device time: frontend / mapping / loop / pose-graph solve,
    each as a chained window forced once

Run:  python examples/diag_chunk4.py
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
from lego_loam_tpu.models.pipeline import LegoLoamPipeline

N_WARM, N_MEAS, N_REP = 6, 30, 3
C = 32


def build(cfg, n, seed0=0):
    world = syn.default_world(seed=0)
    poses = syn.circle_trajectory(n, radius=12.0, arc=0.9 * np.pi)
    out = []
    for k, (R, t) in enumerate(poses):
        xyz, valid, ring = syn.raycast(world, R, t, cfg.sensor, noise=0.02,
                                       rng=np.random.default_rng(seed0 + k))
        out.append((jnp.asarray(xyz, jnp.float32), jnp.asarray(valid),
                    jnp.asarray(ring, jnp.int32)))
    return out


def per_scan(cfg, scans, loop_every=10, label=""):
    pipe = LegoLoamPipeline(cfg, collect_stats=False,
                            loop_check_every=loop_every)
    t0 = time.perf_counter()
    for k in range(N_WARM):
        r = pipe.process_scan(*scans[k])
    jax.device_get(r.fused_pose.t)
    print(f"  ({label} warm+compile: {time.perf_counter()-t0:.1f} s)",
          flush=True)
    ws = []
    for rep in range(N_REP):
        base = N_WARM + rep * N_MEAS
        t0 = time.perf_counter()
        for k in range(base, base + N_MEAS):
            r = pipe.process_scan(*scans[k % len(scans)])
        jax.device_get(r.fused_pose.t)   # forces the whole state chain
        ws.append(N_MEAS / (time.perf_counter() - t0))
    ws.sort()
    print(f"{label:34s}: {1e3/ws[1]:7.2f} ms/scan -> {ws[1]:8.1f} fps "
          f"(windows {['%.0f' % w for w in ws]})", flush=True)
    return ws[1]


def chunked(cfg, scans, label=""):
    pipe = LegoLoamPipeline(cfg, collect_stats=False)
    stackc = lambda i: tuple(
        jnp.stack([scans[(i * C + k) % len(scans)][j] for k in range(C)])
        for j in range(3))
    t0 = time.perf_counter()
    r = pipe.process_chunk(*stackc(0))
    jax.device_get(r.fused_poses.t)
    print(f"  ({label} warm+compile: {time.perf_counter()-t0:.1f} s)",
          flush=True)
    ws = []
    for rep in range(N_REP):
        t0 = time.perf_counter()
        for i in (1, 2):
            r = pipe.process_chunk(*stackc(rep * 2 + i))
        jax.device_get(r.fused_poses.t)
        ws.append(2 * C / (time.perf_counter() - t0))
    ws.sort()
    print(f"{label:34s}: {1e3/ws[1]:7.2f} ms/scan -> {ws[1]:8.1f} fps "
          f"(windows {['%.0f' % w for w in ws]})", flush=True)
    return ws[1]


def stage_breakdown(cfg, scans):
    """Chained-window per-stage device time, device_get-forced."""
    from lego_loam_tpu.models import loop as lc
    from lego_loam_tpu.models import mapping as mp
    from lego_loam_tpu.models.pipeline import frontend_step
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
        return (time.perf_counter() - t0) / n * 1e3

    ms_fe = win(lambda: frontend_step(
        ostate, xyz, valid, ring, mstate.bef_mapped, mstate.aft_mapped,
        jnp.float32(1.2), acfg, acfg.sensor.use_ring)[2].t)

    _, feats, opose, _, _, _ = frontend_step(
        ostate, xyz, valid, ring, mstate.bef_mapped, mstate.aft_mapped,
        jnp.float32(1.2), acfg, acfg.sensor.use_ring)
    mfeats = feats._replace(less_sharp=ostate.ref_corner,
                            less_flat=ostate.ref_surf)
    ms_map = win(lambda: mp.mapping_step(
        mstate, mfeats, opose, jnp.float32(1.2), acfg)[1].t)
    ms_loop = win(lambda: lc.loop_closure_step(
        # non-donated copy each call: the jitted fn donates its arg
        jax.tree_util.tree_map(lambda x: x.copy(), mstate),
        jnp.float32(1.2), acfg)[1].fitness, n=10)
    ms_pg = win(lambda: solve_pose_graph(mstate, acfg).kf_t, n=10)
    print(f"stages ms: frontend={ms_fe:.2f} mapping={ms_map:.2f} "
          f"loop={ms_loop:.2f} pose_graph={ms_pg:.2f}", flush=True)
    return dict(frontend=ms_fe, mapping=ms_map, loop=ms_loop, graph=ms_pg)


def main():
    print(f"platform={jax.default_backend()}", flush=True)
    cfg256 = config_for("vlp16", deskew=False, max_keyframes=256)
    scans = build(cfg256, N_WARM + N_REP * N_MEAS)

    per_scan(cfg256, scans, label="per-scan K=256 default")
    per_scan(cfg256.replace(loop_closure_enabled=True), scans,
             label="per-scan K=256 loop-on")
    chunked(cfg256, scans, label="chunk C=32 K=256 default")

    cfgfx = cfg256.replace(feature_backend="xla")
    per_scan(cfgfx, scans, label="per-scan K=256 feat=xla")
    chunked(cfgfx, scans, label="chunk C=32 K=256 feat=xla")

    cfg4k = config_for("vlp16", deskew=False)   # shipping K=4096
    per_scan(cfg4k, scans, label="per-scan K=4096 default")
    chunked(cfg4k, scans, label="chunk C=32 K=4096 default")

    stage_breakdown(cfg256, scans)


if __name__ == "__main__":
    main()
