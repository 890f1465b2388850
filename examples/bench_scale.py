"""On-chip latency of the back-end programs at the DEFAULT pool capacity
(max_keyframes=4096, full block caps) — round-4 VERDICT item 4: the default
scale was never exercised.  Measures, on the default JAX platform:

  * solve_pose_graph at K=4096 with a full loop-edge set (the program that
    runs inline at every accepted loop closure, models/loop.py:121);
  * compact_keyframes at n_kf = K-1 (the inline pool-thinning trigger);
  * mapping_step with a full pool, both cached-map and refresh solves;
  * loop_closure_step end-to-end (detect + ICP + graph solve).

Prints one line per measurement; paste into SCALING.md §1.
Run: python examples/bench_scale.py [--cpu]
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
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache" if not args.cpu
                                   else ".jax_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from lego_loam_tpu import config_for
    from lego_loam_tpu.io import synthetic as syn
    from lego_loam_tpu.models import loop as lc
    from lego_loam_tpu.models import mapping as mp
    from lego_loam_tpu.models import posegraph as pg
    from lego_loam_tpu.utils.math3d import Pose

    cfg = config_for("vlp16", deskew=False)     # DEFAULT capacities
    K = cfg.max_keyframes
    print(f"platform={jax.devices()[0].platform} K={K} "
          f"caps=({cfg.kf_corner_cap},{cfg.kf_surf_cap},{cfg.kf_outlier_cap})"
          f" L={cfg.max_loop_edges}", flush=True)

    def timeit(name, fn, n=5):
        fn()                                     # compile + warm
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{name:34s} {dt:9.2f} ms", flush=True)
        return out

    # ---- populate a full pool from one real scan's geometry ----
    rng = np.random.default_rng(0)
    world = syn.default_world(seed=0)
    xyz, valid, ring = syn.raycast(world, np.eye(3), np.array([0, 0, 1.6]),
                                  cfg.sensor, noise=0.02, rng=rng)
    from lego_loam_tpu.ops.voxel import voxel_downsample

    pts_c, ok_c = voxel_downsample(jnp.asarray(xyz, jnp.float32),
                                   jnp.asarray(valid), cfg.leaf_scan_corner,
                                   cfg.kf_corner_cap)
    pts_s, ok_s = voxel_downsample(jnp.asarray(xyz, jnp.float32),
                                   jnp.asarray(valid), cfg.leaf_scan_surf,
                                   cfg.kf_surf_cap)

    n_kf = K - 1
    # two-lap circular trajectory (world-scale spacing ~0.3 m)
    a = 2 * np.pi * 2 * np.arange(n_kf) / n_kf
    t_all = np.stack([30 * np.sin(a), 30 * (1 - np.cos(a)),
                      np.zeros_like(a)], -1).astype(np.float32)
    c, s = np.cos(a), np.sin(a)
    R_all = np.zeros((n_kf, 3, 3), np.float32)
    R_all[:, 0, 0] = c; R_all[:, 0, 1] = -s
    R_all[:, 1, 0] = s; R_all[:, 1, 1] = c
    R_all[:, 2, 2] = 1.0

    state = mp.init_state(cfg)
    Rp = np.concatenate([np.eye(3, dtype=np.float32)[None], R_all[:-1]])
    tp = np.concatenate([np.zeros((1, 3), np.float32), t_all[:-1]])
    meas_R = np.einsum("kji,kjl->kil", Rp, R_all)
    meas_t = np.einsum("kji,kj->ki", Rp, t_all - tp)
    meas_R[0] = np.eye(3); meas_t[0] = 0
    state = state._replace(
        kf_R=jnp.asarray(np.concatenate([R_all, np.tile(np.eye(3, dtype=np.float32), (K - n_kf, 1, 1))])),
        kf_t=jnp.asarray(np.concatenate([t_all, np.zeros((K - n_kf, 3), np.float32)])),
        kf_meas_R=jnp.asarray(np.concatenate([meas_R, np.tile(np.eye(3, dtype=np.float32), (K - n_kf, 1, 1))])),
        kf_meas_t=jnp.asarray(np.concatenate([meas_t, np.zeros((K - n_kf, 3), np.float32)])),
        kf_corner=jnp.broadcast_to(pts_c, (K,) + pts_c.shape).copy(),
        kf_corner_valid=jnp.broadcast_to(ok_c, (K,) + ok_c.shape).copy(),
        kf_surf=jnp.broadcast_to(pts_s, (K,) + pts_s.shape).copy(),
        kf_surf_valid=jnp.broadcast_to(ok_s, (K,) + ok_s.shape).copy(),
        kf_time=jnp.arange(K, dtype=jnp.float32) * 0.55,
        n_kf=jnp.int32(n_kf),
        aft_mapped=Pose(jnp.asarray(R_all[-1]), jnp.asarray(t_all[-1])),
        bef_mapped=Pose(jnp.asarray(R_all[-1]), jnp.asarray(t_all[-1])),
    )
    # full loop-edge set
    L = cfg.max_loop_edges
    li = np.linspace(n_kf // 2, n_kf - 1, L).astype(np.int32)
    lj = li - n_kf // 2
    state = state._replace(
        loop_i=jnp.asarray(li), loop_j=jnp.asarray(lj),
        loop_w=jnp.full((L,), 100.0, jnp.float32),
        n_loops=jnp.int32(L))
    jax.block_until_ready(state.kf_surf)

    hbm = sum(np.prod(a.shape) * a.dtype.itemsize
              for a in jax.tree_util.tree_leaves(state)) / 1e6
    print(f"state HBM footprint: {hbm:.0f} MB", flush=True)

    timeit("solve_pose_graph (K=4096, L=128)",
           lambda: pg.solve_pose_graph(state, cfg))
    timeit("loop_closure_step (full pool)",
           lambda: lc.loop_closure_step(
               jax.tree_util.tree_map(jnp.copy, state),
               jnp.float32(K * 0.55), cfg))

    # mapping_step: cached-map and refresh variants
    from lego_loam_tpu.types import FeatureCloud, ScanFeatures, empty_feature_cloud

    def filled(n):
        return FeatureCloud(
            xyz=jnp.asarray(rng.normal(0, 10, (n, 3)), jnp.float32),
            ring=jnp.zeros((n,), jnp.int32),
            s=jnp.zeros((n,), jnp.float32),
            valid=jnp.ones((n,), bool))

    feats = ScanFeatures(
        sharp=empty_feature_cloud(cfg.max_sharp),
        less_sharp=filled(cfg.max_less_sharp),
        flat=empty_feature_cloud(cfg.max_flat),
        less_flat=filled(cfg.max_less_flat),
        outlier=empty_feature_cloud(cfg.max_outlier),
    )
    odom = Pose(jnp.asarray(R_all[-1]), jnp.asarray(t_all[-1] + 0.1))

    def run_map(stale):
        st = jax.tree_util.tree_map(jnp.copy, state)
        st = st._replace(map_stale=jnp.bool_(stale),
                         map_age=jnp.int32(0))
        st2, T = mp.mapping_step(st, feats, odom, jnp.float32(K * 0.55), cfg,
                                 compact_inline=False)
        return T.t

    timeit("mapping_step (cached local map)", lambda: run_map(False))
    timeit("mapping_step (map refresh)", lambda: run_map(True))
    timeit("compact_keyframes (n_kf=4095)",
           lambda: mp.compact_keyframes(
               jax.tree_util.tree_map(jnp.copy, state), cfg))


if __name__ == "__main__":
    main()
