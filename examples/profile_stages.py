"""Stage-level timing breakdown on the current default device.

Measures steady-state per-call wall time of the two jitted programs
(frontend_step, mapping_step) with blocking, plus the pipelined end-to-end
loop, to show where each scan's budget goes.  Diagnostic only (not a bench).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, n=20):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    import jax
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


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
    from lego_loam_tpu.models.pipeline import LegoLoamPipeline, frontend_step

    cfg = config_for("vlp16", deskew=False, max_keyframes=256)
    world = syn.default_world(seed=0)
    poses = syn.circle_trajectory(24, radius=12.0, arc=0.5 * np.pi)
    scans = []
    for k, (R, t) in enumerate(poses):
        xyz, valid, ring = syn.raycast(world, R, t, cfg.sensor, noise=0.02,
                                       rng=np.random.default_rng(k))
        scans.append((jnp.asarray(xyz, jnp.float32), jnp.asarray(valid),
                      jnp.asarray(ring, jnp.int32)))

    pipe = LegoLoamPipeline(cfg, collect_stats=False)
    for k in range(len(scans)):
        pipe.process_scan(*scans[k])
    jax.block_until_ready(pipe.trajectory[-1])

    xyz, valid, ring = scans[-1]
    ostate, mstate = pipe.ostate, pipe.mstate

    def fe():
        return frontend_step(ostate, xyz, valid, ring,
                             mstate.bef_mapped, mstate.aft_mapped,
                             jnp.float32(0.0), cfg, cfg.sensor.use_ring)

    ms_fe = timed(fe)

    # --- frontend internals breakdown ---
    from lego_loam_tpu.ops.compaction import segment_scan
    from lego_loam_tpu.ops.features import extract_features
    from lego_loam_tpu.ops.projection import project_scan

    proj = jax.jit(lambda x, v, r: project_scan(x, v, cfg, r))

    def pr():
        return proj(xyz, valid, ring)

    ms_proj = timed(pr)
    img = pr()

    seg = jax.jit(lambda im: segment_scan(im, cfg))

    def sg():
        return seg(img)

    ms_seg = timed(sg)
    packed, o_rel, ground, _segm = sg()

    featf = jax.jit(lambda p, o: extract_features(p, o, cfg))

    def ft():
        return featf(packed, o_rel)

    ms_feat = timed(ft)
    feats0 = ft()

    ostep = jax.jit(lambda st, f: odo.odometry_step(st, f, cfg))

    def od():
        return ostep(ostate, feats0)

    ms_odo = timed(od)

    out = fe()
    feats, opose = out[1], out[2]
    mfeats = feats._replace(less_sharp=ostate.ref_corner,
                            less_flat=ostate.ref_surf)

    # mapping_step donates its state: time a rebind loop, like real callers
    import jax.tree_util as jtu

    def clone(s):
        return jtu.tree_map(lambda a: jnp.array(a, copy=True), s)

    st = clone(mstate)
    st, _ = mp.mapping_step(st, mfeats, opose, jnp.float32(2.0), cfg)  # warm
    st = clone(mstate)
    jax.block_until_ready(st.kf_t)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        st, mpose_t = mp.mapping_step(st, mfeats, opose, jnp.float32(2.0), cfg)
    jax.block_until_ready(mpose_t.t)
    ms_map = (time.perf_counter() - t0) / n * 1e3

    # --- mapping internals breakdown ---
    from lego_loam_tpu.ops.voxel import voxel_downsample

    T_pred = mp.predict_pose(mstate, opose)

    gather = jax.jit(lambda st, c: mp._gather_local_map(st, c, cfg))

    def g():
        return gather(mstate, T_pred.t)

    ms_gather = timed(g)
    cm, cmv, sm, smv = g()

    scan_ds = jax.jit(lambda x, v: voxel_downsample(
        x, v, cfg.leaf_scan_surf, cfg.max_scan_surf_ds))

    def sds():
        return scan_ds(mfeats.less_flat.xyz, mfeats.less_flat.valid)

    ms_sds = timed(sds)
    cp, co = jax.jit(lambda x, v: voxel_downsample(
        x, v, cfg.leaf_scan_corner, cfg.max_scan_corner_ds))(
            mfeats.less_sharp.xyz, mfeats.less_sharp.valid)
    sp, so = sds()

    def s2m():
        return mp.scan_to_map(T_pred, cp, co, sp, so, cm, cmv, sm, smv, cfg)

    ms_s2m = timed(s2m)

    # upload-only cost: move one scan host->device and block
    xyz_np = np.asarray(xyz)
    valid_np = np.asarray(valid)
    ring_np = np.asarray(ring)

    def upload():
        return jax.device_put((xyz_np, valid_np, ring_np))

    ms_up = timed(upload)

    # trivial dispatch round-trip latency
    one = jnp.ones((8, 8), jnp.float32)
    tiny = jax.jit(lambda x: x + 1.0)
    tiny(one)

    def rt():
        return tiny(one)

    ms_rt = timed(rt)

    print(f"frontend_step (blocked): {ms_fe:8.2f} ms")
    print(f"  project_scan:          {ms_proj:8.2f} ms")
    print(f"  segment_scan:          {ms_seg:8.2f} ms")
    print(f"  extract_features:      {ms_feat:8.2f} ms")
    print(f"  odometry_step:         {ms_odo:8.2f} ms")
    print(f"mapping_step  (blocked): {ms_map:8.2f} ms "
          f"(every {cfg.mapping_process_every} scans -> "
          f"{ms_map / cfg.mapping_process_every:.2f} ms/scan)")
    print(f"  gather_local_map:      {ms_gather:8.2f} ms")
    print(f"  scan voxel downsample: {ms_sds:8.2f} ms")
    print(f"  scan_to_map solve:     {ms_s2m:8.2f} ms")
    print(f"scan upload   (blocked): {ms_up:8.2f} ms")
    print(f"tiny dispatch (blocked): {ms_rt:8.2f} ms")


if __name__ == "__main__":
    main()
