"""Wall-clock of the sharded back-end programs on the VIRTUAL 8-device CPU
mesh.  FUNCTIONAL-ONLY numbers: host-CPU "devices" share two vCPUs and
emulated collectives, so these timings bear no relation to a real pod slice —
they exist to show the composed sharded programs execute, stay fixed-shape,
and to catch wall-clock regressions in the sharded code paths themselves.
(The real-chip anchor lives in bench.py / SCALING.md §1.)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def timed(fn, reps=5):
    fn()  # warm (compile)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main() -> None:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as ge
    from lego_loam_tpu.io import synthetic as syn
    from lego_loam_tpu.models import mapping as mp
    from lego_loam_tpu.models import odometry as odo
    from lego_loam_tpu.models.pipeline import frontend_step
    from lego_loam_tpu.ops.voxel import voxel_downsample
    from lego_loam_tpu.parallel.backend_sharded import backend_step_sharded
    from lego_loam_tpu.parallel.graph import solve_pose_graph_sharded
    from lego_loam_tpu.parallel.map_sharded import knn_sharded
    from lego_loam_tpu.utils.math3d import Pose

    cfg = ge._small_cfg()
    n_dev = min(8, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("map",))
    print(f"virtual mesh: {n_dev} CPU devices (functional-only timings)")

    # pose-graph solve on a drifted chain
    state = mp.init_state(cfg)
    K = cfg.max_keyframes
    kf_t = np.cumsum(
        np.tile([1.0, 0.05, 0.0], (K, 1)) * (np.arange(K) < 24)[:, None],
        axis=0).astype(np.float32)
    state = state._replace(kf_t=jnp.asarray(kf_t), n_kf=jnp.int32(24))
    ms = timed(lambda: solve_pose_graph_sharded(state, cfg, mesh, axis="map"))
    print(f"pose-graph solve (edge-sharded, {cfg.pg_gn_iters} GN x "
          f"exact direct): {ms:8.1f} ms")

    # map-sharded 5-NN
    rng = np.random.default_rng(0)
    M = 1024 * n_dev
    mpts = jnp.asarray(rng.normal(size=(M, 3)), jnp.float32)
    mval = jnp.ones((M,), bool)
    q = jnp.asarray(rng.normal(size=(512, 3)), jnp.float32)
    ms = timed(lambda: knn_sharded(q, mpts, mval, 5, mesh, axis="map"))
    print(f"map-sharded 5-NN (512 queries x {M} points):  {ms:8.1f} ms")

    # composed sharded mapping step from real front-end features
    world = syn.default_world(seed=0)
    ostate = odo.init_state(cfg)
    mstate = mp.init_state(cfg)
    ident = Pose.identity()
    xyz, valid, ring = syn.raycast(
        world, np.eye(3), np.array([0.0, 0.0, 1.6]), cfg.sensor,
        noise=0.01, rng=np.random.default_rng(0))
    ostate, feats, opose, _, _, _ = frontend_step(
        ostate, jnp.asarray(xyz, jnp.float32), jnp.asarray(valid),
        jnp.asarray(ring, jnp.int32), ident, ident, jnp.float32(0.0),
        cfg, True)
    mfeats = feats._replace(less_sharp=ostate.ref_corner,
                            less_flat=ostate.ref_surf)
    c_pts, c_ok = voxel_downsample(
        mfeats.less_sharp.xyz, mfeats.less_sharp.valid,
        cfg.leaf_scan_corner, cfg.max_scan_corner_ds)
    s_in = jnp.concatenate([mfeats.less_flat.xyz, mfeats.outlier.xyz], axis=0)
    s_ok_in = jnp.concatenate(
        [mfeats.less_flat.valid, mfeats.outlier.valid], axis=0)
    s_pts, s_ok = voxel_downsample(
        s_in, s_ok_in, cfg.leaf_scan_surf, cfg.max_scan_surf_ds)

    def step():
        st, T, _, _ = backend_step_sharded(
            mstate, c_pts, c_ok, s_pts, s_ok, opose, jnp.float32(0.0),
            cfg, mesh)
        return T.t

    ms = timed(step, reps=3)
    print(f"composed sharded mapping step:               {ms:8.1f} ms")


if __name__ == "__main__":
    main()
