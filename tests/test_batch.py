"""Batched multi-sequence mode == independent per-sequence pipelines."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lego_loam_tpu import config_for
from lego_loam_tpu.io import synthetic as syn
from lego_loam_tpu.models.batch import BatchPipeline, batch_chunk_steps
from lego_loam_tpu.models.pipeline import LegoLoamPipeline

CFG = config_for(
    "vlp16", deskew=False,
    max_keyframes=64, max_map_corner=2048, max_map_surf=8192,
    kf_corner_cap=512, kf_surf_cap=2048, kf_outlier_cap=512,
    max_scan_corner_ds=512, max_scan_surf_ds=2048, nn_query_tile=256,
    mapping_process_every=2,
)


def _scans(n, seed, arc):
    world = syn.default_world(seed=seed)
    poses = syn.circle_trajectory(n, radius=8.0, arc=arc)
    out = []
    for k, (R, t) in enumerate(poses):
        xyz, valid, ring = syn.raycast(world, R, t, CFG.sensor, noise=0.01,
                                       rng=np.random.default_rng(100 * seed + k))
        out.append((xyz, valid, ring))
    return out


def test_batch_matches_individual():
    n, C = 8, 4
    seq_a = _scans(n, seed=4, arc=0.35 * np.pi)
    seq_b = _scans(n, seed=7, arc=-0.3 * np.pi)

    refs = []
    for seq in (seq_a, seq_b):
        pipe = LegoLoamPipeline(CFG, collect_stats=False)
        fused = []
        for i in range(0, n, C):
            xyz = np.stack([s[0] for s in seq[i:i + C]])
            val = np.stack([s[1] for s in seq[i:i + C]])
            ring = np.stack([s[2] for s in seq[i:i + C]])
            fused.append(np.asarray(
                pipe.process_chunk(xyz, val, ring).fused_poses.t))
        refs.append((np.concatenate(fused), int(pipe.mstate.n_kf),
                     np.asarray(pipe.mstate.kf_t)))

    bp = BatchPipeline(CFG, batch=2)
    fused_b = []
    for i in range(0, n, C):
        xyz = np.stack([
            np.stack([s[0] for s in seq[i:i + C]]) for seq in (seq_a, seq_b)])
        val = np.stack([
            np.stack([s[1] for s in seq[i:i + C]]) for seq in (seq_a, seq_b)])
        ring = np.stack([
            np.stack([s[2] for s in seq[i:i + C]]) for seq in (seq_a, seq_b)])
        res = bp.process_chunk(xyz, val, ring)
        fused_b.append(np.asarray(res.fused_poses.t))   # (B, C, 3)
    fused_b = np.concatenate(fused_b, axis=1)           # (B, n, 3)

    n_kf = bp.keyframe_counts()
    # vmap batches the reductions, so float accumulation orders differ from
    # the single-sequence program — agreement is numerical (mm-level over the
    # trajectory), not bitwise
    for b, (fused_ref, nk_ref, kf_t_ref) in enumerate(refs):
        np.testing.assert_allclose(fused_b[b], fused_ref, atol=2e-2)
        assert int(n_kf[b]) == nk_ref
        np.testing.assert_allclose(
            np.asarray(bp.mstate.kf_t[b][:nk_ref]), kf_t_ref[:nk_ref],
            atol=2e-2)


def test_batch_sharded_over_mesh():
    """Fleet replay partitions over a device mesh along the batch axis: the
    whole pipeline is vmapped, so sharding the sequences is plain data
    parallelism (one sequence per device, no collectives on the hot path)."""
    import lego_loam_tpu.models.mapping as mp
    import lego_loam_tpu.models.odometry as odo

    B, C = 8, 2
    mesh = Mesh(np.array(jax.devices()[:8]), ("fleet",))
    shard_b = NamedSharding(mesh, P("fleet"))

    world = syn.default_world(seed=3)
    poses = syn.circle_trajectory(C, radius=9.0, arc=0.2 * np.pi)
    scans = [syn.raycast(world, R, t, CFG.sensor, noise=0.01,
                         rng=np.random.default_rng(k))
             for k, (R, t) in enumerate(poses)]
    # all sequences identical here — the test is about partitioning
    xyz = jnp.asarray(np.broadcast_to(
        np.stack([s[0] for s in scans]), (B, C) + scans[0][0].shape), jnp.float32)
    val = jnp.asarray(np.broadcast_to(
        np.stack([s[1] for s in scans]), (B, C) + scans[0][1].shape))
    ring = jnp.asarray(np.broadcast_to(
        np.stack([s[2] for s in scans]), (B, C) + scans[0][2].shape), jnp.int32)

    rep = lambda t: jax.tree_util.tree_map(
        lambda a: jax.device_put(
            jnp.broadcast_to(a, (B,) + a.shape), shard_b), t)
    ostates = rep(odo.init_state(CFG))
    mstates = rep(mp.init_state(CFG))
    xyz = jax.device_put(xyz, shard_b)
    val = jax.device_put(val, shard_b)
    ring = jax.device_put(ring, shard_b)

    frames = jnp.arange(C, dtype=jnp.int32)
    times = jnp.arange(C, dtype=jnp.float32) * CFG.sensor.scan_period
    ostates, mstates, outs = batch_chunk_steps(
        ostates, mstates, xyz, val, ring, frames, times,
        CFG, True, 10)
    fused_t = outs[1].t
    jax.block_until_ready(fused_t)
    assert np.isfinite(np.asarray(fused_t)).all()
    # the batch axis must still be partitioned on the output state
    assert mstates.kf_t.sharding.spec == P("fleet")


def test_batch_loop_closure_gate_stays_conditional():
    """The loop-closure cadence cond must survive vmap as a true conditional
    (predicate is the shared frame counter, unbatched) — if it degraded to an
    execute-both-branches select, the pose-graph solve would run every scan
    for every sequence.  Counted structurally: enabling loop closure must add
    conditional regions to the lowered batched program, not inline the solve.
    """
    import lego_loam_tpu.models.mapping as mp
    import lego_loam_tpu.models.odometry as odo

    B, C, N = 2, 4, CFG.sensor.n_scan * CFG.sensor.horizon_scan

    def lower(cfg):
        o1 = odo.init_state(cfg)
        m1 = mp.init_state(cfg)
        rep = lambda t: jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), t)
        args = (rep(o1), rep(m1),
                jnp.zeros((B, C, N, 3), jnp.float32),
                jnp.zeros((B, C, N), bool),
                jnp.zeros((B, C, N), jnp.int32),
                jnp.arange(C, dtype=jnp.int32),
                jnp.arange(C, dtype=jnp.float32))
        return batch_chunk_steps.lower(*args, cfg, True, 2).as_text()

    txt_off = lower(CFG.replace(loop_closure_enabled=False))
    txt_on = lower(CFG.replace(loop_closure_enabled=True))
    n_off = txt_off.count("stablehlo.case") + txt_off.count(" conditional")
    n_on = txt_on.count("stablehlo.case") + txt_on.count(" conditional")
    assert n_on > n_off, (
        f"loop-on lowering has {n_on} conditionals vs {n_off} without — the "
        "loop gate degraded to a select under vmap")


def test_batch_matches_individual_with_loop_closure():
    """Equivalence of batched vs per-sequence replay with the loop-closure
    cadence active (the gate path runs even when no closure fires)."""
    cfg = CFG.replace(loop_closure_enabled=True,
                      max_loop_edges=8, pg_gn_iters=2)
    n, C = 8, 4
    seq_a = _scans(n, seed=4, arc=0.35 * np.pi)
    seq_b = _scans(n, seed=7, arc=-0.3 * np.pi)

    refs = []
    for seq in (seq_a, seq_b):
        pipe = LegoLoamPipeline(cfg, collect_stats=False, loop_check_every=2)
        fused = []
        for i in range(0, n, C):
            xyz = np.stack([s[0] for s in seq[i:i + C]])
            val = np.stack([s[1] for s in seq[i:i + C]])
            ring = np.stack([s[2] for s in seq[i:i + C]])
            fused.append(np.asarray(
                pipe.process_chunk(xyz, val, ring).fused_poses.t))
        refs.append((np.concatenate(fused), int(pipe.mstate.n_kf)))

    bp = BatchPipeline(cfg, batch=2, loop_check_every=2)
    fused_b = []
    for i in range(0, n, C):
        xyz = np.stack([
            np.stack([s[0] for s in seq[i:i + C]]) for seq in (seq_a, seq_b)])
        val = np.stack([
            np.stack([s[1] for s in seq[i:i + C]]) for seq in (seq_a, seq_b)])
        ring = np.stack([
            np.stack([s[2] for s in seq[i:i + C]]) for seq in (seq_a, seq_b)])
        res = bp.process_chunk(xyz, val, ring)
        fused_b.append(np.asarray(res.fused_poses.t))
    fused_b = np.concatenate(fused_b, axis=1)

    n_kf = bp.keyframe_counts()
    for b, (fused_ref, nk_ref) in enumerate(refs):
        np.testing.assert_allclose(fused_b[b], fused_ref, atol=2e-2)
        assert int(n_kf[b]) == nk_ref
