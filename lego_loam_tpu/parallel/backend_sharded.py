"""Fully-sharded scan-to-map back-end step over a device mesh.

Composes the two sharding patterns (map-block partitioning + edge-sharded
pose graph) into ONE mapping-step equivalent — the multi-host configuration
of the back-end (SURVEY.md §2.6 P5; the reference has no multi-node story at
all).  Layout:

  * keyframe FEATURE BLOCKS (the hundreds-of-MB arrays) shard along the
    keyframe axis; pose-level arrays (kf_R/kf_t/meas, ~100 KB) replicate —
    collectives then move only (Q, 5) candidate sets and 6-dof reductions,
    never map points;
  * local-map assembly runs per shard: each device selects the in-radius
    keyframes IT owns, transforms them by the replicated poses and voxel-
    downsamples its submap — the expensive gather/dedup is 1/n per device;
  * scan-to-map 5-NN runs per shard, then the per-shard candidates
    (distances AND coordinates, so no cross-shard gather is ever needed)
    all-gather over ICI and reduce to the global 5 nearest — bitwise the
    same neighbor sets as the single-device path;
  * line/plane fits + the 6-DoF GN run replicated (Q is tiny);
  * the pose-graph refinement reuses the edge-sharded psum CG
    (parallel/graph.solve_pose_graph_sharded).

Reference equivalents: mapOptmization.cpp:956-1065 (local map),
1093-1327 (association + GN), 1353-1454 (keyframe insertion).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from lego_loam_tpu.config import PipelineConfig
from lego_loam_tpu.models.mapping import (
    MappingState,
    _fit_lines,
    _fit_planes,
    predict_pose,
)
from lego_loam_tpu.models.odometry import (
    _corner_distance,
    _degeneracy_projection,
    _safe_norm,
)
from lego_loam_tpu.ops.knn import knn
from lego_loam_tpu.utils.precision import f32_matmuls
from lego_loam_tpu.ops.voxel import voxel_downsample
from lego_loam_tpu.utils.math3d import Pose, so3_exp


def _shard_local_map(kf_R, kf_t, blocks, valids, n_kf, center, offset,
                     n_sel: int, radius: float, leaf: float, out_cap: int):
    """Per-shard local-map assembly with EXACT global keyframe selection.

    The pose array replicates, so every shard computes the same global
    top-n_sel in-radius selection (identical to the single-device
    _gather_local_map policy) and then contributes the transformed blocks
    of the selected keyframes IT OWNS.  The union over shards is exactly
    the global selection — no per-shard candidate quota, so a recent
    trajectory cluster landing on one shard can never starve the local map
    (round-3 ADVICE finding: the old top-(S/n)-per-shard split assumed a
    uniform spread that contiguous slot allocation violates)."""
    Ks = blocks.shape[0]
    K = kf_t.shape[0]
    alive = jnp.arange(K) < n_kf
    d2 = jnp.sum((kf_t - center) ** 2, axis=1)
    usable = alive & (d2 <= radius * radius)
    _, sel = jax.lax.top_k(-jnp.where(usable, d2, 1e30), min(n_sel, K))
    sel_ok = jnp.take(usable, sel)
    owned = (sel >= offset) & (sel < offset + Ks)
    lsel = jnp.clip(sel - offset, 0, Ks - 1)

    b = blocks[lsel]
    v = valids[lsel] & (sel_ok & owned)[:, None]
    R = kf_R[sel]
    t = kf_t[sel]
    pts = jnp.einsum("sij,scj->sci", R, b) + t[:, None, :]
    return voxel_downsample(pts.reshape(-1, 3), v.reshape(-1), leaf, out_cap)


def _knn5_global(q, pts, val, axis: str):
    """Per-shard 5-NN + all-gather reduce; returns the 5 global nearest map
    POINTS per query (Q, 5, 3) and validity, identical on every device."""
    li, ld2 = knn(q, pts, val, 5, 0, backend="xla")
    lp = pts[li]                                   # (Q, 5, 3)
    ad2 = jax.lax.all_gather(ld2, axis)            # (n, Q, 5)
    ap = jax.lax.all_gather(lp, axis)              # (n, Q, 5, 3)
    n = ad2.shape[0]
    Q = q.shape[0]
    ad2 = jnp.moveaxis(ad2, 0, 1).reshape(Q, n * 5)
    ap = jnp.moveaxis(ap, 0, 1).reshape(Q, n * 5, 3)
    nd2, sel = jax.lax.top_k(-ad2, 5)
    nn_pts = jnp.take_along_axis(ap, sel[..., None], axis=1)
    return nn_pts, -nd2


from functools import lru_cache


@lru_cache(maxsize=16)
def _sharded_gather(cfg: PipelineConfig, mesh: Mesh, axis: str):
    """Build (once per (cfg, mesh)) the jitted per-shard local-map gather.

    Outputs are SHARDED along the point axis: shard d's slice holds the
    submap assembled from the keyframes d owns (padded to the full caps per
    shard).  The solver consumes them shard-locally, so a cached map never
    moves between devices."""
    n_dev = mesh.shape[axis]
    K = cfg.max_keyframes
    assert K % n_dev == 0, "max_keyframes must divide the mesh axis"
    Ks = K // n_dev
    S = cfg.surrounding_keyframe_search_num
    # per-shard submap caps stay FULL-SIZE: the arrays are tiny (~100 KB -
    # 400 KB), so a shard owning the whole in-radius neighborhood (the
    # common recent-cluster case) keeps single-device map density instead
    # of truncating at cap/n.  What shards here is the keyframe POOL (the
    # hundreds-of-MB arrays) and the gather/transform bandwidth, not the
    # NN distance tiles.
    mc_cap = cfg.max_map_corner
    ms_cap = cfg.max_map_surf

    pool_spec = P(axis)
    rep = P()

    @jax.jit
    @f32_matmuls
    @partial(shard_map, mesh=mesh,
             in_specs=(pool_spec, pool_spec, pool_spec, pool_spec,
                       pool_spec, pool_spec, rep, rep, rep, rep),
             out_specs=(P(axis), P(axis), P(axis), P(axis)),
             check_vma=False)
    def gather(kf_c, kf_cv, kf_s, kf_sv, kf_o, kf_ov,
               kf_R, kf_t, n_kf, center):
        offset = jax.lax.axis_index(axis) * Ks
        cm, cmv = _shard_local_map(
            kf_R, kf_t, kf_c, kf_cv, n_kf, center, offset, S,
            cfg.surrounding_keyframe_search_radius, cfg.leaf_map_corner,
            mc_cap)
        # surf + outlier blocks form the surf map (reference combines them)
        so_blocks = jnp.concatenate([kf_s, kf_o], axis=1)
        so_valid = jnp.concatenate([kf_sv, kf_ov], axis=1)
        sm, smv = _shard_local_map(
            kf_R, kf_t, so_blocks, so_valid, n_kf, center, offset, S,
            cfg.surrounding_keyframe_search_radius, cfg.leaf_map_surf,
            ms_cap)
        return cm, cmv, sm, smv

    return gather


@lru_cache(maxsize=16)
def _sharded_solver(cfg: PipelineConfig, mesh: Mesh, axis: str):
    """Build (once per (cfg, mesh)) the jitted shard_map solve program.

    Consumes the (possibly cached) per-shard submaps from _sharded_gather."""
    pool_spec = P(axis)
    rep = P()

    @jax.jit
    @f32_matmuls
    @partial(shard_map, mesh=mesh,
             in_specs=(pool_spec, pool_spec, pool_spec, pool_spec,
                       rep, rep, rep, rep,
                       Pose(rep, rep)),
             out_specs=(Pose(rep, rep), rep),
             check_vma=False)
    def solve(cm, cmv, sm, smv, cpts, cok, spts, sok, T_pred):
        n_map_c = jax.lax.psum(jnp.sum(cmv), axis)
        n_map_s = jax.lax.psum(jnp.sum(smv), axis)
        map_gate = (n_map_c > 10) & (n_map_s > 100)

        def assoc(T):
            qc = cpts @ T.R.T + T.t
            qs = spts @ T.R.T + T.t
            cnn, cd2 = _knn5_global(qc, cm, cmv, axis)
            snn, sd2 = _knn5_global(qs, sm, smv, axis)
            c_ok = cok & (cd2[:, 4] < cfg.map_nn_radius_sq)
            s_ok = sok & (sd2[:, 4] < cfg.map_nn_radius_sq)
            la, lb, c_ok = _fit_lines(cnn, c_ok, cfg)
            pn, pd, s_ok = _fit_planes(snn, s_ok, cfg)
            return (la, lb, c_ok), (pn, pd, s_ok)

        def gn_step(T, P6, done, a, compute_proj):
            (la, lb, c_ok), (pn, pd, s_ok) = a

            def f(x):
                w, v = x[:3], x[3:]
                qc = cpts @ T.R.T + T.t
                qs = spts @ T.R.T + T.t
                qc = qc + jnp.cross(jnp.broadcast_to(w, qc.shape), qc) + v
                qs = qs + jnp.cross(jnp.broadcast_to(w, qs.shape), qs) + v
                dc = _corner_distance(qc, la, lb)
                ds = jnp.sum(pn * qs, axis=-1) + pd
                return jnp.concatenate([dc, ds])

            x0 = jnp.zeros((6,), jnp.float32)
            d0 = f(x0)
            J = jax.jacfwd(f)(x0)
            qs0 = spts @ T.R.T + T.t
            wc = 1.0 - 0.9 * jnp.abs(d0[: cpts.shape[0]])
            ws = 1.0 - 0.9 * jnp.abs(d0[cpts.shape[0]:]) / jnp.sqrt(
                jnp.sqrt(_safe_norm(qs0)))
            w = jnp.concatenate([wc, ws])
            ok = jnp.concatenate([c_ok, s_ok])
            keep = ok & (w > 0.1) & jnp.isfinite(d0)
            wk = jnp.where(keep, w, 0.0)
            A = J * wk[:, None]
            H = A.T @ A
            g = A.T @ (-wk * d0)
            x = jnp.linalg.solve(H + 1e-6 * jnp.eye(6), g)
            x = jnp.where(jnp.isfinite(x), x, 0.0)
            if compute_proj:
                P6 = _degeneracy_projection(H, cfg.map_degen_eig_thresh)
            x = P6 @ x
            n_keep = jnp.sum(keep)
            apply = (~done) & map_gate & (n_keep >= cfg.map_min_constraints)
            T_new = Pose(so3_exp(x[:3]) @ T.R, T.t + x[3:])
            T = jax.tree_util.tree_map(
                lambda p, q: jnp.where(apply, p, q), T_new, T)
            done = done | (apply
                           & (jnp.degrees(_safe_norm(x[:3]))
                              < cfg.map_delta_rot_deg)
                           & (100.0 * _safe_norm(x[3:])
                              < cfg.map_delta_trans_cm))
            return T, P6, done, n_keep

        T = T_pred
        P6 = jnp.eye(6, dtype=jnp.float32)
        done = jnp.bool_(False)
        n_keep = jnp.int32(0)
        n_assoc = min(cfg.map_assoc_iters, cfg.map_iters)
        a = None
        for it in range(n_assoc):
            a = assoc(T)
            T, P6, done, n_keep = gn_step(T, P6, done, a, it == 0)

        # frozen-correspondence refinement up to map_iters, matching the
        # single-device scan_to_map schedule (no NN/collectives inside, so
        # hard scans converge to the same pose as the single-device path)
        def wcond(carry):
            it, T, done, n_keep = carry
            return (it < cfg.map_iters) & ~done & map_gate

        def wbody(carry):
            it, T, done, n_keep = carry
            T, _, done, nk = gn_step(T, P6, done, a, False)
            return it + 1, T, done, nk

        _, T, _, n_keep = jax.lax.while_loop(
            wcond, wbody, (jnp.int32(n_assoc), T, done, n_keep))
        return T, n_keep

    return solve


@lru_cache(maxsize=16)
def _sharded_loop_step(cfg: PipelineConfig, mesh: Mesh, axis: str):
    """Build (once per (cfg, mesh)) the jitted sharded loop-closure step —
    the multi-device configuration of models/loop.loop_closure_step (the
    reference's 1 Hz loop thread, mapOptmization.cpp:802-954).

    Design: detection, ICP, gates, and the pose-graph solve all run on the
    REPLICATED pose-level arrays (identical on every device, ~100 KB), so
    the only collective work is gathering the two clouds out of the sharded
    keyframe pool: each device contributes the (masked, map-frame) blocks of
    the keyframes it owns and a psum assembles the replicated source cloud +
    history submap (~1.6 MB over ICI — map points still never move in bulk).
    Downstream of the gather this calls the same _loop_core as the
    single-device path, so accepted edges, gate decisions, and corrected
    poses are bitwise identical."""
    from lego_loam_tpu.models import loop as lp
    from lego_loam_tpu.ops.voxel import voxel_downsample as vds

    n_dev = mesh.shape[axis]
    K = cfg.max_keyframes
    assert K % n_dev == 0, "max_keyframes must divide the mesh axis"
    Ks = K // n_dev
    pool_spec = P(axis)
    rep = P()

    @partial(shard_map, mesh=mesh,
             in_specs=(pool_spec, pool_spec, pool_spec, pool_spec,
                       rep, rep, rep, rep, rep),
             out_specs=(rep, rep, rep, rep),
             check_vma=False)
    def gather(kf_c, kf_cv, kf_s, kf_sv, kf_R, kf_t, latest, sel, sel_ok):
        offset = jax.lax.axis_index(axis) * Ks

        def block(i, ok):
            li = jnp.clip(i - offset, 0, Ks - 1)
            own = (i >= offset) & (i < offset + Ks) & ok
            pts = jnp.concatenate([kf_c[li], kf_s[li]], axis=0)
            val = jnp.concatenate([kf_cv[li], kf_sv[li]], axis=0) & own
            pts = pts @ kf_R[i].T + kf_t[i]   # map frame (replicated pose)
            return jnp.where(val[:, None], pts, 0.0), val

        src, src_val = block(latest, jnp.bool_(True))
        hp, hv = jax.vmap(block)(sel, sel_ok)
        # each row is owned by exactly one shard -> psum selects the owner
        src = jax.lax.psum(src, axis)
        src_val = jax.lax.psum(src_val.astype(jnp.int32), axis) > 0
        hp = jax.lax.psum(hp, axis)
        hv = jax.lax.psum(hv.astype(jnp.int32), axis) > 0
        return src, src_val, hp, hv

    @jax.jit
    @f32_matmuls
    def step(state: MappingState, time):
        latest, cand, found = lp._detect(state, time, cfg)
        sel, sel_ok = lp._history_selection(state, cand, time, cfg)
        src, src_val, hp, hv = gather(
            state.kf_corner, state.kf_corner_valid,
            state.kf_surf, state.kf_surf_valid,
            state.kf_R, state.kf_t, latest, sel, sel_ok)
        hp, hv = vds(hp.reshape(-1, 3), hv.reshape(-1),
                     cfg.leaf_history, cfg.max_map_surf)
        return lp._loop_core(state, src, src_val, hp, hv,
                             latest, cand, found, time, cfg)

    return step


def loop_closure_step_sharded(state: MappingState, time, cfg: PipelineConfig,
                              mesh: Mesh, axis: str = "map"):
    """Sharded-pool loop-closure check; same contract as
    models/loop.loop_closure_step.  Returns (new_state, LoopResult)."""
    return _sharded_loop_step(cfg, mesh, axis)(state, jnp.float32(time))


@lru_cache(maxsize=16)
def _sharded_inserter(cfg: PipelineConfig, mesh: Mesh, axis: str):
    n_dev = mesh.shape[axis]
    Ks = cfg.max_keyframes // n_dev

    @jax.jit
    @f32_matmuls
    @partial(shard_map, mesh=mesh, in_specs=(P(axis), P(), P(), P()),
             out_specs=P(axis), check_vma=False)
    def ins_shard(pool, val, slot_, gate):
        offset = jax.lax.axis_index(axis) * Ks
        lslot = jnp.clip(slot_ - offset, 0, Ks - 1)
        here = gate & (slot_ >= offset) & (slot_ < offset + Ks)
        new_row = jnp.where(here, val, pool[lslot])
        return pool.at[lslot].set(new_row)

    return ins_shard


def backend_step_sharded(
    state: MappingState,
    corner_pts, corner_ok, surf_pts, surf_ok,
    odom_pose: Pose,
    time,
    cfg: PipelineConfig,
    mesh: Mesh,
    axis: str = "map",
    map_cache=None,
):
    """One full sharded mapping solve.  corner/surf are the downsampled
    current-scan clouds (the front end's voxel output).  Returns
    (new_state, mapped_pose, n_constraints, map_cache) with the same
    insertion/latch semantics as models/mapping.mapping_step.

    map_cache: pass the cache returned by a previous call to SKIP the
    local-map re-gather (the single-chip cached-map fast path,
    models/mapping.py map_refresh_every); pass None to re-gather.  The
    cache is a tuple of per-shard submap arrays sharded along the point
    axis, so reusing it moves no data between devices.  The refresh /
    staleness policy lives in the caller (see ShardedBackend, which also
    runs the pool compaction the jitted step cannot do collectively).

    Compiled programs are cached per (cfg, mesh, axis)."""
    K = cfg.max_keyframes
    T_pred = predict_pose(state, odom_pose)

    if map_cache is None:
        map_cache = _sharded_gather(cfg, mesh, axis)(
            state.kf_corner, state.kf_corner_valid,
            state.kf_surf, state.kf_surf_valid,
            state.kf_outlier, state.kf_outlier_valid,
            state.kf_R, state.kf_t, state.n_kf, T_pred.t)
        # XLA:CPU's in-process communicator can deadlock when a
        # collective program is enqueued behind another multi-device
        # program still in flight (the virtual-mesh test rig); one sync
        # on the (infrequent) refresh path sidesteps it.  On TPU this is
        # a single dispatch fence every map_refresh_every solves.
        jax.block_until_ready(map_cache)

    new_T, n_keep = _sharded_solver(cfg, mesh, axis)(
        *map_cache, corner_pts, corner_ok, surf_pts, surf_ok, T_pred)

    # ---- keyframe insertion (replicated poses; sharded block writes) ----
    has_kf = state.n_kf > 0
    last_t = state.kf_t[jnp.maximum(state.n_kf - 1, 0)]
    moved = _safe_norm(new_T.t - last_t) >= cfg.keyframe_min_translation
    insert = (~has_kf) | moved
    full = state.n_kf >= K
    slot = jnp.minimum(state.n_kf, K - 1)

    def ins_rep(arr, val):
        new_row = jnp.where(insert & ~full, val, arr[slot])
        return arr.at[slot].set(new_row)

    ins_shard = _sharded_inserter(cfg, mesh, axis)
    gate = insert & ~full
    prev_idx = jnp.maximum(state.n_kf - 1, 0)
    T_prev = Pose(state.kf_R[prev_idx], state.kf_t[prev_idx])
    Z = T_prev.inverse().compose(new_T)

    def pad_to(a, cap):
        if a.shape[0] >= cap:
            return a[:cap]
        pads = [(0, cap - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pads)

    new_state = state._replace(
        kf_R=ins_rep(state.kf_R, new_T.R),
        kf_t=ins_rep(state.kf_t, new_T.t),
        kf_meas_R=ins_rep(state.kf_meas_R, Z.R),
        kf_meas_t=ins_rep(state.kf_meas_t, Z.t),
        kf_time=ins_rep(state.kf_time, jnp.asarray(time, jnp.float32)),
        kf_corner=ins_shard(
            state.kf_corner, pad_to(corner_pts, cfg.kf_corner_cap),
            slot, gate),
        kf_corner_valid=ins_shard(
            state.kf_corner_valid, pad_to(corner_ok, cfg.kf_corner_cap),
            slot, gate),
        kf_surf=ins_shard(
            state.kf_surf, pad_to(surf_pts, cfg.kf_surf_cap), slot, gate),
        kf_surf_valid=ins_shard(
            state.kf_surf_valid, pad_to(surf_ok, cfg.kf_surf_cap),
            slot, gate),
        n_kf=jnp.where(gate, state.n_kf + 1, state.n_kf),
        bef_mapped=odom_pose,
        aft_mapped=new_T,
    )
    return new_state, new_T, n_keep, map_cache


class ShardedBackend:
    """Host driver for the sharded back-end: owns the mapping state, the
    per-shard local-map cache, and the pool-compaction cadence — the same
    deterministic policies as the single-device mapping_step
    (models/mapping.py), expressed host-side because a shard_map program
    cannot re-shard the pool (compaction) or invalidate a cache
    collectively.

      * refresh the cached per-shard submaps every cfg.map_refresh_every
        solves, or when mark_stale() was called (loop closure / external
        pose rewrite);
      * compact the keyframe pool when n_kf reaches capacity - 1
        (checked every `compact_check_every` solves — one n_kf host pull
        per check, not per scan).

    The keyframe pool arrays are device_put with the pool sharding at
    construction, so every step's shard_map consumes them in place."""

    def __init__(self, state: MappingState, cfg: PipelineConfig, mesh: Mesh,
                 axis: str = "map", compact_check_every: int = 32):
        from jax.sharding import NamedSharding

        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis
        self.compact_check_every = compact_check_every
        pool = NamedSharding(mesh, P(axis))
        rep = NamedSharding(mesh, P())
        pool_fields = {"kf_corner", "kf_corner_valid", "kf_surf",
                       "kf_surf_valid", "kf_outlier", "kf_outlier_valid"}
        self.state = state._replace(**{
            f: jax.device_put(getattr(state, f),
                              pool if f in pool_fields else rep)
            for f in state._fields})
        self.map_cache = None
        self._age = 0
        self._steps = 0

    def mark_stale(self) -> None:
        """Invalidate the cached local map (keyframe poses rewritten)."""
        self.map_cache = None

    def loop_step(self, time):
        """One loop-closure check on the sharded pool (the reference's 1 Hz
        loop-thread analog; cadence decided by the caller).  Pulls the
        accept flag — one host sync per CHECK, not per scan — because an
        accepted closure rewrites keyframe poses and the cached per-shard
        submaps must be re-gathered."""
        self.state, res = loop_closure_step_sharded(
            self.state, time, self.cfg, self.mesh, self.axis)
        if bool(res.closed):
            self.map_cache = None
        return res

    def step(self, corner_pts, corner_ok, surf_pts, surf_ok,
             odom_pose: Pose, time):
        """One mapping solve; returns (mapped_pose, n_constraints)."""
        cfg = self.cfg
        if self._steps % self.compact_check_every == 0:
            if int(self.state.n_kf) >= cfg.max_keyframes - 1:
                from lego_loam_tpu.models.mapping import compact_keyframes

                self.state = compact_keyframes(self.state, cfg)
                self.map_cache = None
        if self._age >= cfg.map_refresh_every - 1:
            self.map_cache = None
        self._age = 0 if self.map_cache is None else self._age + 1
        self._steps += 1

        self.state, T, n_keep, self.map_cache = backend_step_sharded(
            self.state, corner_pts, corner_ok, surf_pts, surf_ok,
            odom_pose, time, cfg, self.mesh, self.axis,
            map_cache=self.map_cache)
        return T, n_keep
