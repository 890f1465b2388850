"""Scan-to-map back-end: keyframe pool + 6-DoF map registration.

TPU-native equivalent of the reference mapOptimization node
(reference: mapOptmization.cpp:956-1350, 1353-1454).  Redesign:

  * keyframes live in a fixed-capacity device-resident pool of padded
    feature blocks + pose arrays (no std::vector of clouds, no
    transform/cache bookkeeping);
  * the local map is a top-k gather of in-radius keyframe blocks, transformed
    by their poses and voxel-downsampled — replacing both of the reference's
    modes (50-keyframe deque / radius search + incremental cache,
    mapOptmization.cpp:961-1056) with one deterministic fixed-shape op;
  * per-iteration 5-NN against the local map runs as tiled distance matrices
    + top-k on the MXU; line fits are batched 3x3 eigendecompositions, plane
    fits batched 3x3 solves;
  * the 6-DoF Gauss-Newton keeps the reference's schedule: <=10 iterations,
    >=50 constraints, eigen-degeneracy threshold 100, convergence at
    0.05 deg / 0.05 cm (mapOptmization.cpp:1229-1327).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lego_loam_tpu.config import PipelineConfig
from lego_loam_tpu.models.odometry import (
    _corner_distance,
    _degeneracy_projection,
    _safe_norm,
)
from lego_loam_tpu.ops.knn import knn
from lego_loam_tpu.ops.lin3 import eigvalsh3, principal_axis3, solve3
from lego_loam_tpu.ops.voxel import voxel_downsample
from lego_loam_tpu.types import ScanFeatures
from lego_loam_tpu.utils.math3d import Pose, project_so3, so3_exp
from lego_loam_tpu.utils.precision import f32_matmuls


class MappingState(NamedTuple):
    # keyframe pool
    kf_R: jnp.ndarray          # (K, 3, 3) optimized keyframe rotations
    kf_t: jnp.ndarray          # (K, 3)
    kf_corner: jnp.ndarray     # (K, Ckc, 3) keyframe corner block (sensor frame)
    kf_corner_valid: jnp.ndarray
    kf_surf: jnp.ndarray       # (K, Cks, 3)
    kf_surf_valid: jnp.ndarray
    kf_outlier: jnp.ndarray    # (K, Cko, 3)
    kf_outlier_valid: jnp.ndarray
    kf_time: jnp.ndarray       # (K,)
    n_kf: jnp.ndarray          # int32
    # pose-graph bookkeeping (replaces gtsam's factor list,
    # mapOptmization.cpp:1376-1390): chain between-measurement from the
    # previous keyframe, recorded at insertion, plus padded loop edges
    kf_meas_R: jnp.ndarray     # (K, 3, 3) Z_{i-1,i} rotation
    kf_meas_t: jnp.ndarray     # (K, 3)
    loop_i: jnp.ndarray        # (L,) int32 latest-keyframe index of each loop
    loop_j: jnp.ndarray        # (L,) int32 history-keyframe index
    loop_R: jnp.ndarray        # (L, 3, 3) measured Z_ij
    loop_t: jnp.ndarray        # (L, 3)
    loop_w: jnp.ndarray        # (L,) information weight (1/fitness-based)
    n_loops: jnp.ndarray       # int32
    # latched poses for the odometry-delta prediction (mapOptmization.cpp:376-461)
    bef_mapped: Pose           # odometry pose at the last solve
    aft_mapped: Pose           # mapped pose at the last solve
    # cached assembled local map (map frame) — the reference's incremental
    # recent-keyframe cache (mapOptmization.cpp:1001-1056) made explicit:
    # re-gathered every cfg.map_refresh_every solves or when map_stale is
    # set (loop closure / pool compaction rewrote keyframe poses)
    map_corner: jnp.ndarray        # (max_map_corner, 3)
    map_corner_valid: jnp.ndarray  # (max_map_corner,)
    map_surf: jnp.ndarray          # (max_map_surf, 3)
    map_surf_valid: jnp.ndarray    # (max_map_surf,)
    map_age: jnp.ndarray           # int32 solves since last refresh
    map_stale: jnp.ndarray         # bool: force refresh at the next solve


def init_state(cfg: PipelineConfig) -> MappingState:
    K = cfg.max_keyframes
    return MappingState(
        kf_R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (K, 3, 3)).copy(),
        kf_t=jnp.zeros((K, 3), jnp.float32),
        kf_corner=jnp.zeros((K, cfg.kf_corner_cap, 3), jnp.float32),
        kf_corner_valid=jnp.zeros((K, cfg.kf_corner_cap), bool),
        kf_surf=jnp.zeros((K, cfg.kf_surf_cap, 3), jnp.float32),
        kf_surf_valid=jnp.zeros((K, cfg.kf_surf_cap), bool),
        kf_outlier=jnp.zeros((K, cfg.kf_outlier_cap, 3), jnp.float32),
        kf_outlier_valid=jnp.zeros((K, cfg.kf_outlier_cap), bool),
        kf_time=jnp.zeros((K,), jnp.float32),
        n_kf=jnp.int32(0),
        kf_meas_R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (K, 3, 3)).copy(),
        kf_meas_t=jnp.zeros((K, 3), jnp.float32),
        loop_i=jnp.zeros((cfg.max_loop_edges,), jnp.int32),
        loop_j=jnp.zeros((cfg.max_loop_edges,), jnp.int32),
        loop_R=jnp.broadcast_to(
            jnp.eye(3, dtype=jnp.float32), (cfg.max_loop_edges, 3, 3)).copy(),
        loop_t=jnp.zeros((cfg.max_loop_edges, 3), jnp.float32),
        loop_w=jnp.zeros((cfg.max_loop_edges,), jnp.float32),
        n_loops=jnp.int32(0),
        bef_mapped=Pose.identity(),
        aft_mapped=Pose.identity(),
        map_corner=jnp.zeros((cfg.max_map_corner, 3), jnp.float32),
        map_corner_valid=jnp.zeros((cfg.max_map_corner,), bool),
        map_surf=jnp.zeros((cfg.max_map_surf, 3), jnp.float32),
        map_surf_valid=jnp.zeros((cfg.max_map_surf,), bool),
        map_age=jnp.int32(0),
        map_stale=jnp.bool_(True),
    )


def predict_pose(state: MappingState, odom_pose: Pose) -> Pose:
    """Chain rule: apply the odometry increment since the last solve on top
    of the last mapped pose — the clean SE(3) form of the reference's 80-line
    Euler blocks (mapOptmization.cpp:376-461; also transformFusion.cpp:94)."""
    delta = state.bef_mapped.inverse().compose(odom_pose)
    return state.aft_mapped.compose(delta)


def _gather_local_map(state: MappingState, center: jnp.ndarray, cfg: PipelineConfig):
    """Top-k nearest in-radius keyframes -> transformed, downsampled map
    clouds.  Returns (corner_map, corner_valid, surf_map, surf_valid)."""
    K = cfg.max_keyframes
    S = min(cfg.surrounding_keyframe_search_num, K)
    idx_all = jnp.arange(K)
    alive = idx_all < state.n_kf
    d2 = jnp.sum((state.kf_t - center) ** 2, axis=1)
    r2 = cfg.surrounding_keyframe_search_radius ** 2
    usable = alive & (d2 <= r2)
    d2 = jnp.where(usable, d2, 1e30)
    _, sel = jax.lax.top_k(-d2, S)          # S nearest keyframes
    sel_ok = jnp.take(usable, sel)

    def transform_blocks(blocks, valids):
        # (K, C, 3) -> (S*C, 3) transformed by each keyframe pose
        b = blocks[sel]                      # (S, C, 3)
        v = valids[sel] & sel_ok[:, None]    # (S, C)
        R = state.kf_R[sel]                  # (S, 3, 3)
        t = state.kf_t[sel]
        pts = jnp.einsum("sij,scj->sci", R, b) + t[:, None, :]
        return pts.reshape(-1, 3), v.reshape(-1)

    c_pts, c_val = transform_blocks(state.kf_corner, state.kf_corner_valid)
    s_pts, s_val = transform_blocks(state.kf_surf, state.kf_surf_valid)
    o_pts, o_val = transform_blocks(state.kf_outlier, state.kf_outlier_valid)
    s_pts = jnp.concatenate([s_pts, o_pts], axis=0)
    s_val = jnp.concatenate([s_val, o_val], axis=0)

    corner_map, corner_valid = voxel_downsample(
        c_pts, c_val, cfg.leaf_map_corner, cfg.max_map_corner)
    surf_map, surf_valid = voxel_downsample(
        s_pts, s_val, cfg.leaf_map_surf, cfg.max_map_surf)
    return corner_map, corner_valid, surf_map, surf_valid


def _fit_lines(nn_pts, nn_ok, cfg):
    """Batched line fit on 5-NN sets: centroid + covariance eigendecomp;
    line-like iff largest eig > 3x second (mapOptmization.cpp:1101-1138).

    Returns (a, b, ok): the two virtual line points and validity."""
    c = jnp.mean(nn_pts, axis=1)
    X = nn_pts - c[:, None, :]
    cov = jnp.einsum("nki,nkj->nij", X, X) / nn_pts.shape[1]
    lam = eigvalsh3(cov)                     # ascending, closed form (VPU)
    ok = nn_ok & (lam[:, 2] > cfg.map_line_eig_ratio * lam[:, 1])
    v = principal_axis3(cov, lam)
    a = c + 0.1 * v
    b = c - 0.1 * v
    return a, b, ok


def _fit_planes(nn_pts, nn_ok, cfg):
    """Batched plane fit A n = -1 + residual validation
    (mapOptmization.cpp:1183-1207).  Returns (n_unit, d, ok)."""
    A = nn_pts                                  # (N, 5, 3)
    AtA = jnp.einsum("nki,nkj->nij", A, A)
    # regularize relative to the matrix scale; degenerate 5-NN sets (repeated
    # or collinear points) would otherwise blow up the float32 solve
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)[:, None, None]
    reg = (1e-6 * tr + 1e-6) * jnp.eye(3)
    Atb = -jnp.sum(A, axis=1)
    n = solve3(AtA + reg, Atb)
    finite = jnp.all(jnp.isfinite(n), axis=1)
    n = jnp.where(finite[:, None], n, 0.0)
    norm = _safe_norm(n, keepdims=True)
    n_unit = n / norm
    d = 1.0 / norm[:, 0]
    resid = jnp.abs(jnp.einsum("nki,ni->nk", A, n_unit) + d[:, None])
    # collinearity rejection: the neighbor set must actually span a plane
    c = jnp.mean(A, axis=1)
    X = A - c[:, None, :]
    cov = jnp.einsum("nki,nkj->nij", X, X) / A.shape[1]
    lam = eigvalsh3(cov)                    # ascending, closed form (VPU)
    spread_ok = lam[:, 1] > cfg.map_plane_min_spread ** 2
    ok = (nn_ok & finite & spread_ok
          & jnp.all(resid <= cfg.map_plane_max_resid, axis=1))
    d = jnp.where(ok, d, 0.0)  # keep masked-out rows finite for autodiff
    return n_unit, d, ok


def _map_residuals(T: Pose, corner_pts, corner_ok, surf_pts, surf_ok,
                   corner_map, corner_map_valid, surf_map, surf_map_valid,
                   cfg: PipelineConfig):
    """One association round: NN + fits; returns constraint pack."""
    qc = corner_pts @ T.R.T + T.t
    qs = surf_pts @ T.R.T + T.t

    ci, cd2 = knn(qc, corner_map, corner_map_valid, 5, cfg.nn_query_tile,
                  exact=cfg.nn_exact, backend=cfg.nn_backend)
    si, sd2 = knn(qs, surf_map, surf_map_valid, 5, cfg.nn_query_tile,
                  exact=cfg.nn_exact, backend=cfg.nn_backend)

    c_ok = corner_ok & (cd2[:, 4] < cfg.map_nn_radius_sq)
    s_ok = surf_ok & (sd2[:, 4] < cfg.map_nn_radius_sq)

    la, lb, c_ok = _fit_lines(corner_map[ci], c_ok, cfg)
    pn, pd, s_ok = _fit_planes(surf_map[si], s_ok, cfg)
    return (la, lb, c_ok), (pn, pd, s_ok)


@partial(jax.jit, static_argnames=("cfg",))
@f32_matmuls
def scan_to_map(
    T0: Pose,
    corner_pts, corner_ok, surf_pts, surf_ok,
    corner_map, corner_map_valid, surf_map, surf_map_valid,
    cfg: PipelineConfig,
):
    """6-DoF GN registration of the downsampled scan against the local map
    (mapOptmization.cpp:1229-1350).  Returns (T, n_constraints_last).

    Structure: the first map_assoc_iters association+GN rounds are unrolled
    in Python (the NN search is traced exactly that many times), then a
    while_loop runs frozen-correspondence GN refinements with early exit.
    No lax.cond inside the loops — a cond whose predicate becomes batched
    (e.g. under the fleet-replay vmap, models/batch.py) silently turns into
    an execute-both-branches select, re-running the NN every iteration."""
    map_gate = (jnp.sum(corner_map_valid) > 10) & (jnp.sum(surf_map_valid) > 100)

    def gn_step(T, P, done, assoc, compute_proj: bool):
        (la, lb, c_ok), (pn, pd, s_ok) = assoc

        def f(x):
            w, v = x[:3], x[3:]
            qc = (corner_pts @ T.R.T + T.t)
            qs = (surf_pts @ T.R.T + T.t)
            qc = qc + jnp.cross(jnp.broadcast_to(w, qc.shape), qc) + v
            qs = qs + jnp.cross(jnp.broadcast_to(w, qs.shape), qs) + v
            dc = _corner_distance(qc, la, lb)
            ds = jnp.sum(pn * qs, axis=-1) + pd
            return jnp.concatenate([dc, ds])

        x0 = jnp.zeros((6,), jnp.float32)
        d0 = f(x0)
        J = jax.jacfwd(f)(x0)

        qs0 = surf_pts @ T.R.T + T.t
        wc = 1.0 - 0.9 * jnp.abs(d0[: corner_pts.shape[0]])
        ws = 1.0 - 0.9 * jnp.abs(d0[corner_pts.shape[0]:]) / jnp.sqrt(
            jnp.sqrt(_safe_norm(qs0)))
        w = jnp.concatenate([wc, ws])
        ok = jnp.concatenate([c_ok, s_ok])
        keep = ok & (w > 0.1) & jnp.isfinite(d0)
        wk = jnp.where(keep, w, 0.0)

        A = J * wk[:, None]
        b = -wk * d0
        H = A.T @ A
        g = A.T @ b
        x = jnp.linalg.solve(H + 1e-6 * jnp.eye(6), g)
        x = jnp.where(jnp.isfinite(x), x, 0.0)

        if compute_proj:
            # 6x6 eigh once, on the first GN iteration (mapOptmization.cpp:
            # 1272-1305 latches matP at iterCount == 0)
            P = _degeneracy_projection(H, cfg.map_degen_eig_thresh)
        x = P @ x

        n_keep = jnp.sum(keep)
        apply = (~done) & map_gate & (n_keep >= cfg.map_min_constraints)
        T_new = Pose(so3_exp(x[:3]) @ T.R, T.t + x[3:])
        T = jax.tree_util.tree_map(
            lambda a, b: jnp.where(apply, a, b), T_new, T)
        d_rot = jnp.degrees(_safe_norm(x[:3]))
        d_trans = 100.0 * _safe_norm(x[3:])
        done = done | (apply & (d_rot < cfg.map_delta_rot_deg)
                       & (d_trans < cfg.map_delta_trans_cm))
        return T, P, done, n_keep

    T = T0
    P = jnp.eye(6, dtype=jnp.float32)
    done = jnp.bool_(False)
    n_last = jnp.int32(0)
    n_assoc = min(cfg.map_assoc_iters, cfg.map_iters)
    assoc = None
    for a in range(n_assoc):
        # when already converged the masked step leaves T unchanged, so the
        # extra (wasted) searches return identical associations
        assoc = _map_residuals(
            T, corner_pts, corner_ok, surf_pts, surf_ok,
            corner_map, corner_map_valid, surf_map, surf_map_valid, cfg)
        was_done = done
        T, P, done, n_keep = gn_step(T, P, done, assoc, compute_proj=(a == 0))
        n_last = jnp.where(map_gate & ~was_done, n_keep, n_last)

    def cond(carry):
        it, T, done, n_last = carry
        return (it < cfg.map_iters) & ~done & map_gate

    def body(carry):
        it, T, done, n_last = carry
        T, _, done, n_keep = gn_step(T, P, done, assoc, compute_proj=False)
        return it + 1, T, done, n_keep

    _, T, _, n_last = jax.lax.while_loop(
        cond, body, (jnp.int32(n_assoc), T, done, n_last))
    return T, n_last


@partial(jax.jit, static_argnames=("cfg", "compact_inline"),
         donate_argnames=("state",))
@f32_matmuls
def mapping_step(
    state: MappingState,
    feats: ScanFeatures,
    odom_pose: Pose,
    time: jnp.ndarray,
    cfg: PipelineConfig,
    imu_buf=None,
    compact_inline: bool = True,
):
    """One mapping solve.  feats are the odometry's reference clouds for this
    sweep (less-sharp / less-flat at the sweep end, plus outliers) — what the
    reference's featureAssociation publishes to mapOptimization.

    If imu_buf is given, the IMU roll/pitch blend is applied BEFORE keyframe
    insertion, like the reference's transformUpdate -> saveKeyFramesAndFactor
    ordering (mapOptmization.cpp:1348, 1353) — so stored poses and chain
    measurements see the blended pose.

    With compact_inline (the default) the pool-thinning trigger runs
    device-side: a lax.cond on n_kf approaching capacity, so the host loop
    needs NO n_kf pull per scan (each int() pull is a dispatch round-trip on
    a tunneled device, and the sync point where async device errors detonate).
    Batched (vmapped) callers pass False — a batched cond degrades to an
    execute-both-branches select, which would argsort the whole pool every
    solve — and keep a host-side per-chunk check instead.

    Returns (new_state, mapped_pose).  `state` is DONATED: the keyframe pool
    (hundreds of MB at default capacities) updates in place instead of being
    copied every solve; callers must rebind (`state, pose = mapping_step(
    state, ...)`) and must not touch the old pytree afterwards.
    """
    if compact_inline:
        state = jax.lax.cond(
            state.n_kf >= cfg.max_keyframes - 1,
            lambda s: _compact_keyframes_impl(s, cfg), lambda s: s, state)

    T_pred = predict_pose(state, odom_pose)

    # current scan downsampled (mapOptmization.cpp:1067-1091)
    corner_pts, corner_ok = voxel_downsample(
        feats.less_sharp.xyz, feats.less_sharp.valid,
        cfg.leaf_scan_corner, cfg.max_scan_corner_ds)
    surf_in = jnp.concatenate([feats.less_flat.xyz, feats.outlier.xyz], axis=0)
    surf_in_valid = jnp.concatenate(
        [feats.less_flat.valid, feats.outlier.valid], axis=0)
    surf_pts, surf_ok = voxel_downsample(
        surf_in, surf_in_valid, cfg.leaf_scan_surf, cfg.max_scan_surf_ds)

    # local-map refresh cadence: re-gathering + voxel-deduping ~150k points
    # dominates the solve, but the assembled map barely changes between
    # nearby solves (50 m radius vs ~0.1 m of motion per solve) — so the
    # assembled map is cached in the state and refreshed every
    # map_refresh_every solves, immediately after a loop closure or pool
    # compaction rewrote keyframe poses (map_stale), or whenever the pose
    # moved more than half the search-radius margin since the refresh could
    # matter.  This is the reference's incremental surrounding-keyframe
    # cache (mapOptmization.cpp:1001-1056) with a deterministic policy.
    do_refresh = (state.map_age >= cfg.map_refresh_every - 1) | state.map_stale

    def refresh(_):
        return _gather_local_map(state, T_pred.t, cfg)

    def cached(_):
        return (state.map_corner, state.map_corner_valid,
                state.map_surf, state.map_surf_valid)

    corner_map, corner_map_valid, surf_map, surf_map_valid = jax.lax.cond(
        do_refresh, refresh, cached, None)

    T, n_constraints = scan_to_map(
        T_pred, corner_pts, corner_ok, surf_pts, surf_ok,
        corner_map, corner_map_valid, surf_map, surf_map_valid, cfg)

    if imu_buf is not None:
        from lego_loam_tpu.models.imu import blend_attitude

        T = blend_attitude(T, imu_buf, time, cfg)

    # the mapped pose is latched (aft_mapped) and stored as a keyframe:
    # keep its rotation exactly on SO(3) so error cannot accumulate
    # through the predict -> solve -> latch cycle
    T = Pose(project_so3(T.R), T.t)

    # keyframe insertion (mapOptmization.cpp:1353-1454)
    has_kf = state.n_kf > 0
    last_t = state.kf_t[jnp.maximum(state.n_kf - 1, 0)]
    moved = _safe_norm(T.t - last_t) >= cfg.keyframe_min_translation
    insert = (~has_kf) | moved
    slot = jnp.minimum(state.n_kf, cfg.max_keyframes - 1)
    full = state.n_kf >= cfg.max_keyframes

    def ins(arr, val):
        # row-wise predicated update: select on the single slot row, not the
        # whole pool array (a full-array where() would read the 100 MB surf
        # pool twice per solve; with donated state this touches one row)
        new_row = jnp.where(insert & ~full, val, arr[slot])
        return arr.at[slot].set(new_row)

    # Keyframe blocks are stored in the sensor frame (corner_pts/surf_pts
    # already are), so later pose corrections (loop closure) re-anchor the
    # map for free — the reference instead caches transformed copies and has
    # to invalidate them on correction (mapOptmization.cpp:1456-1478).
    ko_ds, ko_ok = voxel_downsample(
        feats.outlier.xyz, feats.outlier.valid, cfg.leaf_outlier,
        cfg.kf_outlier_cap)

    # chain between-measurement Z = T_prev^-1 T (mapOptmization.cpp:1384-1388)
    prev_idx = jnp.maximum(state.n_kf - 1, 0)
    T_prev = Pose(state.kf_R[prev_idx], state.kf_t[prev_idx])
    Z = T_prev.inverse().compose(T)

    new_state = state._replace(
        kf_meas_R=ins(state.kf_meas_R, Z.R),
        kf_meas_t=ins(state.kf_meas_t, Z.t),
        kf_R=ins(state.kf_R, T.R),
        kf_t=ins(state.kf_t, T.t),
        kf_corner=ins(state.kf_corner, corner_pts[: cfg.kf_corner_cap]),
        kf_corner_valid=ins(state.kf_corner_valid, corner_ok[: cfg.kf_corner_cap]),
        kf_surf=ins(state.kf_surf, surf_pts[: cfg.kf_surf_cap]),
        kf_surf_valid=ins(state.kf_surf_valid, surf_ok[: cfg.kf_surf_cap]),
        kf_outlier=ins(state.kf_outlier, ko_ds),
        kf_outlier_valid=ins(state.kf_outlier_valid, ko_ok),
        kf_time=ins(state.kf_time, time),
        n_kf=jnp.where(insert & ~full, state.n_kf + 1, state.n_kf),
        bef_mapped=odom_pose,
        aft_mapped=T,
        map_corner=corner_map,
        map_corner_valid=corner_map_valid,
        map_surf=surf_map,
        map_surf_valid=surf_map_valid,
        map_age=jnp.where(do_refresh, 0, state.map_age + 1),
        map_stale=jnp.bool_(False),
    )
    return new_state, T


def _compact_keyframes_impl(state: MappingState,
                            cfg: PipelineConfig) -> MappingState:
    """Thin the pool when it approaches capacity: keep every 2nd keyframe of
    the older half [0, n_kf/2) and all of the newer half.

    Without this, insertion stops at max_keyframes and — once the vehicle
    leaves the surrounding-search radius of the frozen map — the back-end
    silently degrades to raw odometry.  Thinning halves distant-history
    density (mapping quality there is already bounded by the 50 m local-map
    radius) while keeping loop-closure anchors.  Chain measurements are
    recomputed from the retained optimized poses; loop edges are remapped
    and edges referencing a thinned keyframe are dropped.
    """
    K = cfg.max_keyframes
    L = cfg.max_loop_edges
    idx = jnp.arange(K)
    half = state.n_kf // 2
    keep = (idx < state.n_kf) & ((idx >= half) | (idx % 2 == 0))
    new_pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    n_new = jnp.sum(keep)

    order = jnp.argsort(jnp.where(keep, idx, K + idx))  # kept first, in order

    def g(a):
        return a[order]

    kf_R, kf_t = g(state.kf_R), g(state.kf_t)

    # chain measurements between retained neighbors, from optimized poses
    Rp = jnp.roll(kf_R, 1, axis=0)
    tp = jnp.roll(kf_t, 1, axis=0)
    meas_R = jnp.swapaxes(Rp, -1, -2) @ kf_R
    meas_t = jnp.einsum("kij,kj->ki", jnp.swapaxes(Rp, -1, -2), kf_t - tp)
    meas_R = meas_R.at[0].set(jnp.eye(3, dtype=jnp.float32))
    meas_t = meas_t.at[0].set(0.0)

    # loop edges: remap indices, drop edges that lost an endpoint
    le = jnp.arange(L)
    ok_edge = (le < state.n_loops) & keep[state.loop_i] & keep[state.loop_j]
    lorder = jnp.argsort(jnp.where(ok_edge, le, L + le))

    def gl(a):
        return a[lorder]

    return state._replace(
        kf_R=kf_R, kf_t=kf_t,
        kf_corner=g(state.kf_corner), kf_corner_valid=g(state.kf_corner_valid),
        kf_surf=g(state.kf_surf), kf_surf_valid=g(state.kf_surf_valid),
        kf_outlier=g(state.kf_outlier),
        kf_outlier_valid=g(state.kf_outlier_valid),
        kf_time=g(state.kf_time),
        kf_meas_R=meas_R, kf_meas_t=meas_t,
        n_kf=n_new,
        loop_i=gl(new_pos[state.loop_i]),
        loop_j=gl(new_pos[state.loop_j]),
        loop_R=gl(state.loop_R), loop_t=gl(state.loop_t),
        loop_w=gl(jnp.where(ok_edge, state.loop_w, 0.0)),
        n_loops=jnp.sum(ok_edge),
        map_stale=jnp.bool_(True),
    )


compact_keyframes = partial(jax.jit, static_argnames=("cfg",),
                            donate_argnames=("state",))(
    f32_matmuls(_compact_keyframes_impl))
