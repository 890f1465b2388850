"""Loop-closure detection and correction.

Equivalent of the reference's 1 Hz loop-closure thread
(reference: mapOptmization.cpp:802-954): find a keyframe within 7 m whose
timestamp is >30 s old, ICP-align the newest keyframe's cloud against a
+-25-keyframe history submap, and on success add a loop edge and re-optimize
the pose graph.  Here the whole check is one jitted fixed-shape program the
host driver calls periodically; the asynchronous thread + mutex machinery is
designed away (single-writer state).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lego_loam_tpu.config import PipelineConfig
from lego_loam_tpu.models.mapping import MappingState
from lego_loam_tpu.models.posegraph import (
    distribute_loop_error,
    solve_pose_graph,
)
from lego_loam_tpu.ops.icp import icp_align, plane_information
from lego_loam_tpu.ops.lin3 import eigvalsh3
from lego_loam_tpu.ops.voxel import voxel_downsample
from lego_loam_tpu.utils.math3d import Pose
from lego_loam_tpu.utils.precision import f32_matmuls


class LoopResult(NamedTuple):
    closed: jnp.ndarray     # bool
    candidate: jnp.ndarray  # int32 history keyframe index
    fitness: jnp.ndarray    # float32 ICP fitness
    drift: jnp.ndarray      # float32 translation discrepancy vs chain (m)
    obs_ratio: jnp.ndarray  # float32 lambda_min/lambda_max of the ICP
                            # point-to-plane information (1 = isotropic,
                            # ~0 = unobservable direction)

    @classmethod
    def empty(cls) -> "LoopResult":
        return cls(closed=jnp.bool_(False), candidate=jnp.int32(0),
                   fitness=jnp.float32(jnp.inf), drift=jnp.float32(0.0),
                   obs_ratio=jnp.float32(0.0))


def _keyframe_cloud(state: MappingState, idx, cfg: PipelineConfig,
                    transformed: bool = True):
    """Corner+surf block of keyframe idx, optionally in map frame."""
    pts = jnp.concatenate([state.kf_corner[idx], state.kf_surf[idx]], axis=0)
    val = jnp.concatenate(
        [state.kf_corner_valid[idx], state.kf_surf_valid[idx]], axis=0)
    if transformed:
        pts = pts @ state.kf_R[idx].T + state.kf_t[idx]
    return pts, val


def _detect(state: MappingState, time, cfg: PipelineConfig):
    """Loop-candidate detection from the (replicated) pose-level arrays:
    nearest alive keyframe within the search radius whose stamp is older
    than the loop time gap (mapOptmization.cpp:815-843)."""
    latest = jnp.maximum(state.n_kf - 1, 0)
    cur_pos = state.kf_t[latest]
    idx = jnp.arange(cfg.max_keyframes)
    alive = idx < state.n_kf
    d2 = jnp.sum((state.kf_t - cur_pos) ** 2, axis=1)
    old_enough = jnp.abs(state.kf_time - time) > cfg.loop_min_time_gap
    qualify = alive & old_enough & (
        d2 < cfg.history_keyframe_search_radius ** 2)
    cand = jnp.argmin(jnp.where(qualify, d2, 1e30)).astype(jnp.int32)
    # n_kf guard lives here (not in the host gate / chunk cond predicate) so
    # callers can gate purely on frame counters with no n_kf host pull
    found = (jnp.any(qualify) & (state.n_loops < cfg.max_loop_edges)
             & (state.n_kf > 2))
    return latest, cand, found


def _history_selection(state: MappingState, cand, time, cfg: PipelineConfig):
    """Indices + inclusion mask of the candidate's +-H keyframe history
    submap.  Keyframes from the CURRENT visit must not enter it: on short
    trajectories cand+H can reach the newest keyframes, and ICP would then
    match the source cloud against itself and report a perfect
    (self-)alignment.  (The reference has the same inclusion hazard,
    mapOptmization.cpp:845-852, it just never trips it on its 20k-keyframe
    datasets.)  "Current visit" = within half the loop time gap of now."""
    H = cfg.history_keyframe_search_num
    offs = jnp.arange(-H, H + 1)
    sel = jnp.clip(cand + offs, 0, cfg.max_keyframes - 1)
    sel_ok = (cand + offs >= 0) & (cand + offs < state.n_kf)
    sel_ok = sel_ok & (jnp.abs(state.kf_time[sel] - time)
                       > 0.5 * cfg.loop_min_time_gap)
    return sel, sel_ok


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
@f32_matmuls
def loop_closure_step(state: MappingState, time: jnp.ndarray,
                      cfg: PipelineConfig):
    """Detect + ICP + graph update.  Returns (state, LoopResult)."""
    latest, cand, found = _detect(state, time, cfg)

    # current keyframe cloud at its (possibly wrong) map pose
    src, src_val = _keyframe_cloud(state, latest, cfg)

    # history submap: candidate +- history_keyframe_search_num keyframes
    sel, sel_ok = _history_selection(state, cand, time, cfg)

    def gather(i, ok):
        pts, val = _keyframe_cloud(state, i, cfg)
        return pts, val & ok

    hist_pts, hist_val = jax.vmap(gather)(sel, sel_ok)
    hist_pts = hist_pts.reshape(-1, 3)
    hist_val = hist_val.reshape(-1)
    hist_pts, hist_val = voxel_downsample(
        hist_pts, hist_val, cfg.leaf_history, cfg.max_map_surf)
    return _loop_core(state, src, src_val, hist_pts, hist_val,
                      latest, cand, found, time, cfg)


def _loop_core(state: MappingState, src, src_val, hist_pts, hist_val,
               latest, cand, found, time, cfg: PipelineConfig):
    """ICP + acceptance gates + edge insert + pose-graph solve, given the
    already-gathered source cloud (map frame) and voxel-downsampled history
    submap.  Touches only pose-level (replicated) state fields, so the
    sharded back-end reuses it verbatim after a collective cloud gather
    (parallel/backend_sharded.loop_closure_step_sharded)."""
    K = cfg.max_keyframes
    idx = jnp.arange(K)
    alive = idx < state.n_kf

    T_icp, fitness = icp_align(
        src, src_val, hist_pts, hist_val, Pose.identity(),
        iters=cfg.loop_icp_iters,
        max_corr_dist=cfg.loop_icp_max_corr_dist,
        query_tile=cfg.nn_query_tile,
        nn_backend=cfg.nn_backend,
    )

    accept = found & (fitness < cfg.history_keyframe_fitness_score)

    # corrected latest pose and loop measurement Z = T_i'^-1 T_j
    T_latest = Pose(state.kf_R[latest], state.kf_t[latest])
    T_corr = T_icp.compose(T_latest)
    T_cand = Pose(state.kf_R[cand], state.kf_t[cand])
    Z = T_corr.inverse().compose(T_cand)
    # loop-edge information 1/sigma^2 with sigma = max(floor,
    # scale*sqrt(fitness)): the POSE error of a converged multi-thousand-
    # point alignment is systematic (voxel quantization, partial overlap),
    # not the per-point spread the reference feeds gtsam as variance
    # (mapOptmization.cpp:932-937) — see config.loop_sigma_floor
    sigma = jnp.maximum(cfg.loop_sigma_floor,
                        cfg.loop_sigma_scale * jnp.sqrt(fitness))
    w = 1.0 / (sigma * sigma)

    # ---- false-positive gates (new vs reference; see config knobs) ----
    # (a) drift consistency: the measurement may disagree with the chain
    # estimate only by what odometry drift can plausibly accumulate over
    # the chain path between the endpoints.  A tight ICP lock onto the
    # wrong structure implies a large correction over a short path.
    Z_est = T_latest.inverse().compose(T_cand)
    drift = jnp.linalg.norm(Z.t - Z_est.t)
    seg = jnp.where(alive & (idx >= 1),
                    jnp.linalg.norm(state.kf_meas_t, axis=-1), 0.0)
    cum = jnp.cumsum(seg)
    path = jnp.abs(cum[latest] - cum[cand])
    drift_ok = drift <= cfg.loop_drift_frac * path + cfg.loop_drift_abs
    cosang = 0.5 * (jnp.trace(Z_est.R.T @ Z.R) - 1.0)
    d_rot = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
    rot_ok = d_rot <= jnp.radians(cfg.loop_max_rot_correction_deg)
    # (b) observability: in self-similar geometry (smooth corridor) the
    # point-to-plane information of the converged alignment has a ~zero
    # eigenvalue along the slip direction — the "tight" fitness is
    # meaningless there and the measurement must not enter the graph.
    q_fit = src @ T_icp.R.T + T_icp.t
    H_tt = plane_information(q_fit, src_val, hist_pts, hist_val,
                             query_tile=cfg.nn_query_tile,
                             nn_backend=cfg.nn_backend)
    lam = eigvalsh3(H_tt[None])[0]
    obs_ratio = lam[0] / jnp.maximum(lam[2], 1e-9)
    obs_ok = ((obs_ratio >= cfg.loop_degen_eig_frac)
              | (cfg.loop_degen_eig_frac <= 0.0))

    accept = accept & drift_ok & rot_ok & obs_ok

    slot = jnp.minimum(state.n_loops, cfg.max_loop_edges - 1)

    def ins(arr, val):
        return jnp.where(accept, arr.at[slot].set(val), arr)

    with_edge = state._replace(
        loop_i=ins(state.loop_i, latest),
        loop_j=ins(state.loop_j, cand),
        loop_R=ins(state.loop_R, Z.R),
        loop_t=ins(state.loop_t, Z.t),
        loop_w=ins(state.loop_w, w),
        n_loops=jnp.where(accept, state.n_loops + 1, state.n_loops),
    )

    warm = distribute_loop_error(with_edge, latest, cand, Z, cfg)
    solved = solve_pose_graph(warm, cfg)

    new_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(accept, a, b), solved, with_edge)
    # keyframe poses moved: the cached local map must be re-assembled
    new_state = new_state._replace(map_stale=new_state.map_stale | accept)
    return new_state, LoopResult(closed=accept, candidate=cand,
                                 fitness=fitness, drift=drift,
                                 obs_ratio=obs_ratio)
