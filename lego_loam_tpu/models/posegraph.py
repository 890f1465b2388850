"""SE(3) pose-graph optimization (gtsam/iSAM2 replacement).

The reference feeds a prior + odometry BetweenFactors + loop BetweenFactors
into gtsam's iSAM2 (reference: mapOptmization.cpp:229-232, 1376-1398,
939-941) and reads corrected keyframe poses back.  This module solves the
same graph as one batch Gauss-Newton program, structured for TPU:

  * residuals are computed for ALL edges at once: the chain edges are a
    vectorized slice of the keyframe pool, loop edges a padded array;
  * rotation residuals use the chordal form 0.5*vee(E - E^T) (smooth
    polynomial of the entries — no branchy log map in the autodiff path);
  * the normal equations are solved matrix-free by conjugate gradients,
    where each Hx product is one jvp+vjp through the residual function —
    per-edge batched arithmetic, no sparse matrix assembly.  This is the
    structure that shards across a device mesh: edges partition, and the
    CG reductions become psums over ICI (parallel/distributed_graph.py);
  * without loop edges the optimum of prior+chain is exactly the recursive
    composition of the measurements (what iSAM2 returns in the default
    loop-closure-off configuration) — solved in closed form;
  * a new loop edge first pre-distributes its error along the chain
    (linear interpolation between the endpoints), then GN+CG polishes —
    the warm start covers the low-frequency mode CG is slowest on.

Noise defaults deviate from the reference deliberately: gtsam is fed
odometry variances of 1e-8 (0.1 mm std) against loop variances of ~0.3
(utility.h / mapOptmization.cpp:347-350, 932-934), which makes a single
loop factor's correction microscopic relative to the chain's stiffness.
Our defaults use realistic scan-to-map noise so loop closures actually
close; the reference values are reachable through PipelineConfig.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lego_loam_tpu.config import PipelineConfig
from lego_loam_tpu.utils.precision import f32_matmuls
from lego_loam_tpu.models.mapping import MappingState
from lego_loam_tpu.utils.math3d import Pose, so3_exp


def _vee_chordal(E):
    """0.5 * vee(E - E^T): smooth rotation residual, ~ axis*sin(angle)."""
    return 0.5 * jnp.stack([
        E[..., 2, 1] - E[..., 1, 2],
        E[..., 0, 2] - E[..., 2, 0],
        E[..., 1, 0] - E[..., 0, 1],
    ], -1)


def _apply_delta(R, t, x):
    """Left-multiplicative tangent update on stacked poses: x is (K, 6)."""
    dR = so3_exp(x[..., :3])
    return dR @ R, t + x[..., 3:]


def graph_residuals(R, t, state: MappingState, cfg: PipelineConfig):
    """All weighted residual rows as one (K + L + 1, 6) array.

    Rows: chain edges (slot i holds edge i-1 -> i; slot 0 inactive),
    then loop edges, then the prior on pose 0.
    """
    K = R.shape[0]
    idx = jnp.arange(K)
    active_chain = (idx >= 1) & (idx < state.n_kf)

    # chain: E = Z^-1 T_{i-1}^-1 T_i
    Ri_prev = jnp.roll(R, 1, axis=0)
    ti_prev = jnp.roll(t, 1, axis=0)
    rel_R = jnp.swapaxes(Ri_prev, -1, -2) @ R
    rel_t = jnp.einsum("kij,kj->ki", jnp.swapaxes(Ri_prev, -1, -2), t - ti_prev)
    E_R = jnp.swapaxes(state.kf_meas_R, -1, -2) @ rel_R
    E_t = jnp.einsum("kij,kj->ki",
                     jnp.swapaxes(state.kf_meas_R, -1, -2),
                     rel_t - state.kf_meas_t)
    w_rot = 1.0 / cfg.pg_rot_sigma
    w_tr = 1.0 / cfg.pg_trans_sigma
    r_chain = jnp.concatenate([
        _vee_chordal(E_R) * w_rot, E_t * w_tr], -1)
    r_chain = r_chain * active_chain[:, None]

    # loops: E = Z_ij^-1 T_i^-1 T_j
    li, lj = state.loop_i, state.loop_j
    L = li.shape[0]
    active_loop = jnp.arange(L) < state.n_loops
    Ri, ti = R[li], t[li]
    Rj, tj = R[lj], t[lj]
    rel_R = jnp.swapaxes(Ri, -1, -2) @ Rj
    rel_t = jnp.einsum("kij,kj->ki", jnp.swapaxes(Ri, -1, -2), tj - ti)
    E_R = jnp.swapaxes(state.loop_R, -1, -2) @ rel_R
    E_t = jnp.einsum("kij,kj->ki",
                     jnp.swapaxes(state.loop_R, -1, -2),
                     rel_t - state.loop_t)
    lw = jnp.sqrt(jnp.maximum(state.loop_w, 0.0))
    r_loop = jnp.concatenate([_vee_chordal(E_R), E_t], -1) * lw[:, None]
    r_loop = r_loop * active_loop[:, None]

    # prior pins pose 0 at its current estimate's origin chart
    w_prior = 1.0 / cfg.pg_prior_sigma
    r_prior = jnp.concatenate([
        _vee_chordal(R[0]) * w_prior, t[0] * w_prior])[None, :]

    return jnp.concatenate([r_chain, r_loop, r_prior], axis=0)


def _cg(matvec, b, iters):
    """Plain conjugate gradients for H x = b (H SPD)."""
    x0 = jnp.zeros_like(b)

    def body(_, carry):
        x, r, p, rs = carry
        Hp = matvec(p)
        denom = jnp.sum(p * Hp)
        alpha = jnp.where(denom > 1e-12, rs / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * Hp
        rs_new = jnp.sum(r * r)
        beta = jnp.where(rs > 1e-12, rs_new / rs, 0.0)
        p = r + beta * p
        return x, r, p, rs_new

    out = jax.lax.fori_loop(0, iters, body, (x0, b, b, jnp.sum(b * b)))
    return out[0]


@partial(jax.jit, static_argnames=("cfg",))
@f32_matmuls
def solve_pose_graph(state: MappingState, cfg: PipelineConfig) -> MappingState:
    """Batch GN over the full graph; returns the state with corrected
    keyframe poses (the aft_mapped latch is corrected by the same delta as
    the newest keyframe — the reference's correctPoses + transformAftMapped
    update, mapOptmization.cpp:1429-1440, 1456-1478)."""
    K = cfg.max_keyframes
    last = jnp.maximum(state.n_kf - 1, 0)
    T_last_old = Pose(state.kf_R[last], state.kf_t[last])

    def gn_step(_, Rt):
        R, t = Rt

        def r_of(x):
            R2, t2 = _apply_delta(R, t, x.reshape(K, 6))
            return graph_residuals(R2, t2, state, cfg).reshape(-1)

        x0 = jnp.zeros((K * 6,), jnp.float32)
        r0, jvp_fn = jax.linearize(r_of, x0)
        vjp_fn = jax.linear_transpose(jvp_fn, x0)

        def matvec(v):
            return vjp_fn(jvp_fn(v))[0] + 1e-8 * v

        b = -vjp_fn(r0)[0]
        x = _cg(matvec, b, cfg.pg_cg_iters)
        R, t = _apply_delta(R, t, x.reshape(K, 6))
        return R, t

    R, t = jax.lax.fori_loop(0, cfg.pg_gn_iters, gn_step, (state.kf_R, state.kf_t))

    # keep untouched (beyond-n_kf) slots exactly as they were
    alive = (jnp.arange(K) < state.n_kf)
    R = jnp.where(alive[:, None, None], R, state.kf_R)
    t = jnp.where(alive[:, None], t, state.kf_t)

    T_last_new = Pose(R[last], t[last])
    delta = T_last_new.compose(T_last_old.inverse())
    aft = delta.compose(state.aft_mapped)

    return state._replace(kf_R=R, kf_t=t, aft_mapped=aft)


def distribute_loop_error(state: MappingState, i, j, Z: Pose,
                          cfg: PipelineConfig) -> MappingState:
    """Warm start after adding loop edge i -> j with measurement Z: spread
    the loop discrepancy linearly over keyframes j..i.  This closes the bulk
    of the low-frequency correction so CG only polishes."""
    Ti = Pose(state.kf_R[i], state.kf_t[i])
    Tj = Pose(state.kf_R[j], state.kf_t[j])
    # pose i implied by the loop measurement: Ti' = Tj Z^-1
    Ti_target = Tj.compose(Z.inverse())
    err_t = Ti_target.t - Ti.t

    K = state.kf_R.shape[0]
    idx = jnp.arange(K, dtype=jnp.float32)
    fi = i.astype(jnp.float32)
    fj = j.astype(jnp.float32)
    frac = jnp.clip((idx - fj) / jnp.maximum(fi - fj, 1.0), 0.0, 1.0)
    alive = (jnp.arange(K) < state.n_kf)
    t = state.kf_t + jnp.where(alive, frac, 0.0)[:, None] * err_t
    aft = state.aft_mapped._replace(t=state.aft_mapped.t + err_t)
    return state._replace(kf_t=t, aft_mapped=aft)
