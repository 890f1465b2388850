"""Distributed pose-graph optimization over a device mesh.

The multi-host capability the reference lacks entirely (SURVEY.md §2.6 P5):
keyframe graph edges are partitioned across devices; every Gauss-Newton /
conjugate-gradient matrix product is computed as per-shard J^T J x partial
sums combined with a psum over the mesh axis — the collectives ride ICI.

Design: the pose vector (K poses x 6 dof, ~100 KB for 4096 keyframes) is
replicated — it is tiny compared to the edge data and the per-edge work.
Edges are the unit of sharding: a unified edge list (chain between-factors +
loop factors + the prior as a virtual edge) is split evenly; each shard
gathers the two endpoint poses it needs from the replicated vector.  This is
the Schur-style reduction of BASELINE.json expressed matrix-free.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lego_loam_tpu.config import PipelineConfig
from lego_loam_tpu.utils.precision import f32_matmuls
from lego_loam_tpu.models.mapping import MappingState
from lego_loam_tpu.models.posegraph import _apply_delta, _vee_chordal
from lego_loam_tpu.utils.math3d import Pose


class EdgeList(NamedTuple):
    """Unified padded factor list.  E rows; kind 0=inactive, 1=between,
    2=prior."""

    src: jnp.ndarray     # (E,) int32 pose index i
    dst: jnp.ndarray     # (E,) int32 pose index j
    Z_R: jnp.ndarray     # (E, 3, 3) measured relative rotation
    Z_t: jnp.ndarray     # (E, 3)
    w_rot: jnp.ndarray   # (E,)
    w_trans: jnp.ndarray  # (E,)
    kind: jnp.ndarray    # (E,) int32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_edge_list(state: MappingState, cfg: PipelineConfig,
                    pad_to: int | None = None) -> EdgeList:
    """Chain + loop + prior factors as one padded list (jit-friendly)."""
    K = cfg.max_keyframes
    L = cfg.max_loop_edges
    E = pad_to or _round_up(K + L + 1, 8)

    idx = jnp.arange(K)
    chain_active = (idx >= 1) & (idx < state.n_kf)
    src = jnp.concatenate([idx - 1, state.loop_i, jnp.zeros((1,), jnp.int32)])
    dst = jnp.concatenate([idx, state.loop_j, jnp.zeros((1,), jnp.int32)])
    Z_R = jnp.concatenate([state.kf_meas_R, state.loop_R,
                           jnp.eye(3, dtype=jnp.float32)[None]])
    Z_t = jnp.concatenate([state.kf_meas_t, state.loop_t,
                           jnp.zeros((1, 3), jnp.float32)])

    loop_active = jnp.arange(L) < state.n_loops
    lw = jnp.sqrt(jnp.maximum(state.loop_w, 0.0))
    w_rot = jnp.concatenate([
        jnp.where(chain_active, 1.0 / cfg.pg_rot_sigma, 0.0),
        jnp.where(loop_active, lw, 0.0),
        jnp.full((1,), 1.0 / cfg.pg_prior_sigma),
    ])
    w_trans = jnp.concatenate([
        jnp.where(chain_active, 1.0 / cfg.pg_trans_sigma, 0.0),
        jnp.where(loop_active, lw, 0.0),
        jnp.full((1,), 1.0 / cfg.pg_prior_sigma),
    ])
    kind = jnp.concatenate([
        jnp.where(chain_active, 1, 0),
        jnp.where(loop_active, 1, 0),
        jnp.full((1,), 2, jnp.int32),
    ]).astype(jnp.int32)

    def pad(a, fill=0):
        pads = [(0, E - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pads, constant_values=fill)

    return EdgeList(src=pad(src.astype(jnp.int32)), dst=pad(dst.astype(jnp.int32)),
                    Z_R=pad(Z_R), Z_t=pad(Z_t),
                    w_rot=pad(w_rot), w_trans=pad(w_trans), kind=pad(kind))


def edge_residuals(edges: EdgeList, R, t):
    """(E, 6) weighted residual rows from replicated poses."""
    Ri, ti = R[edges.src], t[edges.src]
    Rj, tj = R[edges.dst], t[edges.dst]
    rel_R = jnp.swapaxes(Ri, -1, -2) @ Rj
    rel_t = jnp.einsum("kij,kj->ki", jnp.swapaxes(Ri, -1, -2), tj - ti)
    E_R = jnp.swapaxes(edges.Z_R, -1, -2) @ rel_R
    E_t = jnp.einsum("kij,kj->ki", jnp.swapaxes(edges.Z_R, -1, -2),
                     rel_t - edges.Z_t)
    r_between = jnp.concatenate(
        [_vee_chordal(E_R) * edges.w_rot[:, None],
         E_t * edges.w_trans[:, None]], -1)
    # prior: pins dst pose at its chart origin
    r_prior = jnp.concatenate(
        [_vee_chordal(Rj) * edges.w_rot[:, None],
         tj * edges.w_trans[:, None]], -1)
    r = jnp.where((edges.kind == 2)[:, None], r_prior, r_between)
    return r * (edges.kind > 0)[:, None]


def _gn_core(edges: EdgeList, R, t, cfg: PipelineConfig, axis: str | None):
    """One GN step on (R, t) given an edge shard.  If axis is set, gradient
    and CG reductions are psum'd over that mesh axis."""
    K = R.shape[0]

    def maybe_psum(v):
        return jax.lax.psum(v, axis) if axis else v

    def r_of(x):
        R2, t2 = _apply_delta(R, t, x.reshape(K, 6))
        return edge_residuals(edges, R2, t2).reshape(-1)

    x0 = jnp.zeros((K * 6,), jnp.float32)
    r0, jvp_fn = jax.linearize(r_of, x0)
    vjp_fn = jax.linear_transpose(jvp_fn, x0)

    def matvec(v):
        return maybe_psum(vjp_fn(jvp_fn(v))[0]) + 1e-8 * v

    b = -maybe_psum(vjp_fn(r0)[0])

    def cg_body_fixed(i, carry):
        x, r, p, rs = carry
        Hp = matvec(p)
        denom = jnp.sum(p * Hp)
        alpha = jnp.where(denom > 1e-12, rs / denom, 0.0)
        x2 = x + alpha * p
        r2 = r - alpha * Hp
        rs2 = jnp.sum(r2 * r2)
        beta = jnp.where(rs > 1e-12, rs2 / rs, 0.0)
        return x2, r2, r2 + beta * p, rs2

    x, *_ = jax.lax.fori_loop(0, cfg.pg_cg_iters, cg_body_fixed,
                              (x0, b, b, jnp.sum(b * b)))
    return _apply_delta(R, t, x.reshape(K, 6))


@partial(jax.jit, static_argnames=("cfg",))
@f32_matmuls
def solve_pose_graph_single(state: MappingState, cfg: PipelineConfig):
    """Single-device reference path through the edge-list formulation."""
    edges = build_edge_list(state, cfg)

    def step(_, Rt):
        return _gn_core(edges, Rt[0], Rt[1], cfg, axis=None)

    R, t = jax.lax.fori_loop(0, cfg.pg_gn_iters, step,
                             (state.kf_R, state.kf_t))
    return R, t


def solve_pose_graph_sharded(state: MappingState, cfg: PipelineConfig,
                             mesh: Mesh, axis: str = "graph"):
    """Edge-sharded distributed solve.  Poses replicate; edges shard; every
    gradient/Hx reduction is one psum over `axis` (ICI on real hardware)."""
    n_dev = mesh.shape[axis]
    E = _round_up(cfg.max_keyframes + cfg.max_loop_edges + 1, 8 * n_dev)
    edges = build_edge_list(state, cfg, pad_to=E)

    from jax import shard_map

    @jax.jit
    @f32_matmuls
    @partial(shard_map, mesh=mesh,
             in_specs=(EdgeList(*(P(axis) for _ in range(7))), P(), P()),
             out_specs=(P(), P()),
             check_vma=False)
    def run(edge_shard, R, t):
        def step(_, Rt):
            return _gn_core(edge_shard, Rt[0], Rt[1], cfg, axis=axis)

        return jax.lax.fori_loop(0, cfg.pg_gn_iters, step, (R, t))

    return run(edges, state.kf_R, state.kf_t)
