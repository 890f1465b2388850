"""Distributed pose-graph optimization over a device mesh.

The multi-host capability the reference lacks entirely (SURVEY.md §2.6 P5):
keyframe graph edges are partitioned across devices.  Each shard linearizes
its edges into 6x6 Jacobian blocks and accumulates partial normal-equation
blocks (tridiagonal chain blocks, loop blocks, gradient); ONE psum over the
mesh axis combines them — the collectives ride ICI.  The combined system is
then solved EXACTLY and replicated on every device by the same block-Thomas
+ Woodbury factorization as the single-device path (models/posegraph.py):
the pose vector (K poses x 6 dof, ~100 KB for 4096 keyframes) is tiny
compared to the edge data, so replicating the recursive solve costs nothing
while the per-edge work — the part that grows with trajectory length —
scales across the mesh.  This is the Schur-style reduction of BASELINE.json:
partial Hessian blocks reduced over the mesh, exact solve on the reduced
system.
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
from lego_loam_tpu.models.posegraph import (
    _apply_delta,
    _vee_chordal,
    direct_gn_delta,
    edge_blocks,
)


class EdgeList(NamedTuple):
    """Unified padded factor list.  E rows; kind 0=inactive, 1=between,
    2=prior.  `tri` marks chain edges (their src-dst coupling block lands in
    the tridiagonal part of the normal matrix); `lslot` is the loop-edge
    slot for rows that are loop factors (their coupling is handled by the
    Woodbury low-rank correction), -1 otherwise."""

    src: jnp.ndarray     # (E,) int32 pose index i
    dst: jnp.ndarray     # (E,) int32 pose index j
    Z_R: jnp.ndarray     # (E, 3, 3) measured relative rotation
    Z_t: jnp.ndarray     # (E, 3)
    w_rot: jnp.ndarray   # (E,)
    w_trans: jnp.ndarray  # (E,)
    kind: jnp.ndarray    # (E,) int32
    tri: jnp.ndarray     # (E,) bool
    lslot: jnp.ndarray   # (E,) int32


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
    src = jnp.concatenate([jnp.maximum(idx - 1, 0), state.loop_i,
                           jnp.zeros((1,), jnp.int32)])
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
    tri = jnp.concatenate([chain_active,
                           jnp.zeros((L + 1,), bool)])
    lslot = jnp.concatenate([jnp.full((K,), -1, jnp.int32),
                             jnp.arange(L, dtype=jnp.int32),
                             jnp.full((1,), -1, jnp.int32)])

    def pad(a, fill=0):
        pads = [(0, E - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pads, constant_values=fill)

    return EdgeList(src=pad(src.astype(jnp.int32)), dst=pad(dst.astype(jnp.int32)),
                    Z_R=pad(Z_R), Z_t=pad(Z_t),
                    w_rot=pad(w_rot), w_trans=pad(w_trans), kind=pad(kind),
                    tri=pad(tri), lslot=pad(lslot, fill=-1))


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


def _accumulate_blocks(edges: EdgeList, R, t, K: int, L: int):
    """Per-shard partial normal blocks from this shard's edges.

    Returns (D, U, b, A, B, r_loop): everything additive, so a psum over
    the mesh axis yields the full-graph blocks.  Loop-edge gradient rows
    are EXCLUDED from b (direct_gn_delta folds them from (A, B, r_loop))."""
    is_prior = edges.kind == 2
    is_loop = edges.lslot >= 0
    r, Ji, Jj = edge_blocks(R[edges.src], t[edges.src],
                            R[edges.dst], t[edges.dst],
                            edges.Z_R, edges.Z_t,
                            edges.w_rot, edges.w_trans, is_prior)
    # inactive rows already have zero weights -> zero r/Ji/Jj
    JiTJi = jnp.einsum("eab,eac->ebc", Ji, Ji)
    JjTJj = jnp.einsum("eab,eac->ebc", Jj, Jj)
    JiTJj = jnp.einsum("eab,eac->ebc", Ji, Jj)
    notloop = (~is_loop)[:, None, None]
    D = (jnp.zeros((K, 6, 6), jnp.float32)
         .at[edges.src].add(JiTJi * notloop)
         .at[edges.dst].add(JjTJj * notloop))
    U = jnp.zeros((K, 6, 6), jnp.float32).at[edges.src].add(
        JiTJj * edges.tri[:, None, None])
    b = (jnp.zeros((K, 6), jnp.float32)
         .at[edges.src].add(-jnp.einsum("eab,ea->eb", Ji, r) * notloop[..., 0])
         .at[edges.dst].add(-jnp.einsum("eab,ea->eb", Jj, r) * notloop[..., 0]))

    ls = jnp.where(is_loop, edges.lslot, 0)
    lmask = is_loop[:, None, None]
    A = jnp.zeros((L, 6, 6), jnp.float32).at[ls].add(Ji * lmask)
    B = jnp.zeros((L, 6, 6), jnp.float32).at[ls].add(Jj * lmask)
    r_loop = jnp.zeros((L, 6), jnp.float32).at[ls].add(r * lmask[..., 0])
    return D, U, b, A, B, r_loop


def _gn_step_from_shard(edges: EdgeList, R, t, li, lj, pose_active,
                        cfg: PipelineConfig, axis: str | None):
    """One exact GN step from an edge shard; block reductions psum'd over
    `axis` when set, then the direct solve runs (replicated)."""
    K = R.shape[0]
    L = li.shape[0]
    parts = _accumulate_blocks(edges, R, t, K, L)
    if axis:
        parts = jax.lax.psum(parts, axis)
    D, U, b, A, B_loop, r_loop = parts
    # inactive poses get an identity block so the factorization stays SPD
    D = D + jnp.where(pose_active, 0.0, 1.0)[:, None, None] * jnp.eye(6)
    x = direct_gn_delta(D, U, A, B_loop, li, lj, r_loop, b, cfg.pg_damping)
    R2, t2 = _apply_delta(R, t, x)

    # cost guard (same as models/posegraph.solve_pose_graph): accept the
    # float32-inexact step only if it reduces the true graph cost; the
    # per-shard partial costs combine with one extra psum
    def cost(R_, t_):
        r = edge_residuals(edges, R_, t_)
        c = jnp.sum(r * r)
        return jax.lax.psum(c, axis) if axis else c

    ok = cost(R2, t2) < cost(R, t)
    return jnp.where(ok, R2, R), jnp.where(ok, t2, t)


@partial(jax.jit, static_argnames=("cfg",))
@f32_matmuls
def solve_pose_graph_single(state: MappingState, cfg: PipelineConfig):
    """Single-device reference path through the edge-list formulation."""
    edges = build_edge_list(state, cfg)
    pose_active = jnp.arange(cfg.max_keyframes) < state.n_kf

    def step(_, Rt):
        return _gn_step_from_shard(edges, Rt[0], Rt[1], state.loop_i,
                                   state.loop_j, pose_active, cfg, axis=None)

    R, t = jax.lax.fori_loop(0, cfg.pg_gn_iters, step,
                             (state.kf_R, state.kf_t))
    return R, t


def solve_pose_graph_sharded(state: MappingState, cfg: PipelineConfig,
                             mesh: Mesh, axis: str = "graph"):
    """Edge-sharded distributed solve.  Poses replicate; edges shard; the
    per-edge linearization + partial block accumulation happens per shard,
    one psum over `axis` (ICI on real hardware) combines the blocks, and
    the exact tridiagonal+Woodbury solve runs replicated."""
    n_dev = mesh.shape[axis]
    E = _round_up(cfg.max_keyframes + cfg.max_loop_edges + 1, 8 * n_dev)
    edges = build_edge_list(state, cfg, pad_to=E)
    pose_active = jnp.arange(cfg.max_keyframes) < state.n_kf

    from jax import shard_map

    @jax.jit
    @f32_matmuls
    @partial(shard_map, mesh=mesh,
             in_specs=(EdgeList(*(P(axis) for _ in range(9))),
                       P(), P(), P(), P(), P()),
             out_specs=(P(), P()),
             check_vma=False)
    def run(edge_shard, R, t, li, lj, pa):
        def step(_, Rt):
            return _gn_step_from_shard(edge_shard, Rt[0], Rt[1], li, lj, pa,
                                       cfg, axis=axis)

        return jax.lax.fori_loop(0, cfg.pg_gn_iters, step, (R, t))

    return run(edges, state.kf_R, state.kf_t, state.loop_i, state.loop_j,
               pose_active)
