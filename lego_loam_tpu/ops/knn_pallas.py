"""Pallas TPU kernel: fused k-nearest-neighbor search (k <= 8).

The XLA path (ops/knn.py) materializes the full (Q, N) squared-distance
matrix in HBM and then runs top-k over it.  At mapping sizes (4096 queries x
32768 map points, f32) that is a 512 MB intermediate written and re-read per
association round — pure HBM traffic that dwarfs the actual math (the
reference instead pays this cost as per-point KD-tree traversals,
mapOptmization.cpp:1099-1181).

This kernel never materializes the matrix: each (TQ, TN) distance tile is
computed in VMEM (one small dot on the MXU plus VPU elementwise) and folded
into a running sorted top-k list per query row, also VMEM-resident.  HBM
traffic drops to reading the points once per query tile plus writing (Q, 8)
outputs.

Numerics: the kernel ranks by ``rr - 2 q.r`` (adding the per-row constant
|q|^2 cannot change the order within a row); the caller adds ``qq`` back so
returned distances equal the exact f32 ``|q - r|^2`` of the XLA path.
Invalid reference points carry a +1e30 offset, so they rank last and their
returned "distance" stays huge — same contract as ops/knn.sq_dist_matrix.
Tie-breaking is lowest-index-first, matching lax.top_k.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIGF = 1e30      # python literals: kernels must not capture traced constants
_BIGI = 1 << 30
_SLOTS = 8        # top-k list width (k <= 8); lane-padded anyway


def _kernel(qt_ref, rt_ref, rr_ref, outd_ref, outi_ref, bestd, besti, *,
            k: int, n_tile: int):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        bestd[:] = jnp.full(bestd.shape, _BIGF, jnp.float32)
        besti[:] = jnp.zeros(besti.shape, jnp.int32)

    qt = qt_ref[:]                  # (3, TQ)
    rt = rt_ref[:]                  # (3, TN)
    rr = rr_ref[:]                  # (1, TN), |r|^2 (+BIG if invalid)

    # (TQ, TN) partial distance: rr - 2 q.r  (|q|^2 added by the caller)
    d2 = rr - 2.0 * jax.lax.dot_general(
        qt, rt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    ks = jax.lax.broadcasted_iota(jnp.int32, bestd.shape, 1)
    base = j * n_tile
    for _ in range(k):
        m = jnp.min(d2, axis=1, keepdims=True)                   # (TQ, 1)
        am = jnp.min(jnp.where(d2 == m, lane, _BIGI), axis=1,
                     keepdims=True)                              # (TQ, 1)
        d2 = jnp.where(lane == am, _BIGF, d2)
        # sorted insert into the running top-k row lists
        bd, bi = bestd[:], besti[:]
        pos = jnp.sum((bd < m).astype(jnp.int32), axis=1, keepdims=True)
        bestd[:] = jnp.where(ks < pos, bd,
                             jnp.where(ks == pos, m, pltpu.roll(bd, 1, 1)))
        besti[:] = jnp.where(ks < pos, bi,
                             jnp.where(ks == pos, am + base,
                                       pltpu.roll(bi, 1, 1)))

    @pl.when(j == n_j - 1)
    def _():
        outd_ref[:] = bestd[:]
        outi_ref[:] = besti[:]


@partial(jax.jit, static_argnames=("k", "q_tile", "n_tile", "interpret"))
def knn_pallas(query, ref, ref_valid, k: int, q_tile: int = 256,
               n_tile: int = 2048, interpret: bool = False):
    """Fused kNN: returns (idx (Q, k) int32, d2 (Q, k) f32), ascending.

    Same contract as ops/knn.knn with exact=True: exact f32 distances,
    invalid refs rank last with d2 >= 1e30, ties broken by lowest index.
    """
    if not 1 <= k <= _SLOTS:
        raise ValueError(f"knn_pallas supports k <= {_SLOTS}, got {k}")
    Q, N = query.shape[0], ref.shape[0]
    q_tile = min(q_tile, _round_up(Q, 128))
    n_tile = min(n_tile, _round_up(N, 128))
    Qp, Np = _round_up(Q, q_tile), _round_up(N, n_tile)

    qt = jnp.zeros((3, Qp), jnp.float32).at[:, :Q].set(query.T)
    rt = jnp.zeros((3, Np), jnp.float32).at[:, :N].set(ref.T)
    rr = jnp.sum(rt * rt, axis=0)
    rr = rr.at[:N].add(jnp.where(ref_valid, 0.0, _BIGF))
    rr = rr.at[N:].set(_BIGF)                      # padded refs rank last
    rr = rr.reshape(1, Np)

    grid = (Qp // q_tile, Np // n_tile)
    outd, outi = pl.pallas_call(
        partial(_kernel, k=k, n_tile=n_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, q_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((Qp, _SLOTS), jnp.float32),
            jax.ShapeDtypeStruct((Qp, _SLOTS), jnp.int32),
        ),
        out_specs=(
            pl.BlockSpec((q_tile, _SLOTS), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, _SLOTS), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((q_tile, _SLOTS), jnp.float32),
            pltpu.VMEM((q_tile, _SLOTS), jnp.int32),
        ],
        interpret=interpret,
    )(qt, rt, rr)

    qq = jnp.sum(query * query, axis=1, keepdims=True)
    d2 = jnp.maximum(outd[:Q, :k] + qq, 0.0)
    # keep the invalid/padded sentinel huge rather than huge-plus-|q|^2
    d2 = jnp.where(outd[:Q, :k] >= _BIGF * 0.5, outd[:Q, :k], d2)
    return outi[:Q, :k], d2


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
