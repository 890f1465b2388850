"""Pallas TPU kernel for segmentation label propagation.

The XLA path (ops/segmentation.py) runs each fixpoint sweep as ~30 separate
HLO ops (rolls + associative scans) with HBM round-trips between them.  This
kernel keeps the whole (n_scan, horizon_scan) problem resident in VMEM and
runs the entire fixpoint loop in one kernel launch:

  * row runs: Hillis-Steele segmented min-scans by index doubling (log2(2H)
    steps of roll+mask+min on the VPU); column wraparound is handled with
    the doubled-array trick (scan [x, x], read the valid half);
  * column runs: same doubling over the n_scan rows;
  * 4-neighbor min with circular columns via pltpu.roll;
  * convergence check as an in-kernel while_loop on a scalar reduction.

Inputs/outputs mirror ops/segmentation.build_edges conventions, so the two
backends are interchangeable (and tested equal).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = (1 << 30)  # python literal: pallas kernels must not capture traced constants


def _shift_right(v, d, fill):
    """v[i-d] at position i along axis 1; first d columns get `fill`."""
    out = pltpu.roll(v, d, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(col >= d, out, fill)


def _shift_left(v, d, fill):
    out = pltpu.roll(v, v.shape[1] - d, 1)   # roll takes non-negative shifts
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(col < v.shape[1] - d, out, fill)


def _shift_down(v, d, fill):
    """v[i-d] at row i (axis 0)."""
    out = pltpu.roll(v, d, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    return jnp.where(row >= d, out, fill)


def _shift_up(v, d, fill):
    out = pltpu.roll(v, v.shape[0] - d, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    return jnp.where(row < v.shape[0] - d, out, fill)


def _seg_min_scan(m, e, shift, steps):
    """Segmented min-scan by doubling.  e[i]: connected to the previous
    element in scan direction.  Returns per-element min over its maximal
    connected run prefix."""
    d = 1
    for _ in range(steps):
        ms = shift(m, d, _BIG)
        es = shift(e, d, 0)
        m = jnp.where(e > 0, jnp.minimum(m, ms), m)
        e = e * es
        d *= 2
    return m


def _kernel(labels_ref, cl_ref, cr_ref, cu_ref, cd_ref, max_sweeps_ref,
            out_ref):
    labels0 = labels_ref[:]
    cl = cl_ref[:]          # connected to (r, c-1), circular
    cr = cr_ref[:]          # connected to (r, c+1), circular
    cu = cu_ref[:]          # connected to (r-1, c)
    cd = cd_ref[:]          # connected to (r+1, c)
    R, H = labels0.shape
    row_steps = max(1, (2 * H - 1).bit_length())
    col_steps = max(1, (R - 1).bit_length())

    cl2 = jnp.concatenate([cl, cl], axis=1)
    cr2 = jnp.concatenate([cr, cr], axis=1)

    def sweep(labels):
        # 4-neighbor min (circular in columns)
        n = jnp.minimum(
            jnp.where(cl > 0, pltpu.roll(labels, 1, 1), _BIG),
            jnp.where(cr > 0, pltpu.roll(labels, H - 1, 1), _BIG))
        n = jnp.minimum(n, jnp.where(cu > 0, _shift_down(labels, 1, _BIG), _BIG))
        n = jnp.minimum(n, jnp.where(cd > 0, _shift_up(labels, 1, _BIG), _BIG))
        labels = jnp.minimum(labels, n)

        # row runs, both directions, wraparound via doubling
        lab2 = jnp.concatenate([labels, labels], axis=1)
        back = _seg_min_scan(lab2, cl2, _shift_right, row_steps)[:, H:]
        fwd = _seg_min_scan(lab2, cr2, _shift_left, row_steps)[:, :H]
        labels = jnp.minimum(labels, jnp.minimum(back, fwd))

        # column runs
        down = _seg_min_scan(labels, cu, _shift_down, col_steps)
        up = _seg_min_scan(labels, cd, _shift_up, col_steps)
        return jnp.minimum(labels, jnp.minimum(down, up))

    def cond(state):
        it, labels, changed = state
        return changed & (it < max_sweeps_ref[0])

    def body(state):
        it, labels, _ = state
        new = sweep(labels)
        return it + 1, new, jnp.any(new != labels)

    _, labels, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), labels0, True))
    out_ref[:] = labels


@partial(jax.jit, static_argnames=("max_sweeps", "interpret"))
def propagate_labels_pallas(labels0, conn_left, edge_h, conn_up, conn_down,
                            max_sweeps: int = 64, interpret: bool = False):
    """Drop-in replacement for the XLA label-propagation loop.

    Masks arrive as bool (converted to int32 lanes for the kernel).
    """
    R, H = labels0.shape
    args = (
        labels0.astype(jnp.int32),
        conn_left.astype(jnp.int32),
        edge_h.astype(jnp.int32),
        conn_up.astype(jnp.int32),
        conn_down.astype(jnp.int32),
        jnp.full((1,), max_sweeps, jnp.int32),
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((R, H), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
