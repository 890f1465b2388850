"""Pallas TPU kernel: the feature-pick loops in ONE kernel launch.

The XLA pick loop (ops/features.label_features, sector_parallel mode) runs
24 sequential fori_loop steps (20 corner + 4 surf picks), each lowering to a
handful of small device kernels over (16, 1800) grids — launch latency, not
compute, dominates (~2.5 ms/scan of the front-end budget on a v5e).  The
whole problem is < 1 MB, so this kernel keeps every array VMEM-resident and
runs both pick loops as in-kernel fori_loops: identical picks, zero
intermediate launches.

Semantics are exactly ops/features.picks_for with sector_parallel=True
(reference: featureAssociation.cpp:680-784): per pick step, every sector
takes its masked curvature argmax (corner pass, descending) or argmin (surf
pass), labels it, and suppresses the +-5-cell reach band (column-gap and
ring-bound limited, precomputed as reach_l/reach_r) before the next step.
Ties break to the lowest index, matching jnp.argmax.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1.0e30
_BIGI = 1 << 30


def _kernel(curv_ref, cbase_ref, sbase_ref, picked_ref, rl_ref, rr_ref,
            sp_ref, ep_ref, sok_ref, labels_ref, picked_out_ref, *,
            n_sectors: int, n_corner: int, n_sharp: int, n_surf: int):
    curv = curv_ref[:]               # (R, W) f32
    cbase = cbase_ref[:]             # (R, W) i32 (0/1)
    sbase = sbase_ref[:]
    picked = picked_ref[:]           # (R, W) i32
    rl = rl_ref[:]                   # (R, W) i32
    rr = rr_ref[:]
    R, W = curv.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)

    labels = jnp.zeros((R, W), jnp.int32)

    def pass_body(base, sign, n_picks, label_of, suppress_last,
                  labels, picked):
        def step(k, st):
            labels, picked = st
            # all sectors pick against the same `picked` snapshot, exactly
            # like the XLA sector_parallel path (bands apply after the loop)
            new_picked = picked
            for s in range(n_sectors):
                sp = sp_ref[:, s][:, None]           # (R, 1)
                ep = ep_ref[:, s][:, None]
                sok = sok_ref[:, s][:, None]
                elig = ((base > 0) & (picked == 0) & (sok > 0)
                        & (lane >= sp) & (lane <= ep))
                score = jnp.where(elig, sign * curv, _NEG_INF)
                m = jnp.max(score, axis=1, keepdims=True)       # (R, 1)
                has = m > _NEG_INF * 0.5
                am = jnp.min(jnp.where(score == m, lane, _BIGI),
                             axis=1, keepdims=True)             # (R, 1)
                at = (lane == am) & has
                labels = jnp.where(at, label_of(k), labels)
                sup = has & (suppress_last | (k < n_picks - 1))
                rl_s = jnp.max(jnp.where(at, rl, 0), axis=1, keepdims=True)
                rr_s = jnp.max(jnp.where(at, rr, 0), axis=1, keepdims=True)
                band = ((lane >= am - rl_s) & (lane <= am + rr_s) & sup)
                new_picked = jnp.where(band, 1, new_picked)
            return labels, new_picked

        return jax.lax.fori_loop(0, n_picks, step, (labels, picked))

    labels, picked = pass_body(
        cbase, 1.0, n_corner,
        lambda k: jnp.where(k < n_sharp, 2, 1), True, labels, picked)
    labels, picked = pass_body(
        sbase, -1.0, n_surf, lambda k: -1, False, labels, picked)

    labels_ref[:] = labels
    picked_out_ref[:] = picked


@partial(jax.jit, static_argnames=("n_sectors", "n_corner", "n_sharp",
                                   "n_surf", "interpret"))
def pick_features_pallas(curv, corner_base, surf_base, picked0,
                         reach_l, reach_r, sp_all, ep_all, ok_all,
                         n_sectors: int, n_corner: int, n_sharp: int,
                         n_surf: int, interpret: bool = False):
    """Run both pick passes; returns (labels (R, W) i32, picked (R, W) bool).

    Inputs mirror the intermediates of ops/features.label_features: curvature
    grid, per-pass eligibility bases, the occlusion-picked mask, suppression
    reach, and per-ring sector bounds (R, S).
    """
    R, W = curv.shape
    args = (
        curv.astype(jnp.float32),
        corner_base.astype(jnp.int32),
        surf_base.astype(jnp.int32),
        picked0.astype(jnp.int32),
        reach_l.astype(jnp.int32),
        reach_r.astype(jnp.int32),
        sp_all.astype(jnp.int32),
        ep_all.astype(jnp.int32),
        ok_all.astype(jnp.int32),
    )
    labels, picked = pl.pallas_call(
        partial(_kernel, n_sectors=n_sectors, n_corner=n_corner,
                n_sharp=n_sharp, n_surf=n_surf),
        out_shape=(
            jax.ShapeDtypeStruct((R, W), jnp.int32),
            jax.ShapeDtypeStruct((R, W), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(*args)
    return labels, picked > 0
