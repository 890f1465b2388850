"""Batched multi-sequence SLAM: B independent sequences on one chip.

The reference processes one sensor stream per machine (four ROS processes
wired to one lidar; run.launch:13-16).  Because every stage here is a pure
fixed-shape function of (state, scan), a whole fleet's worth of sequences
vmaps over the chunked pipeline: the per-scan work of B sequences fuses into
one device program whose kernels are B times wider — feeding the MXU/VPU far
better than one VLP-16's 28k points can.  This is the throughput
configuration for offline replay / fleet reprocessing, not a latency mode.

The mapping / loop-closure cadence predicates stay UNBATCHED (all sequences
share frame indices), so the `lax.cond` gates remain true conditionals
instead of degrading to execute-both-branches selects under vmap.
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lego_loam_tpu.config import PipelineConfig
from lego_loam_tpu.models import mapping as mp
from lego_loam_tpu.models import odometry as odo
from lego_loam_tpu.models.pipeline import ChunkResult, chunk_steps
from lego_loam_tpu.utils.precision import f32_matmuls


@partial(jax.jit, static_argnames=("cfg", "use_ring", "loop_every"))
@f32_matmuls
def batch_chunk_steps(ostates, mstates, xyz, valid, ring, frames, times,
                      cfg: PipelineConfig, use_ring: bool, loop_every: int):
    """vmap of chunk_steps over a leading batch axis.

    xyz: (B, C, N, 3); frames/times: (C,) shared across the batch (unbatched
    so the cadence conditionals stay scalar — see module docstring).
    """

    def one(o, m, x, v, r):
        # compact_inline=False: the device-side compaction trigger is a
        # lax.cond on the (batched) n_kf — under vmap it would degrade to a
        # select that argsorts every sequence's pool at every mapping solve.
        # The host driver below does the per-chunk check instead.
        return chunk_steps(o, m, x, v, r, frames, times,
                           cfg, use_ring, loop_every, compact_inline=False)

    return jax.vmap(one)(ostates, mstates, xyz, valid, ring)


def _stack_states(cfg: PipelineConfig, batch: int):
    o1 = odo.init_state(cfg)
    m1 = mp.init_state(cfg)
    rep = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), t)
    return rep(o1), rep(m1)


@dataclass
class BatchPipeline:
    """Host driver for B aligned sequences (same scan clock, same sensor).

    Feed chunks with process_chunk(xyz (B, C, N, 3), ...); per-sequence
    states advance exactly as B independent LegoLoamPipeline instances would
    (lidar-only, chunked mode)."""

    cfg: PipelineConfig
    batch: int
    loop_check_every: int = 10

    def __post_init__(self):
        self.ostate, self.mstate = _stack_states(self.cfg, self.batch)
        self.frame = 0
        self.trajectory: list = []   # (B, C, 3) device blocks per chunk

    def process_chunk(self, xyz, valid, ring=None, t0: float | None = None
                      ) -> ChunkResult:
        cfg = self.cfg
        t0 = (float(t0) if t0 is not None
              else self.frame * cfg.sensor.scan_period)
        t0w = _time.perf_counter()

        use_ring = cfg.sensor.use_ring
        xyz = jnp.asarray(xyz, jnp.float32)
        if xyz.ndim != 4 or xyz.shape[0] != self.batch:
            raise ValueError(
                f"expected xyz (B={self.batch}, C, N, 3), got {xyz.shape}")
        B, C = xyz.shape[:2]
        valid = jnp.asarray(valid)
        if use_ring and ring is None:
            raise ValueError(
                f"sensor {cfg.sensor.name} expects a ring channel; pass "
                "ring= or use an elevation-math preset (use_ring=False)")
        ring_arr = (jnp.asarray(ring, jnp.int32) if ring is not None
                    else jnp.zeros(xyz.shape[:3], jnp.int32))
        frames = jnp.arange(self.frame, self.frame + C, dtype=jnp.int32)
        times = jnp.float32(t0) + jnp.arange(C, dtype=jnp.float32) \
            * cfg.sensor.scan_period

        # pool thinning (one host pull per chunk, worst sequence governs)
        reserve = max(40, -(-C // cfg.mapping_process_every) + 1)
        if int(jnp.max(self.mstate.n_kf)) >= cfg.max_keyframes - reserve:
            self.mstate = jax.vmap(
                lambda m: mp.compact_keyframes(m, cfg))(self.mstate)

        self.ostate, self.mstate, outs = batch_chunk_steps(
            self.ostate, self.mstate, xyz, valid, ring_arr, frames, times,
            cfg, use_ring, self.loop_check_every)
        opose, fused, mpose, did_map, closed, stats = outs
        self.frame += C
        self.trajectory.append(fused.t)          # (B, C, 3), lazy
        wall_ms = (_time.perf_counter() - t0w) * 1e3
        return ChunkResult(
            odom_poses=opose, fused_poses=fused, mapped_poses=mpose,
            did_map=did_map[0], loop_closed=closed, stats=stats,
            wall_ms=wall_ms)

    def keyframe_counts(self) -> np.ndarray:
        return np.asarray(self.mstate.n_kf)
