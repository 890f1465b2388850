"""Full SLAM pipeline: the reference's four ROS processes as two jitted
programs driven by a thin host loop.

Reference architecture (SURVEY.md §1): imageProjection -> featureAssociation
-> mapOptimization -> transformFusion as separate OS processes exchanging
serialized clouds at gated rates (200 Hz polls, stamp matching, 0.3 s
mapping throttle; featureAssociation.cpp:1817-1886, mapOptmization.cpp:
1487-1522).  Here:

  * front-end program: projection + segmentation + features + scan-to-scan
    odometry — one jit, runs every scan;
  * back-end program: scan-to-map + keyframe/pose-graph update — one jit,
    runs every cfg.mapping_process_every scans (the 0.3 s throttle made
    deterministic);
  * loop closure: one jit, every cfg.loop_check_every scans (the 1 Hz
    thread made deterministic);
  * fusion: a two-line compose at scan rate.

No drops, no stamp gates, no mutexes: the host loop is the only writer.
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lego_loam_tpu.config import PipelineConfig
from lego_loam_tpu.models import imu as imu_mod
from lego_loam_tpu.models import loop as lc
from lego_loam_tpu.models import mapping as mp
from lego_loam_tpu.models import odometry as odo
from lego_loam_tpu.models.fusion import fuse_pose

from lego_loam_tpu.ops.compaction import segment_scan
from lego_loam_tpu.ops.features import extract_features
from lego_loam_tpu.ops.projection import project_scan
from lego_loam_tpu.utils.math3d import Pose
from lego_loam_tpu.utils.precision import f32_matmuls

_fuse_jit = jax.jit(f32_matmuls(fuse_pose))


@partial(jax.jit, static_argnames=("cfg", "use_ring"))
@f32_matmuls
def frontend_step(ostate, xyz, valid, ring, bef_mapped, aft_mapped, t,
                  cfg: PipelineConfig, use_ring: bool, imu_buf=None):
    """scan -> features -> odometry pose -> fused pose.  One device
    program (fusion folded in to save a dispatch round-trip).

    When imu_buf is given, the whole reference IMU path runs inside this
    same program (featureAssociation.cpp ordering): odometry seeding from
    the integrated gyro/velocity (updateInitialGuess, :1639-1664), per-point
    IMU-attitude de-skew + dead-reckoned drift correction of the feature
    clouds (ShiftToStartIMU/TransformToStartIMU applied in adjustDistortion,
    :317-390, 560-607), and the AHRS attitude fold into the accumulated
    odometry pose (PluginIMURotation inside integrateTransformation,
    :955-1042, 1697-1725)."""
    if imu_buf is not None:
        si = imu_mod.scan_imu(imu_buf, t, cfg)
        ostate = ostate._replace(
            rel=imu_mod.odometry_seed(ostate.rel, si, cfg.sensor.scan_period))
    img = project_scan(xyz, valid, cfg, ring if use_ring else None)
    packed, o_rel, ground, seg = segment_scan(img, cfg)
    feats = extract_features(packed, o_rel, cfg)
    if imu_buf is not None and cfg.deskew:
        feats = imu_mod.deskew_features(feats, imu_buf, t, cfg)
    ostate, opose, rel = odo.odometry_step(ostate, feats, cfg)
    if imu_buf is not None:
        ostate = imu_mod.fold_attitude(ostate, imu_buf, t, cfg)
        opose = ostate.pose
    fused = aft_mapped.compose(bef_mapped.inverse().compose(opose))
    # one packed stats vector: a single host transfer per scan (each
    # separate int() pull costs a full round-trip on a tunneled device)
    stats = jnp.stack([
        jnp.sum(img.valid), jnp.sum(ground), jnp.sum(packed.count),
        jnp.sum(feats.sharp.valid), jnp.sum(feats.flat.valid),
    ]).astype(jnp.int32)
    return ostate, feats, opose, rel, fused, stats


@partial(jax.jit,
         static_argnames=("cfg", "use_ring", "loop_every", "compact_inline"),
         donate_argnames=("ostate", "mstate"))
@f32_matmuls
def chunk_steps(ostate, mstate, xyz, valid, ring, frames, times,
                cfg: PipelineConfig, use_ring: bool, loop_every: int,
                imu_buf=None, compact_inline: bool = True):
    """C scans in ONE device program: `lax.scan` over the per-scan step with
    the mapping / loop-closure cadences expressed as `lax.cond` on the frame
    index.  This is the throughput mode for sequence replay — zero host
    round-trips between scans (per-dispatch tunnel latency is ~20-25 ms, so
    per-scan dispatch caps throughput long before device compute does).

    Semantically identical to C calls of the per-scan path (same math, same
    cadences; the reference's 200 Hz poll + stamp gates + 0.3 s throttle,
    featureAssociation.cpp:1817-1886 / mapOptmization.cpp:1487-1499, made
    deterministic).  imu_buf, when given, must already hold every IMU sample
    for the chunk's time span (offline replay has the whole stream up
    front); each scan then gets the same IMU seeding / attitude blending as
    the per-scan path.
    """
    with_imu = imu_buf is not None

    def step(carry, inp):
        ostate, mstate = carry
        xyz_k, valid_k, ring_k, frame_k, t_k = inp
        ostate, feats, opose, rel, _fused_fe, stats = frontend_step(
            ostate, xyz_k, valid_k, ring_k,
            mstate.bef_mapped, mstate.aft_mapped, t_k, cfg, use_ring,
            imu_buf=imu_buf if with_imu else None)

        do_map = (frame_k % cfg.mapping_process_every) == 0
        mfeats = feats._replace(
            less_sharp=ostate.ref_corner, less_flat=ostate.ref_surf)

        mstate, mpose = jax.lax.cond(
            do_map,
            lambda m: mp.mapping_step(
                m, mfeats, opose, t_k, cfg,
                imu_buf=imu_buf if with_imu else None,
                compact_inline=compact_inline),
            lambda m: (m, m.aft_mapped),
            mstate)

        if cfg.loop_closure_enabled:
            # frame-count-only predicate: frame_k is shared (unbatched) under
            # the fleet vmap (models/batch.py), so the cond stays a true
            # conditional instead of degrading to an execute-both-branches
            # select that would run the pose-graph solve every scan.  The
            # n_kf>2 guard lives inside loop_closure_step as a masked no-op.
            do_loop = (frame_k % loop_every) == 0
            mstate, res = jax.lax.cond(
                do_loop,
                lambda m: lc.loop_closure_step(m, t_k, cfg),
                lambda m: (m, lc.LoopResult.empty()),
                mstate)
            closed = res.closed
        else:
            closed = jnp.bool_(False)

        # identical to the per-scan re-fuse: on non-mapping frames the
        # latches are unchanged, so this equals the front-end fuse
        fused = fuse_pose(mstate, opose)
        return (ostate, mstate), (opose, fused, mpose, do_map, closed, stats)

    (ostate, mstate), outs = jax.lax.scan(
        step, (ostate, mstate), (xyz, valid, ring, frames, times))
    return ostate, mstate, outs


@dataclass
class FrameResult:
    odom_pose: Pose
    fused_pose: Pose
    mapped_pose: Pose | None
    loop_closed: "bool | jnp.ndarray"  # with collect_stats=False this is a
                                       # DEVICE bool (truthiness-testing it
                                       # forces the host sync that mode
                                       # exists to avoid — fetch it lazily)
    stats: dict
    wall_ms: float


@dataclass
class ChunkResult:
    odom_poses: Pose        # stacked (C,·) sweep-end odometry poses
    fused_poses: Pose       # stacked (C,·) map-accurate poses at scan rate
    mapped_poses: Pose      # stacked; rows where did_map is False repeat the latch
    did_map: jnp.ndarray    # (C,) bool
    loop_closed: jnp.ndarray  # (C,) bool
    stats: jnp.ndarray      # (C, 5) int32 packed per-scan stats
    wall_ms: float


@dataclass
class LegoLoamPipeline:
    """Host driver.  Feed scans with process_scan(); poses come back in the
    map frame of the first scan."""

    cfg: PipelineConfig
    loop_check_every: int = 10
    collect_stats: bool = True   # False = skip the per-scan host transfer
                                 # (poses stay on device; JAX async dispatch
                                 # then pipelines scan k+1's front-end with
                                 # scan k's back-end — the reference's P1
                                 # software pipelining, for free)

    def __post_init__(self):
        self.ostate = odo.init_state(self.cfg)
        self.mstate = mp.init_state(self.cfg)
        self.imu_host = imu_mod.HostImuBuffer(self.cfg)
        self.imu_used = False
        self.frame = 0
        self.trajectory: list[np.ndarray] = []
        self.last_mapped = Pose.identity()

    def push_imu(self, t, att_R, acc_body, gyro) -> None:
        """Ingest a 9-DOF IMU sample (attitude matrix, specific force,
        angular rate) — the reference's imuHandler
        (featureAssociation.cpp:431-459).  Host-side; uploaded to the
        device once per scan."""
        self.imu_host.push(t, att_R, acc_body, gyro)
        self.imu_used = True

    def process_scan(self, xyz, valid, ring=None, t: float | None = None
                     ) -> FrameResult:
        cfg = self.cfg
        t = float(t) if t is not None else self.frame * cfg.sensor.scan_period
        t0 = _time.perf_counter()

        use_ring = cfg.sensor.use_ring
        if use_ring and ring is None:
            raise ValueError(
                f"sensor {cfg.sensor.name} expects a ring channel; pass "
                "ring= or use an elevation-math preset (use_ring=False)")
        xyz = jnp.asarray(xyz, jnp.float32)
        valid = jnp.asarray(valid)
        ring_arr = (jnp.asarray(ring, jnp.int32) if ring is not None
                    else jnp.zeros(xyz.shape[0], jnp.int32))

        imu_arg = self.imu_host.to_device() if self.imu_used else None
        self.ostate, feats, opose, rel, fused_fe, stats = frontend_step(
            self.ostate, xyz, valid, ring_arr,
            self.mstate.bef_mapped, self.mstate.aft_mapped, jnp.float32(t),
            cfg, use_ring, imu_buf=imu_arg)

        # NO host syncs in the steady-state loop: the pool-compaction trigger
        # runs device-side inside mapping_step (lax.cond on n_kf) and the
        # loop-closure gate is frame-count-only (n_kf guard inside the jit),
        # so every branch below dispatches without an int() pull — the
        # reference's free-running node loops (featureAssociation.cpp:
        # 1817-1886) with zero per-scan round-trips.
        mapped = None
        loop_closed: bool | jnp.ndarray = False
        if self.frame % cfg.mapping_process_every == 0:
            mfeats = feats._replace(
                less_sharp=self.ostate.ref_corner,
                less_flat=self.ostate.ref_surf)
            self.mstate, mpose = mp.mapping_step(
                self.mstate, mfeats, opose, jnp.float32(t), cfg,
                imu_buf=imu_arg)
            mapped = mpose
            self.last_mapped = mpose

        # loop-closure cadence is independent of the mapping cadence
        # (the reference's 1 Hz thread analog)
        if (cfg.loop_closure_enabled
                and self.frame % self.loop_check_every == 0):
            self.mstate, res = lc.loop_closure_step(
                self.mstate, jnp.float32(t), cfg)
            loop_closed = (bool(res.closed) if self.collect_stats
                           else res.closed)

        # if mapping ran or a loop check may have updated the latch this
        # scan, re-fuse against the fresh state (decided from host frame
        # counters only — testing the device-side `closed` flag would sync)
        loop_ran = (cfg.loop_closure_enabled
                    and self.frame % self.loop_check_every == 0)
        fused = (_fuse_jit(self.mstate, opose)
                 if (mapped is not None or loop_ran) else fused_fe)
        if self.collect_stats:
            fused_t, stats_v = jax.device_get((fused.t, stats))
            self.trajectory.append(np.asarray(fused_t))
            names = ("n_valid_px", "n_ground", "n_segmented", "n_sharp",
                     "n_flat")
            stats_d = dict(zip(names, (int(v) for v in stats_v)))
        else:
            self.trajectory.append(fused.t)  # device array; fetch lazily
            stats_d = {}
        wall_ms = (_time.perf_counter() - t0) * 1e3

        self.frame += 1
        return FrameResult(
            odom_pose=opose, fused_pose=fused, mapped_pose=mapped,
            loop_closed=loop_closed,
            stats=stats_d,
            wall_ms=wall_ms,
        )

    def process_chunk(self, xyz, valid, ring=None, t0: float | None = None
                      ) -> ChunkResult:
        """Process a chunk of C scans in one device program (see chunk_steps).

        xyz: (C, N, 3), valid: (C, N), ring: (C, N) — C is jit-static, so
        feed fixed-size chunks (pad the tail of a sequence by repeating the
        last scan, or process it with process_scan).  Poses come back
        stacked; state advances exactly as C process_scan calls would.  If
        IMU samples were pushed, push ALL samples covering the chunk's time
        span BEFORE the call (offline replay has the stream up front); the
        buffer is uploaded once per chunk."""
        cfg = self.cfg
        t0 = (float(t0) if t0 is not None
              else self.frame * cfg.sensor.scan_period)
        t0w = _time.perf_counter()

        use_ring = cfg.sensor.use_ring
        if use_ring and ring is None:
            raise ValueError(
                f"sensor {cfg.sensor.name} expects a ring channel; pass "
                "ring= or use an elevation-math preset (use_ring=False)")
        xyz = jnp.asarray(xyz, jnp.float32)
        C = xyz.shape[0]
        valid = jnp.asarray(valid)
        ring_arr = (jnp.asarray(ring, jnp.int32) if ring is not None
                    else jnp.zeros(xyz.shape[:2], jnp.int32))
        frames = jnp.arange(self.frame, self.frame + C, dtype=jnp.int32)
        times = jnp.float32(t0) + jnp.arange(C, dtype=jnp.float32) \
            * cfg.sensor.scan_period

        # pool thinning happens device-side inside each mapping_step
        # (compact_inline) — no n_kf host pull per chunk
        self.ostate, self.mstate, outs = chunk_steps(
            self.ostate, self.mstate, xyz, valid, ring_arr, frames, times,
            cfg, use_ring, self.loop_check_every,
            imu_buf=self.imu_host.to_device() if self.imu_used else None)
        opose, fused, mpose, did_map, closed, stats = outs
        self.frame += C
        self.last_mapped = self.mstate.aft_mapped
        if self.collect_stats:
            fused_t = jax.device_get(fused.t)
            self.trajectory.extend(np.asarray(fused_t))
        else:
            self.trajectory.append(fused.t)  # (C, 3) device block, lazy
        wall_ms = (_time.perf_counter() - t0w) * 1e3
        return ChunkResult(
            odom_poses=opose, fused_poses=fused, mapped_poses=mpose,
            did_map=did_map, loop_closed=closed, stats=stats,
            wall_ms=wall_ms)

    # ---- exports (mapOptmization.cpp:724-800 analog) ----

    def keyframe_poses(self) -> np.ndarray:
        n = int(self.mstate.n_kf)
        return np.asarray(self.mstate.kf_t[:n])

    def global_map(self, what: str = "surf",
                   radius: float | None = None,
                   center: np.ndarray | None = None) -> np.ndarray:
        """Keyframe blocks in the map frame (host-side, for export).

        With `radius`, only keyframes within that distance of `center`
        (default: the latest pose) contribute — the reference's global-map
        visualization filter (globalMapVisualizationSearchRadius,
        mapOptmization.cpp:724-800)."""
        n = int(self.mstate.n_kf)
        blocks = {"surf": (self.mstate.kf_surf, self.mstate.kf_surf_valid),
                  "corner": (self.mstate.kf_corner, self.mstate.kf_corner_valid),
                  "outlier": (self.mstate.kf_outlier, self.mstate.kf_outlier_valid),
                  }[what]
        pts, val = np.asarray(blocks[0][:n]), np.asarray(blocks[1][:n])
        R = np.asarray(self.mstate.kf_R[:n])
        t = np.asarray(self.mstate.kf_t[:n])
        if radius is not None and n > 0:
            c = (np.asarray(center) if center is not None
                 else np.asarray(self.mstate.aft_mapped.t))
            sel = np.linalg.norm(t - c, axis=1) <= radius
            pts, val, R, t = pts[sel], val[sel], R[sel], t[sel]
        out = np.einsum("kij,kcj->kci", R, pts) + t[:, None, :]
        return out[val]
