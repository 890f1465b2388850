"""IMU-assisted per-point de-skew + AHRS attitude fold.

Covers the reference's ShiftToStartIMU / TransformToStartIMU per-point warp
(featureAssociation.cpp:317-390, 560-607) and the PluginIMURotation attitude
fold (featureAssociation.cpp:955-1042, 1697-1725) in their TPU-native forms
(models/imu.py: deskew_features / fold_attitude).

The key scenario is NON-CONSTANT in-sweep motion (acceleration + angular
acceleration): there the constant-velocity geodesic warp is biased by
construction, and the IMU profile supplies exactly the missing nonlinearity.
"""

import jax.numpy as jnp
import numpy as np

from lego_loam_tpu import config_for
from lego_loam_tpu.io import synthetic as syn
from lego_loam_tpu.models import imu as imu_mod
from lego_loam_tpu.models import odometry as odo
from lego_loam_tpu.ops.compaction import segment_scan
from lego_loam_tpu.ops.features import extract_features
from lego_loam_tpu.ops.projection import pixel_rel_time, project_scan
from lego_loam_tpu.types import FeatureCloud
from lego_loam_tpu.utils.math3d import Pose, so3_log

CFG = config_for("vlp16", deskew=True)
DT = CFG.sensor.scan_period


def _yaw_R(a):
    return np.array([[np.cos(a), -np.sin(a), 0.0],
                     [np.sin(a), np.cos(a), 0.0],
                     [0.0, 0.0, 1.0]])


def _accel_profile(t0_pos, v0, acc, w0, alpha, R_base=None):
    """World pose / velocity at sweep fraction u for a quadratic profile:
    position t0 + v0*tau + acc*tau^2/2, yaw w0*tau + alpha*tau^2/2."""
    R_base = np.eye(3) if R_base is None else R_base

    def pose(u):
        tau = u * DT
        yaw = w0 * tau + 0.5 * alpha * tau * tau
        t = t0_pos + v0 * tau + 0.5 * acc * tau * tau
        return R_base @ _yaw_R(yaw), t

    def velo(u):
        return v0 + acc * (u * DT)

    def gyro_int(u):
        tau = u * DT
        return np.array([0.0, 0.0, w0 * tau + 0.5 * alpha * tau * tau])

    return pose, velo, gyro_int


def _truth_buffer(t_start, pose, velo, gyro_int, n=40, pad=0.02):
    """ImuBuffer filled with ground-truth samples over the sweep (an ideal
    AHRS + dead-reckoner): att/velo/shift/ang exact at each sample time."""
    ts = np.linspace(t_start - pad, t_start + DT + pad, n)
    Q = imu_mod.QUE_LEN
    time = np.full((Q,), -np.inf, np.float32)
    att = np.tile(np.eye(3, dtype=np.float32), (Q, 1, 1))
    vel = np.zeros((Q, 3), np.float32)
    shf = np.zeros((Q, 3), np.float32)
    ang = np.zeros((Q, 3), np.float32)
    for i, t in enumerate(ts):
        u = (t - t_start) / DT
        R, p = pose(u)
        time[i] = t
        att[i] = R
        vel[i] = velo(u)
        shf[i] = p
        ang[i] = gyro_int(u)
    return imu_mod.ImuBuffer(
        time=jnp.asarray(time), att=jnp.asarray(att), velo=jnp.asarray(vel),
        shift=jnp.asarray(shf), ang=jnp.asarray(ang),
        ptr=jnp.int32(len(ts) - 1), count=jnp.int32(len(ts)))


def _sweep(world, pose_fn, seed=0, noise=0.0):
    xyz, valid, ring = syn.raycast_swept_profile(
        world, pose_fn, CFG.sensor, noise=noise,
        rng=np.random.default_rng(seed))
    img = project_scan(jnp.asarray(xyz), jnp.asarray(valid), CFG,
                       jnp.asarray(ring))
    return img


def test_imu_deskew_beats_constant_velocity_warp():
    """Hard acceleration + angular acceleration inside one sweep: warping
    with the TRUE endpoint motion, the constant-velocity path carries the
    profile-curvature bias while the IMU-corrected points rectify to ~cm."""
    world = syn.default_world(seed=7)
    t0p = np.array([0.0, 0.0, 1.6])
    v0 = np.array([8.0, 0.0, 0.0])      # 8 m/s forward
    acc = np.array([0.0, 8.0, 0.0])     # hard lateral acceleration
    w0, alpha = 0.6, 24.0               # yaw rate + angular acceleration
    pose, velo, gyro_int = _accel_profile(t0p, v0, acc, w0, alpha)

    img = _sweep(world, pose)
    buf = _truth_buffer(0.0, pose, velo, gyro_int)

    R0, p0 = pose(0.0)
    R1, p1 = pose(1.0)
    rel_true = Pose(jnp.asarray(R0.T @ R1, jnp.float32),
                    jnp.asarray(R0.T @ (p1 - p0), jnp.float32))

    s_pix = np.asarray(pixel_rel_time(img))
    v = np.asarray(img.valid)
    pts = jnp.asarray(np.asarray(img.xyz)[v])
    s = jnp.asarray(s_pix[v])
    fc = FeatureCloud(xyz=pts, ring=jnp.zeros(pts.shape[0], jnp.int32),
                      s=s, valid=jnp.ones(pts.shape[0], bool))

    # ground-truth de-skew of every pixel
    q_true = np.stack([
        np.asarray(R0).T @ ((pose(si)[0] @ np.asarray(pi)
                             + pose(si)[1]) - p0)
        for pi, si in zip(np.asarray(pts), np.asarray(s))])

    q_cv = np.asarray(odo.warp_to_start(rel_true, fc.xyz, fc.s))
    fc_imu = imu_mod._deskew_cloud(fc, buf, jnp.float32(0.0), CFG)
    q_imu = np.asarray(odo.warp_to_start(rel_true, fc_imu.xyz, fc_imu.s))

    err_cv = np.linalg.norm(q_cv - q_true, axis=1)
    err_imu = np.linalg.norm(q_imu - q_true, axis=1)
    # the constant-velocity warp must actually be biased on this profile,
    # and the IMU correction must remove (nearly) all of it
    assert err_cv.mean() > 0.05, f"profile too tame: cv {err_cv.mean():.4f}"
    assert err_imu.mean() < 0.25 * err_cv.mean(), (
        f"imu {err_imu.mean():.4f} vs cv {err_cv.mean():.4f}")
    assert err_imu.mean() < 0.02, f"imu abs err {err_imu.mean():.4f}"


def test_imu_deskew_noop_on_constant_motion():
    """Under exactly constant velocity/rotation-rate the correction is
    identity — parity with the plain constant-velocity path."""
    world = syn.default_world(seed=3)
    t0p = np.array([0.0, 0.0, 1.6])
    pose, velo, gyro_int = _accel_profile(
        t0p, np.array([5.0, 0.5, 0.0]), np.zeros(3), 0.8, 0.0)
    img = _sweep(world, pose)
    buf = _truth_buffer(0.0, pose, velo, gyro_int)

    v = np.asarray(img.valid)
    pts = jnp.asarray(np.asarray(img.xyz)[v])
    s = jnp.asarray(np.asarray(pixel_rel_time(img))[v])
    fc = FeatureCloud(xyz=pts, ring=jnp.zeros(pts.shape[0], jnp.int32),
                      s=s, valid=jnp.ones(pts.shape[0], bool))
    fc2 = imu_mod._deskew_cloud(fc, buf, jnp.float32(0.0), CFG)
    dev = np.linalg.norm(np.asarray(fc2.xyz) - np.asarray(fc.xyz), axis=1)
    assert dev.max() < 5e-3, f"correction should vanish, max {dev.max():.4f}"


def test_imu_deskew_improves_odometry_on_accelerated_sweeps():
    """End-to-end: two consecutive hard-acceleration sweeps, references
    anchored at the true motion; the solve from IMU-corrected features lands
    closer to the true endpoint motion than from raw features."""
    world = syn.default_world(seed=7)

    profiles = []
    t_pos = np.array([0.0, 0.0, 1.6])
    v = np.array([6.0, 0.0, 0.0])
    yaw0 = 0.0
    w = 0.3
    for k in range(2):
        acc = np.array([0.0, 7.0, 0.0]) if k == 0 else np.array([0.0, -7.0, 0.0])
        alpha = 20.0 if k == 0 else -20.0
        base = _yaw_R(yaw0)
        pose, velo, gyro_int = _accel_profile(
            t_pos, v, acc, w, alpha, R_base=base)
        profiles.append((pose, velo, gyro_int))
        # advance to the sweep end state
        _, t_pos = pose(1.0)
        v = velo(1.0)
        yaw0 = yaw0 + w * DT + 0.5 * alpha * DT * DT
        w = w + alpha * DT

    feats = []
    rels = []
    bufs = []
    for k, (pose, velo, gyro_int) in enumerate(profiles):
        img = _sweep(world, pose, seed=k, noise=0.005)
        packed, o_rel, _, _ = segment_scan(img, CFG)
        feats.append(extract_features(packed, o_rel, CFG))
        bufs.append(_truth_buffer(k * DT, pose, velo, gyro_int))
        Ra, ta = pose(0.0)
        Rb, tb = pose(1.0)
        rels.append(Pose(jnp.asarray(Ra.T @ Rb, jnp.float32),
                         jnp.asarray(Ra.T @ (tb - ta), jnp.float32)))

    def solve(correct: bool):
        f0, f1 = feats
        if correct:
            f0 = imu_mod.deskew_features(f0, bufs[0], jnp.float32(0.0), CFG)
            f1 = imu_mod.deskew_features(f1, bufs[1], jnp.float32(DT), CFG)
        state = odo.init_state(CFG)
        state = state._replace(
            ref_corner=f0.less_sharp._replace(
                xyz=odo.warp_to_end(rels[0], f0.less_sharp.xyz,
                                    f0.less_sharp.s)),
            ref_surf=f0.less_flat._replace(
                xyz=odo.warp_to_end(rels[0], f0.less_flat.xyz,
                                    f0.less_flat.s)),
            rel=rels[1])
        _, _, rel = odo.odometry_step(state, f1, CFG)
        te = float(np.linalg.norm(np.asarray(rel.t) - np.asarray(rels[1].t)))
        re = float(np.linalg.norm(np.asarray(
            so3_log(rels[1].R.T @ rel.R))))
        return te, re

    te_raw, re_raw = solve(False)
    te_imu, re_imu = solve(True)
    # the corrected solve must not be worse, and the raw solve must show the
    # distortion penalty this path exists to remove
    assert te_imu <= te_raw + 0.01, (te_imu, te_raw)
    assert re_imu <= re_raw + 1e-3, (re_imu, re_raw)
    assert te_imu < 0.10, f"imu-assisted trans err {te_imu:.3f}"


def test_fold_attitude_bounds_heading_drift():
    """Inject per-scan yaw drift into the accumulated pose; without the fold
    the heading error grows linearly, with it the error stays bounded near
    drift/weight (the PluginIMURotation analog's purpose)."""
    cfg = CFG.replace(imu_odom_attitude_blend=0.2)
    # stationary platform, ideal AHRS: attitude identity at all times
    pose, velo, gyro_int = _accel_profile(
        np.zeros(3), np.zeros(3), np.zeros(3), 0.0, 0.0)
    drift = 0.01  # rad of spurious yaw per scan

    def run(fold: bool, n=60):
        state = odo.init_state(cfg)
        errs = []
        for k in range(n):
            buf = _truth_buffer(k * DT, pose, velo, gyro_int)
            R_drift = jnp.asarray(_yaw_R(drift), jnp.float32)
            state = state._replace(
                pose=Pose(state.pose.R @ R_drift, state.pose.t))
            if fold:
                state = imu_mod.fold_attitude(
                    state, buf, jnp.float32(k * DT), cfg)
            errs.append(float(np.linalg.norm(
                np.asarray(so3_log(state.pose.R)))))
        return np.array(errs)

    e_no = run(False)
    e_yes = run(True)
    assert e_no[-1] > 0.5, "drift injection broken"
    bound = 3.0 * drift / 0.2
    assert e_yes.max() < bound, f"folded error {e_yes.max():.3f} > {bound}"
    # anchor scan: no blend on the first call, then convergence
    assert e_yes[-1] < 2.0 * drift / 0.2


def test_fold_attitude_anchor_respects_initial_attitude():
    """A platform whose AHRS says it starts rotated must not get yanked: the
    anchor maps AHRS attitudes into the odometry frame, so with zero drift
    the fold is a no-op regardless of the initial attitude."""
    cfg = CFG.replace(imu_odom_attitude_blend=0.5)
    R_init = _yaw_R(1.1) @ np.array(
        [[1, 0, 0], [0, np.cos(0.2), -np.sin(0.2)],
         [0, np.sin(0.2), np.cos(0.2)]])
    pose, velo, gyro_int = _accel_profile(
        np.zeros(3), np.zeros(3), np.zeros(3), 0.0, 0.0, R_base=R_init)
    state = odo.init_state(cfg)
    for k in range(5):
        buf = _truth_buffer(k * DT, pose, velo, gyro_int)
        state = imu_mod.fold_attitude(state, buf, jnp.float32(k * DT), cfg)
    dev = float(np.linalg.norm(np.asarray(so3_log(state.pose.R))))
    assert dev < 1e-4, f"identity pose drifted {dev:.5f} under zero motion"


def test_fold_attitude_anchor_after_prior_rotation():
    """ADVICE r3: the IMU becoming valid AFTER the vehicle has rotated must
    not bias the fold — the anchor folds in the odometry pose at the
    anchor-setting scan, so with a static AHRS and a rotated pose the blend
    target IS the current pose (no pull toward identity)."""
    cfg = CFG.replace(imu_odom_attitude_blend=0.5)
    pose, velo, gyro_int = _accel_profile(
        np.zeros(3), np.zeros(3), np.zeros(3), 0.0, 0.0)
    Rp = jnp.asarray(_yaw_R(0.9), jnp.float32)  # pose rotated before IMU-on
    state = odo.init_state(cfg)._replace(pose=Pose(Rp, jnp.zeros(3)))
    for k in range(5):
        buf = _truth_buffer(k * DT, pose, velo, gyro_int)
        state = imu_mod.fold_attitude(state, buf, jnp.float32(k * DT), cfg)
    dev = float(np.linalg.norm(np.asarray(so3_log(Rp.T @ state.pose.R))))
    assert dev < 1e-4, f"rotated pose pulled {dev:.5f} by late-IMU anchor"
