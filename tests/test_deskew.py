"""Motion de-skew on genuinely distorted sweeps.

The sweep generator (io/synthetic.raycast_swept) casts each azimuth column
from the interpolated sensor pose in real firing order, producing the
rolling-shutter distortion the de-skew path exists for.

What is guaranteed and tested:
  * the per-pixel sweep-time recovery and the geodesic warp rectify a
    distorted sweep to millimetres given the true motion;
  * the odometry solver's fixed point on distorted data sits at the true
    motion (given consistently-warped references), independent of the seed.

What is deliberately NOT asserted: that de-skew beats rigid matching on
constant-velocity synthetic sweeps — there, both scans carry identical
distortion and rigid matching cancels it exactly, an artifact this data
shares with nothing real.  Cold-start closed-loop de-skew inherits the
first sweep's uncompensatable references (the reference system seeds from
IMU for exactly this reason).
"""

import jax.numpy as jnp
import numpy as np

from lego_loam_tpu import config_for
from lego_loam_tpu.io import synthetic as syn
from lego_loam_tpu.io.synthetic import _slerp
from lego_loam_tpu.models import odometry as odo
from lego_loam_tpu.ops.compaction import segment_scan
from lego_loam_tpu.ops.features import extract_features
from lego_loam_tpu.ops.projection import pixel_rel_time, project_scan
from lego_loam_tpu.utils.math3d import Pose, so3_log

CFG = config_for("vlp16", deskew=True)


def _yaw_R(a):
    return np.array([[np.cos(a), -np.sin(a), 0.0],
                     [np.sin(a), np.cos(a), 0.0],
                     [0.0, 0.0, 1.0]])


def _sweep_features(world, R0, t0, R1, t1, seed):
    xyz, valid, ring = syn.raycast_swept(
        world, R0, t0, R1, t1, CFG.sensor, noise=0.005,
        rng=np.random.default_rng(seed))
    img = project_scan(jnp.asarray(xyz), jnp.asarray(valid), CFG,
                       jnp.asarray(ring))
    packed, o_rel, _, _ = segment_scan(img, CFG)
    return extract_features(packed, o_rel, CFG)


def test_warp_matches_generator_ground_truth():
    world = syn.default_world(seed=7)
    R0, t0 = np.eye(3), np.array([0.0, 0.0, 1.6])
    R1, t1 = _yaw_R(0.12), t0 + np.array([1.5, 0.15, 0.0])
    xyz, valid, ring = syn.raycast_swept(world, R0, t0, R1, t1, CFG.sensor)
    img = project_scan(jnp.asarray(xyz), jnp.asarray(valid), CFG,
                       jnp.asarray(ring))
    s_pix = np.asarray(pixel_rel_time(img))

    H = CFG.sensor.horizon_scan
    c = np.arange(H)
    s_gen = ((H - c) % H) / H
    rel_true = Pose(jnp.asarray(R0.T @ R1, jnp.float32),
                    jnp.asarray(R0.T @ (t1 - t0), jnp.float32))

    errs = []
    for ring_i in (2, 8, 13):
        v = np.asarray(img.valid)[ring_i]
        pix = np.asarray(img.xyz)[ring_i][v]
        s_v = s_pix[ring_i][v]
        q = np.asarray(odo.warp_to_start(
            rel_true, jnp.asarray(pix), jnp.asarray(s_v)))
        for cc, p, qq in zip(np.where(v)[0], pix, q):
            s = s_gen[cc]
            Rs = _slerp(R0, R1, s)
            ts = t0 + s * (t1 - t0)
            q_true = R0.T @ ((Rs @ p + ts) - t0)
            errs.append(np.linalg.norm(qq - q_true))
    errs = np.array(errs)
    assert errs.mean() < 0.01, f"mean warp error {errs.mean():.4f} m"
    assert np.quantile(errs, 0.99) < 0.05


def test_solver_fixed_point_on_distorted_sweeps():
    world = syn.default_world(seed=7)
    R0, t0 = np.eye(3), np.array([0.0, 0.0, 1.6])
    step, yaw = np.array([1.5, 0.15, 0.0]), 0.12
    R1, t1 = R0 @ _yaw_R(yaw), t0 + R0 @ step
    R2, t2 = R1 @ _yaw_R(yaw), t1 + R1 @ step
    f0 = _sweep_features(world, R0, t0, R1, t1, 0)
    f1 = _sweep_features(world, R1, t1, R2, t2, 1)

    rel0 = Pose(jnp.asarray(R0.T @ R1, jnp.float32),
                jnp.asarray(R0.T @ (t1 - t0), jnp.float32))
    rel1 = Pose(jnp.asarray(R1.T @ R2, jnp.float32),
                jnp.asarray(R1.T @ (t2 - t1), jnp.float32))

    state = odo.init_state(CFG)
    state = state._replace(
        ref_corner=f0.less_sharp._replace(
            xyz=odo.warp_to_end(rel0, f0.less_sharp.xyz, f0.less_sharp.s)),
        ref_surf=f0.less_flat._replace(
            xyz=odo.warp_to_end(rel0, f0.less_flat.xyz, f0.less_flat.s)))

    for seed_off in (jnp.zeros(3), jnp.array([0.2, -0.1, 0.0])):
        st = state._replace(rel=Pose(rel1.R, rel1.t + seed_off))
        _, _, rel = odo.odometry_step(st, f1, CFG)
        te = float(np.linalg.norm(np.asarray(rel.t) - np.asarray(rel1.t)))
        re = float(np.linalg.norm(np.asarray(so3_log(rel1.R.T @ rel.R))))
        assert te < 0.08, f"trans err {te:.3f} from seed offset {seed_off}"
        assert re < 0.006, f"rot err {re:.4f}"


def test_closed_loop_bounded():
    """Cold-start closed loop on accelerating distorted sweeps stays
    bounded (no divergence)."""
    world = syn.default_world(seed=7)
    Ts = []
    R, t = np.eye(3), np.array([0.0, 0.0, 1.6])
    for step_len, step_yaw in [(0.3, 0.02), (0.6, 0.045), (0.9, 0.07),
                               (1.2, 0.095), (1.5, 0.12)]:
        Ts.append((R.copy(), t.copy()))
        t = t + R @ np.array([step_len, 0.1 * step_len, 0.0])
        R = R @ _yaw_R(step_yaw)
    Ts.append((R.copy(), t.copy()))

    state = odo.init_state(CFG)
    errs = []
    for k in range(len(Ts) - 1):
        (Ra, ta), (Rb, tb) = Ts[k], Ts[k + 1]
        f = _sweep_features(world, Ra, ta, Rb, tb, seed=k)
        state, pose, rel = odo.odometry_step(state, f, CFG)
        true_t = Ra.T @ (tb - ta)
        errs.append(float(np.linalg.norm(np.asarray(rel.t) - true_t)))
    assert max(errs[1:]) < 0.6, errs
    assert errs[-1] < 0.5, errs
