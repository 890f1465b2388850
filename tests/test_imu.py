"""IMU buffer, interpolation, seeding, and pipeline integration."""

import jax.numpy as jnp
import numpy as np

from lego_loam_tpu import config_for
from lego_loam_tpu.models import imu as im
from lego_loam_tpu.utils.math3d import Pose, euler_to_mat, so3_log

CFG = config_for("vlp16", deskew=False)


def _fill_buffer(accel_w=np.zeros(3), yaw_rate=0.0, n=50, dt=0.01):
    """Stream samples of a body under constant world acceleration and
    constant yaw rate, starting at rest."""
    buf = im.init_buffer()
    g = np.array([0.0, 0.0, im.GRAVITY])
    for k in range(n):
        t = k * dt
        yaw = yaw_rate * t
        R = np.asarray(euler_to_mat(jnp.float32(0), jnp.float32(0), jnp.float32(yaw)))
        acc_body = R.T @ (accel_w + g)  # specific force measured by the IMU
        gyro = np.array([0.0, 0.0, yaw_rate])
        buf = im.imu_push(buf, jnp.float32(t), jnp.asarray(R, jnp.float32),
                          jnp.asarray(acc_body, jnp.float32),
                          jnp.asarray(gyro, jnp.float32), CFG)
    return buf, dt * (n - 1)


def test_dead_reckoning_constant_accel():
    a = np.array([0.5, -0.2, 0.1])
    buf, T = _fill_buffer(accel_w=a, n=50)
    R, v, s, ang = im.imu_sample(buf, jnp.float32(T))
    np.testing.assert_allclose(np.asarray(v), a * T, atol=0.02)
    np.testing.assert_allclose(np.asarray(s), 0.5 * a * T * T, atol=0.01)


def test_attitude_interp_and_gyro_integral():
    buf, T = _fill_buffer(yaw_rate=0.5, n=50)
    t_mid = 0.5 * T
    R, v, s, ang = im.imu_sample(buf, jnp.float32(t_mid))
    _, _, yaw = [float(x) for x in
                 __import__("lego_loam_tpu.utils.math3d", fromlist=["mat_to_euler"]).mat_to_euler(R)]
    assert abs(yaw - 0.5 * t_mid) < 1e-3
    np.testing.assert_allclose(float(ang[2]), 0.5 * t_mid, atol=1e-3)


def test_scan_imu_and_seed():
    buf, T = _fill_buffer(yaw_rate=0.4, accel_w=np.array([0.3, 0.0, 0.0]), n=60)
    t_scan = T - CFG.sensor.scan_period - 0.05
    si = im.scan_imu(buf, jnp.float32(t_scan), CFG)
    assert bool(si.valid)
    # sweep rotation = yaw_rate * scan_period about z
    w = np.asarray(so3_log(si.rel_R))
    np.testing.assert_allclose(w[2], 0.4 * CFG.sensor.scan_period, atol=2e-3)

    seed = im.odometry_seed(Pose.identity(), si, CFG.sensor.scan_period)
    np.testing.assert_allclose(np.asarray(so3_log(seed.R))[2],
                               0.4 * CFG.sensor.scan_period, atol=2e-3)
    # translation seed = prev (0) + velocity-delta correction
    # dv over the sweep = accel * scan_period = 0.03 m/s -> 3 mm correction
    assert abs(float(jnp.linalg.norm(seed.t)) - 0.3 * CFG.sensor.scan_period ** 2) < 0.02


def test_empty_buffer_fallback():
    buf = im.init_buffer()
    si = im.scan_imu(buf, jnp.float32(1.0), CFG)
    assert not bool(si.valid)
    prev = Pose(jnp.eye(3), jnp.array([0.1, 0.0, 0.0]))
    seed = im.odometry_seed(prev, si)
    np.testing.assert_allclose(np.asarray(seed.t), [0.1, 0.0, 0.0], atol=1e-7)


def test_blend_attitude():
    buf, T = _fill_buffer(n=30)  # level attitude
    tilted = Pose(euler_to_mat(jnp.float32(0.1), jnp.float32(-0.05), jnp.float32(0.7)),
                  jnp.array([1.0, 2.0, 3.0]))
    out = im.blend_attitude(tilted, buf, jnp.float32(T / 2), CFG)
    from lego_loam_tpu.utils.math3d import mat_to_euler
    r, p, y = [float(x) for x in mat_to_euler(out.R)]
    assert abs(r - 0.1 * (1 - CFG.imu_attitude_blend)) < 1e-4
    assert abs(p + 0.05 * (1 - CFG.imu_attitude_blend)) < 1e-4
    assert abs(y - 0.7) < 1e-5  # yaw untouched
    np.testing.assert_allclose(np.asarray(out.t), [1.0, 2.0, 3.0])


def test_pipeline_with_imu():
    from lego_loam_tpu.io import synthetic as syn
    from lego_loam_tpu.models.pipeline import LegoLoamPipeline

    cfg = config_for(
        "vlp16", deskew=False,
        max_keyframes=64, max_map_corner=2048, max_map_surf=8192,
        kf_corner_cap=256, kf_surf_cap=1024, kf_outlier_cap=256,
        max_scan_corner_ds=256, max_scan_surf_ds=1024, nn_query_tile=256)
    world = syn.default_world(seed=4)
    poses = syn.circle_trajectory(8, radius=8.0, arc=0.25 * np.pi)
    pipe = LegoLoamPipeline(cfg)

    # IMU stream consistent with the trajectory's yaw rate (0.1 s per scan)
    scan_dt = cfg.sensor.scan_period
    arc, radius = 0.25 * np.pi, 8.0
    yaw_rate = arc / ((len(poses) - 1) * scan_dt)
    R0, t0 = poses[0]
    errs = []
    for k, (R, t) in enumerate(poses):
        # samples cover the whole sweep [t_k, t_k + scan_dt]: a scan is
        # processed at its end, when the sweep's IMU has already arrived
        for j in range(6):
            ti = k * scan_dt + j * scan_dt / 5
            yaw = yaw_rate * ti
            Ri = np.asarray(euler_to_mat(jnp.float32(0), jnp.float32(0), jnp.float32(yaw)))
            speed = yaw_rate * radius
            acc_w = np.array([-speed * yaw_rate * np.sin(yaw),
                              speed * yaw_rate * np.cos(yaw), 0.0])
            acc_body = Ri.T @ (acc_w + np.array([0.0, 0.0, im.GRAVITY]))
            pipe.push_imu(ti, Ri, acc_body, np.array([0.0, 0.0, yaw_rate]))
        xyz, valid, ring = syn.raycast(world, R, t, cfg.sensor, noise=0.01,
                                       rng=np.random.default_rng(k))
        res = pipe.process_scan(xyz, valid, ring, t=k * scan_dt)
        tw = R0 @ np.asarray(res.fused_pose.t) + t0
        errs.append(np.linalg.norm(tw - t))
    assert np.sqrt(np.mean(np.square(errs))) < 0.2, f"{errs}"
