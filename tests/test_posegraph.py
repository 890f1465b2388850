"""Pose graph, ICP, and loop closure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lego_loam_tpu import config_for
from lego_loam_tpu.io import synthetic as syn
from lego_loam_tpu.models import loop as lc
from lego_loam_tpu.models import mapping as mp
from lego_loam_tpu.models import posegraph as pg
from lego_loam_tpu.ops.icp import icp_align
from lego_loam_tpu.ops.voxel import voxel_downsample
from lego_loam_tpu.utils.math3d import Pose, euler_to_mat, so3_exp, so3_log

CFG = config_for(
    "vlp16", deskew=False,
    max_keyframes=64, max_map_corner=2048, max_map_surf=8192,
    kf_corner_cap=256, kf_surf_cap=1024, kf_outlier_cap=256,
    max_scan_corner_ds=256, max_scan_surf_ds=1024, nn_query_tile=256,
    max_loop_edges=8, pg_gn_iters=4,
)


def test_icp_known_transform():
    rng = np.random.default_rng(0)
    dst = rng.uniform(-5, 5, (400, 3)).astype(np.float32)
    R = np.asarray(euler_to_mat(jnp.float32(0.02), jnp.float32(-0.03), jnp.float32(0.1)))
    t = np.array([0.3, -0.2, 0.1], np.float32)
    # src = points expressed in a frame offset by (R, t): dst = R src + t
    src = ((dst - t) @ R).astype(np.float32)
    T, fit = icp_align(
        jnp.asarray(src), jnp.ones(400, bool),
        jnp.asarray(dst), jnp.ones(400, bool),
        Pose.identity(), iters=30, max_corr_dist=5.0)
    np.testing.assert_allclose(np.asarray(T.t), t, atol=0.02)
    w = so3_log(jnp.asarray(R).T @ T.R)
    assert float(jnp.linalg.norm(w)) < 0.01
    assert float(fit) < 1e-3


def _chain_state(n, drift_per_step=np.zeros(3), yaw_step=0.2, step_len=1.0,
                 yaw_drift_per_step=0.0, cfg=None):
    """MappingState with a circular chain of n keyframes: measurements are
    exact, stored poses accumulate `drift_per_step` (translation, world
    frame) and `yaw_drift_per_step` (rotation) each hop."""
    cfg = cfg or CFG
    state = mp.init_state(cfg)
    Rm = np.asarray(euler_to_mat(jnp.float32(0), jnp.float32(0), jnp.float32(yaw_step)))
    Rdrift = np.asarray(euler_to_mat(
        jnp.float32(0), jnp.float32(0), jnp.float32(yaw_drift_per_step)))
    zt = np.array([step_len, 0.0, 0.0], np.float32)

    kf_R = np.asarray(state.kf_R).copy()
    kf_t = np.asarray(state.kf_t).copy()
    meas_R = np.asarray(state.kf_meas_R).copy()
    meas_t = np.asarray(state.kf_meas_t).copy()
    times = np.zeros(cfg.max_keyframes, np.float32)

    R_true, t_true = np.eye(3), np.zeros(3)
    R_est, t_est = np.eye(3), np.zeros(3)
    trues = [(R_true.copy(), t_true.copy())]
    for i in range(1, n):
        t_true = t_true + R_true @ zt
        R_true = R_true @ Rm
        t_est = t_est + R_est @ zt + drift_per_step
        R_est = R_est @ Rm @ Rdrift
        kf_R[i] = R_est
        kf_t[i] = t_est
        meas_R[i] = Rm
        meas_t[i] = zt
        times[i] = i * 1.0
        trues.append((R_true.copy(), t_true.copy()))

    state = state._replace(
        kf_R=jnp.asarray(kf_R), kf_t=jnp.asarray(kf_t),
        kf_meas_R=jnp.asarray(meas_R), kf_meas_t=jnp.asarray(meas_t),
        kf_time=jnp.asarray(times), n_kf=jnp.int32(n),
        aft_mapped=Pose(jnp.asarray(kf_R[n - 1]), jnp.asarray(kf_t[n - 1])))
    return state, trues


def test_posegraph_loop_correction():
    """Drifted circular chain + exact loop edge back to pose 0: the solve
    must pull the loop end near the truth."""
    n = 32
    yaw_step = 2 * np.pi / (n - 1)  # full circle: pose n-1 revisits pose 0
    state, trues = _chain_state(
        n, drift_per_step=np.array([0.03, 0.02, 0.0]), yaw_step=yaw_step)
    drift_end = np.linalg.norm(np.asarray(state.kf_t[n - 1]) - trues[n - 1][1])
    assert drift_end > 0.5  # meaningful drift accumulated

    # loop edge latest -> 0 with the TRUE relative measurement
    Ti = Pose(jnp.asarray(trues[n - 1][0], jnp.float32),
              jnp.asarray(trues[n - 1][1], jnp.float32))
    Tj = Pose(jnp.asarray(trues[0][0], jnp.float32),
              jnp.asarray(trues[0][1], jnp.float32))
    Z = Ti.inverse().compose(Tj)
    state = state._replace(
        loop_i=state.loop_i.at[0].set(n - 1),
        loop_j=state.loop_j.at[0].set(0),
        loop_R=state.loop_R.at[0].set(Z.R),
        loop_t=state.loop_t.at[0].set(Z.t),
        loop_w=state.loop_w.at[0].set(100.0),
        n_loops=jnp.int32(1),
    )
    warm = pg.distribute_loop_error(state, jnp.int32(n - 1), jnp.int32(0), Z, CFG)
    solved = pg.solve_pose_graph(warm, CFG)
    end_err = np.linalg.norm(np.asarray(solved.kf_t[n - 1]) - trues[n - 1][1])
    mean_err = np.mean([
        np.linalg.norm(np.asarray(solved.kf_t[i]) - trues[i][1]) for i in range(n)])
    assert end_err < 0.15 * drift_end, f"end {end_err:.3f} vs drift {drift_end:.3f}"
    assert mean_err < 0.5, f"mean {mean_err:.3f}"


def test_loop_closure_step_end_to_end():
    """Keyframe pool from real raycast scans with injected drift: the loop
    step must find the revisit, ICP-align it, and correct the pose."""
    world = syn.default_world(seed=6)
    n = 12
    # true poses: out and back to the start
    ts = [np.array([0.4 * i, 0.0, 1.6]) for i in range(n // 2)]
    ts += [np.array([0.4 * (n // 2 - 1 - i), 0.05, 1.6]) for i in range(n // 2)]

    state = mp.init_state(CFG)
    kf_R = np.asarray(state.kf_R).copy()
    kf_t = np.asarray(state.kf_t).copy()
    kc = np.asarray(state.kf_corner).copy()
    kcv = np.asarray(state.kf_corner_valid).copy()
    ks = np.asarray(state.kf_surf).copy()
    ksv = np.asarray(state.kf_surf_valid).copy()
    times = np.zeros(CFG.max_keyframes, np.float32)

    drift = np.array([0.02, 0.03, 0.0])
    for i, t in enumerate(ts):
        xyz, valid, ring = syn.raycast(world, np.eye(3), t, CFG.sensor,
                                       noise=0.01, rng=np.random.default_rng(i))
        from lego_loam_tpu.ops.compaction import segment_scan
        from lego_loam_tpu.ops.features import extract_features
        from lego_loam_tpu.ops.projection import project_scan
        img = project_scan(jnp.asarray(xyz), jnp.asarray(valid), CFG, jnp.asarray(ring))
        packed, o_rel, _, _ = segment_scan(img, CFG)
        f = extract_features(packed, o_rel, CFG)
        cp, cok = voxel_downsample(f.less_sharp.xyz, f.less_sharp.valid,
                                   CFG.leaf_scan_corner, CFG.kf_corner_cap)
        sp, sok = voxel_downsample(f.less_flat.xyz, f.less_flat.valid,
                                   CFG.leaf_scan_surf, CFG.kf_surf_cap)
        kf_R[i] = np.eye(3)
        kf_t[i] = (t - np.array([0.0, 0.0, 1.6])) + i * drift
        kc[i], kcv[i] = np.asarray(cp), np.asarray(cok)
        ks[i], ksv[i] = np.asarray(sp), np.asarray(sok)
        times[i] = 40.0 * i / n  # last frames are >30s after the first

    # chain measurements consistent with the stored (drifted) estimates,
    # as mapping_step records them at insertion
    meas_R = np.asarray(state.kf_meas_R).copy()
    meas_t = np.asarray(state.kf_meas_t).copy()
    for i in range(1, n):
        meas_R[i] = kf_R[i - 1].T @ kf_R[i]
        meas_t[i] = kf_R[i - 1].T @ (kf_t[i] - kf_t[i - 1])

    state = state._replace(
        kf_R=jnp.asarray(kf_R), kf_t=jnp.asarray(kf_t),
        kf_meas_R=jnp.asarray(meas_R), kf_meas_t=jnp.asarray(meas_t),
        kf_corner=jnp.asarray(kc), kf_corner_valid=jnp.asarray(kcv),
        kf_surf=jnp.asarray(ks), kf_surf_valid=jnp.asarray(ksv),
        kf_time=jnp.asarray(times), n_kf=jnp.int32(n),
        aft_mapped=Pose(jnp.asarray(kf_R[n - 1]), jnp.asarray(kf_t[n - 1])))

    # loop_closure_step donates the state buffers — snapshot before the call
    true_last = ts[-1] - np.array([0.0, 0.0, 1.6])
    err_before = np.linalg.norm(kf_t[n - 1] - true_last)
    # the injected drift (0.036 m per 0.4 m hop) is far outside the default
    # odometry sigma; declare chain noise consistent with it so the
    # solve's correction fraction is meaningful
    cfg = CFG.replace(pg_trans_sigma=0.05, pg_rot_sigma=0.005)
    state2, res = lc.loop_closure_step(state, jnp.float32(40.0), cfg)
    assert bool(res.closed), f"fitness={float(res.fitness):.3f}"
    assert float(res.fitness) < CFG.history_keyframe_fitness_score
    # latest pose pulled back toward its true position (0, 0.05, 0) wrt kf0
    err_after = np.linalg.norm(np.asarray(state2.kf_t[n - 1]) - true_last)
    assert err_after < 0.5 * err_before, f"{err_after:.3f} vs {err_before:.3f}"


def test_direct_step_matches_dense_normal_equations():
    """The tridiagonal+Woodbury GN step must equal a dense solve of the
    same normal equations (H + damping) x = -J^T r."""
    cfg = CFG.replace(max_keyframes=16, max_loop_edges=4)
    n = 12
    state, trues = _chain_state(
        n, drift_per_step=np.array([0.02, -0.01, 0.005]),
        yaw_step=2 * np.pi / (n - 1), yaw_drift_per_step=0.01, cfg=cfg)
    # two loop edges with exact measurements
    pairs = [(n - 1, 0), (n - 2, 1)]
    li = np.asarray(state.loop_i).copy()
    lj = np.asarray(state.loop_j).copy()
    lR = np.asarray(state.loop_R).copy()
    lt = np.asarray(state.loop_t).copy()
    lw = np.asarray(state.loop_w).copy()
    for s, (i, j) in enumerate(pairs):
        Ti = Pose(jnp.asarray(trues[i][0]), jnp.asarray(trues[i][1], jnp.float32))
        Tj = Pose(jnp.asarray(trues[j][0]), jnp.asarray(trues[j][1], jnp.float32))
        Z = Ti.inverse().compose(Tj)
        li[s], lj[s] = i, j
        lR[s], lt[s], lw[s] = np.asarray(Z.R), np.asarray(Z.t), 50.0
    state = state._replace(
        loop_i=jnp.asarray(li), loop_j=jnp.asarray(lj),
        loop_R=jnp.asarray(lR), loop_t=jnp.asarray(lt),
        loop_w=jnp.asarray(lw), n_loops=jnp.int32(2))

    K = cfg.max_keyframes
    R, t = state.kf_R, state.kf_t

    # direct step
    D, U, b, A, B, r_l, lii, ljj = pg._assemble_blocks(R, t, state, cfg)
    x_direct = pg.direct_gn_delta(D, U, A, B, lii, ljj, r_l, b,
                                  cfg.pg_damping)

    # dense reference
    def r_of(x):
        R2, t2 = pg._apply_delta(R, t, x.reshape(K, 6))
        return pg.graph_residuals(R2, t2, state, cfg).reshape(-1)

    x0 = jnp.zeros((K * 6,), jnp.float32)
    J = jax.jacfwd(r_of)(x0)
    r0 = r_of(x0)
    H = np.asarray(J.T @ J, np.float64)
    g = -np.asarray(J.T @ r0, np.float64)
    inactive = np.repeat(np.arange(K) >= n, 6)
    H += np.diag(np.where(inactive, 1.0, 0.0)) + cfg.pg_damping * np.eye(K * 6)
    x_dense = np.linalg.solve(H, g).reshape(K, 6)

    scale = np.abs(x_dense).max()
    np.testing.assert_allclose(np.asarray(x_direct), x_dense,
                               atol=2e-3 * scale)


def test_posegraph_converges_at_scale_without_warm_start():
    """VERDICT r3 item 1: K=1024 drifted chain + one exact loop edge, NO
    distribute_loop_error warm start — the converged optimum must correct
    >=90% of the accumulated drift (the round-3 CG solver corrected ~1%)."""
    cfg = config_for(
        "vlp16", deskew=False,
        max_keyframes=1024, max_loop_edges=8, pg_gn_iters=6,
        kf_corner_cap=8, kf_surf_cap=8, kf_outlier_cap=8,
        max_map_corner=64, max_map_surf=64,
        max_scan_corner_ds=64, max_scan_surf_ds=64)
    n = 1024
    yaw_step = 2 * np.pi / (n - 1)
    state, trues = _chain_state(
        n, drift_per_step=np.array([0.004, 0.003, 0.001]),
        yaw_step=yaw_step, yaw_drift_per_step=5e-4, step_len=0.3, cfg=cfg)
    errs_before = np.array([
        np.linalg.norm(np.asarray(state.kf_t[i]) - trues[i][1])
        for i in range(n)])
    assert errs_before[-1] > 3.0  # meaningful drift at the loop end

    Ti = Pose(jnp.asarray(trues[n - 1][0], jnp.float32),
              jnp.asarray(trues[n - 1][1], jnp.float32))
    Tj = Pose(jnp.asarray(trues[0][0], jnp.float32),
              jnp.asarray(trues[0][1], jnp.float32))
    Z = Ti.inverse().compose(Tj)
    state = state._replace(
        loop_i=state.loop_i.at[0].set(n - 1),
        loop_j=state.loop_j.at[0].set(0),
        loop_R=state.loop_R.at[0].set(Z.R),
        loop_t=state.loop_t.at[0].set(Z.t),
        loop_w=state.loop_w.at[0].set(100.0),
        n_loops=jnp.int32(1),
    )
    # no warm start: the solver alone must close the loop
    solved = pg.solve_pose_graph(state, cfg)
    errs_after = np.array([
        np.linalg.norm(np.asarray(solved.kf_t[i]) - trues[i][1])
        for i in range(n)])
    end_corr = 1.0 - errs_after[-1] / errs_before[-1]
    mean_corr = 1.0 - errs_after.mean() / errs_before.mean()
    assert end_corr >= 0.90, f"end corrected {end_corr:.1%}"
    assert mean_corr >= 0.90, f"mean corrected {mean_corr:.1%}"
