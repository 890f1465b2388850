"""Back-end scan-to-map: fits, registration, keyframe pool, full loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lego_loam_tpu import config_for
from lego_loam_tpu.io import synthetic as syn
from lego_loam_tpu.models import mapping as mp
from lego_loam_tpu.models import odometry as odo
from lego_loam_tpu.ops.compaction import segment_scan
from lego_loam_tpu.ops.features import extract_features
from lego_loam_tpu.ops.projection import project_scan
from lego_loam_tpu.utils.math3d import Pose, so3_exp, so3_log

# small capacities to keep CPU tests fast
CFG = config_for(
    "vlp16", deskew=False,
    max_keyframes=64, max_map_corner=2048, max_map_surf=8192,
    kf_corner_cap=512, kf_surf_cap=2048, kf_outlier_cap=512,
    max_scan_corner_ds=512, max_scan_surf_ds=2048, nn_query_tile=256,
    nn_exact=True,   # deterministic 5-NN for reproducible fixtures
    map_degen_eig_thresh=30.0,  # the reference's 100 is calibrated against
                                # full-scale local maps (hundreds of corner
                                # constraints); this miniature fixture yields
                                # ~70 and would freeze xy by design
)


def make_features(world, R, t, noise=0.0, seed=0):
    xyz, valid, ring = syn.raycast(
        world, R, t, CFG.sensor, noise=noise, rng=np.random.default_rng(seed))
    img = project_scan(jnp.asarray(xyz), jnp.asarray(valid), CFG, jnp.asarray(ring))
    packed, o_rel, _, _ = segment_scan(img, CFG)
    return extract_features(packed, o_rel, CFG)


def test_fit_planes():
    rng = np.random.default_rng(0)
    # 4 plane sets with normals known + 1 garbage set
    normals = np.array([[0, 0, 1.0], [1.0, 0, 0], [0.6, 0.8, 0], [0, 1.0, 0]])
    pts = []
    for n in normals:
        # plane n.x = 2 => points = 2n + tangent noise
        t1 = np.cross(n, [0.3, 0.7, 0.2]); t1 /= np.linalg.norm(t1)
        t2 = np.cross(n, t1)
        p = 2 * n + rng.uniform(-1, 1, (5, 1)) * t1 + rng.uniform(-1, 1, (5, 1)) * t2
        pts.append(p)
    pts.append(rng.uniform(-3, 3, (5, 3)))  # not a plane
    pts = jnp.asarray(np.stack(pts), jnp.float32)
    ok_in = jnp.ones((5,), bool)
    n_unit, d, ok = mp._fit_planes(pts, ok_in, CFG)
    for i, n in enumerate(normals):
        assert bool(ok[i])
        got = np.asarray(n_unit[i])
        sign = np.sign(got @ n)
        np.testing.assert_allclose(sign * got, n, atol=1e-3)
        np.testing.assert_allclose(sign * np.asarray(d)[i], -2.0, atol=5e-3)
    assert not bool(ok[4])


def test_fit_lines():
    rng = np.random.default_rng(1)
    v = np.array([0.0, 0.0, 1.0])
    p0 = np.array([1.0, 2.0, 0.0])
    line_pts = p0 + rng.uniform(-1, 1, (5, 1)) * v + rng.normal(0, 0.01, (5, 3))
    # isotropic set (tetrahedron + centroid): eigenvalue ratio ~1, not a line
    blob = 0.5 * np.array([
        [1.0, 1.0, 1.0], [1.0, -1.0, -1.0], [-1.0, 1.0, -1.0],
        [-1.0, -1.0, 1.0], [0.0, 0.0, 0.0]])
    pts = jnp.asarray(np.stack([line_pts, blob]), jnp.float32)
    a, b, ok = mp._fit_lines(pts, jnp.ones((2,), bool), CFG)
    assert bool(ok[0]) and not bool(ok[1])
    dirv = np.array(a[0] - b[0]); dirv = dirv / np.linalg.norm(dirv)
    assert abs(dirv @ v) > 0.999


def test_scan_to_map_registration():
    """Register a perturbed scan against a map built from two nearby scans."""
    world = syn.default_world(seed=8)
    state = mp.init_state(CFG)
    # several keyframes into the pool (a 2-keyframe map leaves the corner
    # Hessian's xy eigenvalues under the reference's degeneracy threshold of
    # 100, correctly freezing xy — the solve needs a real local map)
    kf_ts = [np.array([x, y, 1.6]) for x, y in
             [(0.0, 0.0), (0.5, 0.2), (1.0, 0.1), (-0.4, 0.4), (0.3, -0.5)]]
    for k, t in enumerate(kf_ts):
        f = make_features(world, np.eye(3), t, seed=k)
        T = Pose(jnp.eye(3), jnp.asarray(t - np.array([0.0, 0.0, 1.6]), jnp.float32))
        state, _ = mp.mapping_step(state, f, T, jnp.float32(k * 0.3), CFG)
    assert int(state.n_kf) == len(kf_ts)

    # new scan at a known pose, seeded with a perturbed prediction
    t_true = np.array([1.0, 0.4, 1.6])
    f = make_features(world, np.eye(3), t_true, seed=5)
    corner_pts, corner_ok = state.kf_corner[0], state.kf_corner_valid[0]
    T_true = Pose(jnp.eye(3), jnp.asarray(t_true - np.array([0.0, 0.0, 1.6]), jnp.float32))

    from lego_loam_tpu.ops.voxel import voxel_downsample
    cp, cok = voxel_downsample(f.less_sharp.xyz, f.less_sharp.valid,
                               CFG.leaf_scan_corner, CFG.max_scan_corner_ds)
    sp, sok = voxel_downsample(f.less_flat.xyz, f.less_flat.valid,
                               CFG.leaf_scan_surf, CFG.max_scan_surf_ds)
    cm, cmv, sm, smv = mp._gather_local_map(state, T_true.t, CFG)
    assert int(cmv.sum()) > 50 and int(smv.sum()) > 500

    T_seed = Pose(so3_exp(jnp.array([0.0, 0.0, 0.02])),
                  T_true.t + jnp.array([0.15, -0.1, 0.05]))
    T, n = mp.scan_to_map(T_seed, cp, cok, sp, sok, cm, cmv, sm, smv, CFG)
    assert int(n) >= CFG.map_min_constraints
    np.testing.assert_allclose(np.asarray(T.t), np.asarray(T_true.t), atol=0.03)
    w = so3_log(T.R)
    assert float(jnp.linalg.norm(w)) < 0.01


def test_full_pipeline_odometry_plus_mapping():
    """Front-end + odometry + mapping over an arc: mapped poses beat raw
    odometry or at least stay within tight bounds."""
    world = syn.default_world(seed=4)
    poses = syn.circle_trajectory(20, radius=10.0, arc=0.4 * np.pi)
    ostate = odo.init_state(CFG)
    mstate = mp.init_state(CFG)

    R0, t0 = poses[0]
    errs = []
    for k, (R, t) in enumerate(poses):
        f = make_features(world, R, t, noise=0.01, seed=k)
        ostate, opose, rel = odo.odometry_step(ostate, f, CFG)
        # mapping consumes the odometry's reference clouds (sweep end)
        mfeats = f._replace(less_sharp=ostate.ref_corner, less_flat=ostate.ref_surf)
        mstate, mpose = mp.mapping_step(mstate, mfeats, opose, jnp.float32(0.1 * k), CFG)
        tw = R0 @ np.asarray(mpose.t) + t0
        errs.append(np.linalg.norm(tw - t))
    ate = np.sqrt(np.mean(np.square(errs)))
    assert int(mstate.n_kf) >= 10
    assert ate < 0.15, f"mapped ATE {ate:.3f}"
    assert errs[-1] < 0.2, f"final {errs[-1]:.3f}"


def test_compact_keyframes():
    """Pool thinning keeps the newer half + every 2nd older keyframe,
    rebuilds chain measurements, and remaps/drops loop edges."""
    import jax.numpy as jnp

    from tests.test_posegraph import CFG as PG_CFG, _chain_state

    n = 40
    state, trues = _chain_state(n, yaw_step=0.1)
    # add two loop edges: one surviving (both endpoints kept), one whose
    # history endpoint (odd index in the older half) gets thinned
    state = state._replace(
        loop_i=state.loop_i.at[0].set(n - 1).at[1].set(n - 2),
        loop_j=state.loop_j.at[0].set(0).at[1].set(7),
        loop_w=state.loop_w.at[0].set(5.0).at[1].set(5.0),
        n_loops=jnp.int32(2),
    )
    # compact_keyframes donates the state buffers — snapshot before the call
    kf_t_before = np.asarray(state.kf_t)
    out = mp.compact_keyframes(state, PG_CFG)
    half = n // 2
    expect_kept = [i for i in range(half) if i % 2 == 0] + list(range(half, n))
    assert int(out.n_kf) == len(expect_kept)
    # retained poses unchanged, in order
    for new_i, old_i in enumerate(expect_kept):
        np.testing.assert_allclose(np.asarray(out.kf_t[new_i]),
                                   kf_t_before[old_i], atol=1e-6)
    # chain measurements consistent: composing them reproduces the poses
    R = np.asarray(out.kf_R[0])
    tt = np.asarray(out.kf_t[0])
    for i in range(1, len(expect_kept)):
        zR = np.asarray(out.kf_meas_R[i])
        zt = np.asarray(out.kf_meas_t[i])
        tt = tt + R @ zt
        R = R @ zR
        np.testing.assert_allclose(tt, np.asarray(out.kf_t[i]), atol=1e-3)
    # loop edge 0 survived and was remapped; edge 1 (endpoint 7 thinned) dropped
    assert int(out.n_loops) == 1
    assert int(out.loop_i[0]) == expect_kept.index(n - 1)
    assert int(out.loop_j[0]) == 0
