"""Scan-to-scan odometry: two-step Gauss-Newton on feature correspondences.

TPU-native equivalent of the reference FeatureAssociation solver
(reference: featureAssociation.cpp:1044-1725).  Same algorithm, rebuilt:

  * correspondences via dense masked distance matrices (ops/knn.py) instead
    of KD-trees + index walks: the ring-window constraints (same ring /
    adjacent rings within +-2) become explicit masks on the distance matrix;
  * the two-step split solves (pitch, roll, tz) on planar constraints then
    (yaw, tx, ty) on edge constraints — the same 3+3 decomposition the
    reference does in its camera frame (featureAssociation.cpp:1270-1478),
    expressed in the lidar frame;
  * Jacobians by forward-mode autodiff of the residual through the motion
    chart (no hand-derived trig blocks);
  * the reference's iteration schedule is kept: 5 association rounds x 5 GN
    steps, robust weights from iteration 5, degeneracy projection from the
    iteration-0 eigendecomposition, convergence at 0.1 deg / 0.1 cm
    (featureAssociation.cpp:1666-1695).  Step damping is configurable; the
    default takes full GN steps where the reference damps by 0.05;
  * motion de-skew by geodesic pose interpolation (exp/log) instead of
    per-point scaled Euler angles.

The whole step is one jitted fixed-shape program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lego_loam_tpu.config import PipelineConfig
from lego_loam_tpu.ops.knn import masked_argmin, sq_dist_matrix
from lego_loam_tpu.ops.lin3 import solve3
from lego_loam_tpu.types import FeatureCloud, ScanFeatures, empty_feature_cloud
from lego_loam_tpu.utils.math3d import Pose, project_so3, so3_exp, so3_log
from lego_loam_tpu.utils.precision import f32_matmuls

_EPS = 1e-12


class OdometryState(NamedTuple):
    pose: Pose               # world pose of the current sweep end
    rel: Pose                # last relative motion (constant-velocity seed)
    ref_corner: FeatureCloud  # previous less-sharp corners, at sweep end
    ref_surf: FeatureCloud    # previous less-flat surfs, at sweep end
    # AHRS-world -> odometry-world rotation latched at the first IMU-valid
    # sweep (pose.R @ R_end^T at that scan): maps later AHRS attitudes into
    # the odometry frame for the attitude fold (imu.fold_attitude, the
    # PluginIMURotation analog)
    att_anchor: jnp.ndarray      # (3, 3)
    att_anchor_valid: jnp.ndarray  # bool


def init_state(cfg: PipelineConfig) -> OdometryState:
    return OdometryState(
        pose=Pose.identity(),
        rel=Pose.identity(),
        ref_corner=empty_feature_cloud(cfg.max_less_sharp),
        ref_surf=empty_feature_cloud(cfg.max_less_flat),
        att_anchor=jnp.eye(3, dtype=jnp.float32),
        att_anchor_valid=jnp.bool_(False),
    )


# ---------------------------------------------------------------- warps

def warp_to_start(rel: Pose, pts: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """De-skew: point captured at sweep fraction s -> sweep-start frame.

    rel is the motion over the whole sweep (start frame of the end pose);
    the sensor pose at fraction s is the geodesic interp identity->rel.
    """
    w = so3_log(rel.R)
    Rs = so3_exp(s[:, None] * w)
    return jnp.einsum("nij,nj->ni", Rs, pts) + s[:, None] * rel.t


def warp_to_end(rel: Pose, pts: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Project points to the sweep-end frame (featureAssociation.cpp:885-953
    sans IMU terms, which are handled by the IMU module)."""
    p_start = warp_to_start(rel, pts, s)
    inv = rel.inverse()
    return p_start @ inv.R.T + inv.t


# ---------------------------------------------------------- associations

def _assoc_corner(rel: Pose, sharp: FeatureCloud, ref: FeatureCloud, cfg):
    """j1 = nearest ref corner; j2 = nearest in a different ring within +-2
    (featureAssociation.cpp:1052-1104)."""
    q = warp_to_start(rel, sharp.xyz, sharp.s)
    d2 = sq_dist_matrix(q, ref.xyz, ref.valid)
    i1, v1 = masked_argmin(d2)
    r1 = ref.ring[i1]
    dr = ref.ring[None, :] - r1[:, None]
    i2, v2 = masked_argmin(d2, (dr != 0) & (jnp.abs(dr) <= 2))
    thr = cfg.nearest_feature_search_sq_dist
    ok = sharp.valid & (v1 < thr) & (v2 < thr)
    return i1, i2, ok


def _assoc_surf(rel: Pose, flat: FeatureCloud, ref: FeatureCloud, cfg):
    """j1 = nearest; j2 = nearest in the same ring (j1 excluded); j3 =
    nearest in an adjacent ring within +-2 (featureAssociation.cpp:1163-1226).

    With cfg.odom_class_gate (default), candidates must share the query's
    ground label.  The reference drops the segmentation's ground label
    before association, so for a ground query near a wall the adjacent-ring
    j3 lands on the WALL BASE (the next ground ring is metres further out)
    and the 3-point "plane" tilts up off the ground — a systematic +z bias
    of ~2% of forward motion in corridor geometry (measured on exact
    synthetic data, examples/diag_corridor2.py).  Ground-to-ground /
    structure-to-structure association removes the mixed planes; set
    odom_class_gate=False for the reference-faithful behaviour the NumPy
    oracles expect."""
    q = warp_to_start(rel, flat.xyz, flat.s)
    d2 = sq_dist_matrix(q, ref.xyz, ref.valid)
    same: jnp.ndarray | bool = True
    if cfg.odom_class_gate and flat.ground is not None \
            and ref.ground is not None:
        same = ref.ground[None, :] == flat.ground[:, None]
    i1, v1 = masked_argmin(d2, None if same is True else same)
    r1 = ref.ring[i1]
    dr = ref.ring[None, :] - r1[:, None]
    cols = jnp.arange(d2.shape[1])
    i2, v2 = masked_argmin(
        d2, (dr == 0) & (cols[None, :] != i1[:, None]) & same)
    i3, v3 = masked_argmin(d2, (dr != 0) & (jnp.abs(dr) <= 2) & same)
    thr = cfg.nearest_feature_search_sq_dist
    ok = flat.valid & (v1 < thr) & (v2 < thr) & (v3 < thr)
    return i1, i2, i3, ok


def _assoc_surf_knn(rel: Pose, flat: FeatureCloud, ref: FeatureCloud, cfg):
    """5-NN least-squares plane association for the odometry surf phase
    (cfg.odom_surf_fit == "knn", the default).

    The reference's 3-point plane (same-ring pair + adjacent-ring third,
    featureAssociation.cpp:1163-1226) has a ~0.2 m baseline between its two
    closest points, so centimetre-level label noise at structure bases
    (pole/wall feet the ground filter marks as ground — the reference's
    imageProjection.cpp:316-345 has the same ambiguity) tilts the plane by
    DEGREES: measured on exact corridor data this injects a constant
    -0.07 deg/scan pitch bias whose integral sends z off quadratically
    (examples/diag_corridor2.py).  Fitting the plane to the 5 nearest
    reference points with the scan-to-map quality gates (least-squares fit +
    residual + spread rejection, models/mapping._fit_planes ==
    mapOptmization.cpp:1183-1207) averages the label noise out and REJECTS
    unfittable neighborhoods instead of feeding them to the solver.

    The 5 points keep the reference's RING STRUCTURE (nearest + two
    same-ring + two adjacent-ring): a plain 5-NN would draw all five from
    one ring arc — nearly collinear, so the spread gate rejects it and the
    (pitch, roll, tz) block starves."""
    from lego_loam_tpu.models.mapping import _fit_planes

    q = warp_to_start(rel, flat.xyz, flat.s)
    d2 = sq_dist_matrix(q, ref.xyz, ref.valid)
    if cfg.odom_class_gate and flat.ground is not None \
            and ref.ground is not None:
        same = ref.ground[None, :] == flat.ground[:, None]
        d2 = jnp.where(same, d2, jnp.float32(1e30))
    cols = jnp.arange(d2.shape[1])
    i1, v1 = masked_argmin(d2)
    r1 = ref.ring[i1]
    dr = ref.ring[None, :] - r1[:, None]
    same_ring = dr == 0
    adj_ring = (dr != 0) & (jnp.abs(dr) <= 2)
    not1 = cols[None, :] != i1[:, None]
    i2, v2 = masked_argmin(d2, same_ring & not1)
    i5, v5 = masked_argmin(d2, same_ring & not1
                           & (cols[None, :] != i2[:, None]))
    i3, v3 = masked_argmin(d2, adj_ring)
    i4, v4 = masked_argmin(d2, adj_ring & (cols[None, :] != i3[:, None]))
    thr = cfg.nearest_feature_search_sq_dist
    # the reference's core triple must exist; the two extras fall back to
    # duplicating their category's first pick (double-weighting it) so the
    # fit always sees 5 finite rows
    ok = flat.valid & (v1 < thr) & (v2 < thr) & (v3 < thr)
    i4 = jnp.where(v4 < thr, i4, i3)
    i5 = jnp.where(v5 < thr, i5, i2)
    nn = ref.xyz[jnp.stack([i1, i2, i3, i4, i5], axis=1)]    # (Q, 5, 3)
    pn, pd, ok = _fit_planes(nn, ok, cfg)
    return pn, pd, ok


# ------------------------------------------------------------- residuals

def _safe_norm(v, axis=-1, keepdims=False):
    """Norm with a smooth, finite gradient at 0 (autodiff-safe)."""
    return jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=keepdims) + _EPS)


def _corner_distance(q, a, b):
    """Point-to-line residual (featureAssociation.cpp:1121-1135).

    The geometric distance |(q-a)x(q-b)|/|a-b| is unsigned; Gauss-Newton with
    full steps oscillates on it (the reference only survives because of its
    0.05 damping).  Standard ICP linearization instead: the perpendicular
    direction is frozen (stop_gradient) so the residual is signed and smooth,
    with value |perp| and gradient along it — exactly the reference's
    (la, lb, lc) coefficient rows."""
    u = (a - b) / _safe_norm(a - b, keepdims=True)
    e = q - a
    perp = e - jnp.sum(e * u, -1, keepdims=True) * u
    n = jax.lax.stop_gradient(perp / _safe_norm(perp, keepdims=True))
    return jnp.sum(n * perp, -1)


def _surf_distance(q, a, b, c):
    """Signed point-to-plane distance (featureAssociation.cpp:1234-1249)."""
    n = jnp.cross(b - a, c - a)
    n = n / _safe_norm(n, keepdims=True)
    return jnp.sum(n * (q - a), axis=-1)


# ----------------------------------------------------------------- solver

def _apply_chart(rel: Pose, chart: jnp.ndarray, x: jnp.ndarray) -> Pose:
    """rel' = (exp(w) R, t + v) with (w, v) = chart @ x; chart is (6, dof)."""
    xi = chart @ x
    return Pose(so3_exp(xi[:3]) @ rel.R, rel.t + xi[3:])


# charts: columns are se(3)-basis directions for each solved parameter.
# surf step solves (pitch, roll, tz); corner step solves (yaw, tx, ty).
def _chart(cols):
    m = jnp.zeros((6, len(cols)), jnp.float32)
    for k, c in enumerate(cols):
        m = m.at[c, k].set(1.0)
    return m


_SURF_CHART = _chart([1, 0, 5])    # wy (pitch), wx (roll), vz
_CORNER_CHART = _chart([2, 3, 4])  # wz (yaw), vx, vy


def _residual_scale(absd, ok, cfg):
    """Robust scale of the active residuals, used to widen the Huber delta.

    "median": masked median (a full sort — tens of sequential bitonic stages
    on TPU).  "mean": masked mean x 0.845 (the median/mean ratio of a
    half-normal) — one reduction, no sort; heavy-tailed early rounds inflate
    it slightly, which only keeps a few more constraints active."""
    if cfg.odom_scale_est == "mean":
        n_ok = jnp.maximum(jnp.sum(ok), 1)
        return 0.845 * jnp.sum(jnp.where(ok, absd, 0.0)) / n_ok
    n_ok = jnp.sum(ok)
    sorted_d = jnp.sort(jnp.where(ok, absd, jnp.inf))
    med = sorted_d[jnp.maximum(n_ok - 1, 0) // 2]
    return jnp.where(jnp.isfinite(med), med, 0.0)


def _gn_iteration(rel, chart, pts, s, resid_at, cfg, med,
                  compute_scale: bool, jac_mask=None):
    """One GN step.

    Residuals are evaluated at the true de-skewed points q0 = interp(rel,s)p;
    the Jacobian is taken through the first-order motion chart
    q(x) = q0 + w x q0 + v, (w, v) = chart @ x.  Like the reference's
    hand-derived rows (featureAssociation.cpp:1301-1322), the chart treats the
    update as applying fully to every point (the per-point sweep-time scaling
    stays inside the warp); this also keeps the degeneracy eigen-thresholds
    on the same scale as the reference's.  resid_at(q) -> (d, qn, ok).

    `med` is the robust residual scale; recomputed when compute_scale is
    True (once per association round by default — the scale only moves when
    the correspondences do), otherwise carried from the round start.
    """
    dof = chart.shape[1]
    q0 = warp_to_start(rel, pts, s)

    def f(x):
        xi = chart @ x
        w, v = xi[:3], xi[3:]
        q = q0 + jnp.cross(jnp.broadcast_to(w, q0.shape), q0) + v
        d, qn, ok = resid_at(q)
        return d, (qn, ok)

    x0 = jnp.zeros((dof,), jnp.float32)
    d0, (qn, ok) = f(x0)
    J = jax.jacfwd(f, has_aux=True)(x0)[0]
    if jac_mask is not None:
        # block mode: zero the cross-block gradient entries so the normal
        # equations decouple into the two-step's (pitch, roll, tz) /
        # (yaw, tx, ty) blocks while both constraint sets still update every
        # iteration (same conditioning as the sequential two-step phases at
        # half the sequential GN depth)
        J = J * jac_mask
    solve = solve3 if dof == 3 else (
        lambda A, y: jnp.linalg.solve(A, y))

    # Huber weights with a scale-adaptive width: at large seed error every
    # residual exceeds a fixed delta and a hard cutoff would empty the
    # constraint set (no step, permanent stall).  Widening with the robust
    # residual scale keeps the bulk of constraints active and tightens back
    # to odom_robust_delta as the solve converges.
    absd = jnp.abs(d0)
    if compute_scale:
        med = _residual_scale(absd, ok, cfg)
    delta = jnp.maximum(cfg.odom_robust_delta * qn, 0.7 * med)
    w = jnp.minimum(1.0, delta / jnp.maximum(absd, 1e-9))
    keep = ok & (w > 0.1) & jnp.isfinite(d0)
    wk = jnp.where(keep, w, 0.0)

    A = J * wk[:, None]
    b = -cfg.odom_step_scale * wk * d0
    H = A.T @ A
    g = A.T @ b
    # Degeneracy analysis uses the UNWEIGHTED system: the reference's eigen
    # thresholds (10 / 100) are calibrated against unit-weight rows at
    # iteration 0 (its robust weights only start at iteration 5).
    Au = J * keep[:, None].astype(J.dtype)
    H_unw = Au.T @ Au
    # closed-form 3x3 solve (ops/lin3): jnp.linalg.solve lowers to an LU
    # routine whose control flow dominates at this size
    x = solve(H + 1e-6 * jnp.eye(dof), g)
    x = jnp.where(jnp.isfinite(x), x, 0.0)

    # trust region: scale the step down if it exceeds the per-iteration caps
    xi = chart @ x
    rot_n = _safe_norm(xi[:3])
    trans_n = _safe_norm(xi[3:])
    scale = jnp.minimum(
        1.0,
        jnp.minimum(
            jnp.radians(cfg.odom_max_step_rot_deg) / rot_n,
            cfg.odom_max_step_trans / trans_n,
        ),
    )
    x = x * scale

    n_keep = jnp.sum(keep)
    return x, H_unw, n_keep, med


def _degeneracy_projection(H, thresh):
    """P = V diag(keep) V^T zeroing eigen-directions with eigenvalue below
    thresh (featureAssociation.cpp:1329-1356)."""
    lam, V = jnp.linalg.eigh(H)
    keepv = (lam >= thresh).astype(H.dtype)
    return (V * keepv[None, :]) @ V.T


def _phase(rel0, chart, pts, s, make_assoc, make_resid, cfg, jac_mask=None):
    """One odometry phase: association rounds x GN steps with convergence
    freezing, matching featureAssociation.cpp:1666-1695 scheduling."""
    rot_thr = cfg.odom_delta_rot_deg
    trans_thr = cfg.odom_delta_trans_cm
    dof = chart.shape[1]

    refresh_each_iter = cfg.odom_scale_refresh == "iter"

    def outer(o, carry):
        rel, P, med, done_prev = carry
        assoc = make_assoc(rel)
        resid_at = make_resid(assoc)

        def gn_apply(rel, P, med, done, round_start: bool):
            x, H, n_keep, med = _gn_iteration(
                rel, chart, pts, s, resid_at, cfg, med,
                compute_scale=round_start or refresh_each_iter,
                jac_mask=jac_mask)
            if round_start:
                # refresh the projection at the start of every association
                # round: a projection latched against the seed's (possibly
                # bad) correspondences must not freeze directions for good
                # ones.  Computed once per round — the 3x3 eigh is the most
                # expensive single op in the loop on TPU
                P = _degeneracy_projection(H, cfg.odom_degen_eig_thresh)
            x = P @ x
            apply = (~done) & (n_keep >= cfg.odom_min_constraints)
            rel = jax.tree_util.tree_map(
                lambda a, b: jnp.where(apply, a, b),
                _apply_chart(rel, chart, x), rel)
            d_rot = jnp.degrees(jnp.linalg.norm((chart @ x)[:3]))
            d_trans = 100.0 * jnp.linalg.norm((chart @ x)[3:])
            done = done | (apply & (d_rot < rot_thr) & (d_trans < trans_thr))
            return rel, P, med, done

        # a fresh association restarts convergence: a tiny step against bad
        # correspondences must not freeze later, better-associated rounds
        rel, P, med, done = gn_apply(rel, P, med, jnp.bool_(False), True)

        def inner(i, carry):
            rel, P, med, done = carry
            return gn_apply(rel, P, med, done, False)

        rel, P, med, done = jax.lax.fori_loop(
            0, cfg.odom_inner_iters - 1, inner, (rel, P, med, done))
        return rel, P, med, done

    P0 = jnp.eye(dof, dtype=jnp.float32)
    rel, _, _, _ = jax.lax.fori_loop(
        0, cfg.odom_outer_iters, outer,
        (rel0, P0, jnp.float32(0.0), jnp.bool_(False))
    )
    return rel


@partial(jax.jit, static_argnames=("cfg",))
@f32_matmuls
def odometry_step(
    state: OdometryState, feats: ScanFeatures, cfg: PipelineConfig
):
    """Process one scan's features; returns (new_state, world_pose, rel).

    world_pose is the odometry pose of this sweep's end (the reference's
    /laser_odom_to_init).  On the first scan (empty references) the solver
    is a no-op and the pose stays at the seed, mirroring
    checkSystemInitialization (featureAssociation.cpp:1605-1637).
    """
    sharp, flat = feats.sharp, feats.flat
    if not cfg.deskew:
        # Motion-compensated input: every point sits at the sweep's single
        # pose.  s = 1 matches the current scan directly against the
        # *unwarped* previous scan (warp_to_end at s = 1 is the identity),
        # i.e. rel becomes the plain frame-to-frame transform.
        sharp = sharp._replace(s=jnp.ones_like(sharp.s))
        flat = flat._replace(s=jnp.ones_like(flat.s))
        feats = feats._replace(
            less_sharp=feats.less_sharp._replace(
                s=jnp.ones_like(feats.less_sharp.s)),
            less_flat=feats.less_flat._replace(
                s=jnp.ones_like(feats.less_flat.s)))
    ref_c, ref_s = state.ref_corner, state.ref_surf

    n_ref_c = jnp.sum(ref_c.valid)
    n_ref_s = jnp.sum(ref_s.valid)
    gate = (n_ref_c >= cfg.odom_min_last_corner) & (n_ref_s >= cfg.odom_min_last_surf)

    if cfg.odom_mode in ("joint", "block"):
        # ---- joint 6-DoF phase: both constraint sets in every iteration.
        # Half the sequential GN depth of the two-step schedule (25 fused
        # iterations instead of 25 + 25); the reference carries the same
        # combined solver unused (calculateTransformation,
        # featureAssociation.cpp:1480-1603).  Degenerate directions (e.g.
        # yaw with no corners) are handled by the eigen projection instead
        # of the two-step chart split.
        F = flat.xyz.shape[0]
        pts = jnp.concatenate([flat.xyz, sharp.xyz], axis=0)
        ss = jnp.concatenate([flat.s, sharp.s], axis=0)

        knn_surf = cfg.odom_surf_fit == "knn"

        def joint_assoc(rel):
            sa = (_assoc_surf_knn(rel, flat, ref_s, cfg) if knn_surf
                  else _assoc_surf(rel, flat, ref_s, cfg))
            return (sa, _assoc_corner(rel, sharp, ref_c, cfg))

        def joint_resid(assoc):
            sa, (j1, j2, okc) = assoc

            def resid_at(q):
                qs, qc = q[:F], q[F:]
                if knn_surf:
                    pn, pd, oks = sa
                    ds = jnp.sum(pn * qs, axis=-1) + pd
                else:
                    i1, i2, i3, oks = sa
                    ds = _surf_distance(
                        qs, ref_s.xyz[i1], ref_s.xyz[i2], ref_s.xyz[i3])
                dc = _corner_distance(qc, ref_c.xyz[j1], ref_c.xyz[j2])
                qn = jnp.concatenate(
                    [jnp.sqrt(jnp.sqrt(_safe_norm(qs))), jnp.ones_like(dc)])
                return (jnp.concatenate([ds, dc]), qn,
                        jnp.concatenate([oks, okc]))
            return resid_at

        jac_mask = None
        if cfg.odom_mode == "block":
            # decouple the normal equations into the two-step's charts:
            # surf rows drive (pitch wy, roll wx, vz); corner rows drive
            # (yaw wz, vx, vy) — parallel coordinate descent on the same
            # blocks the reference iterates sequentially
            surf_cols = jnp.array([1.0, 1.0, 0.0, 0.0, 0.0, 1.0], jnp.float32)
            row_is_surf = (jnp.arange(pts.shape[0]) < F).astype(jnp.float32)
            jac_mask = (row_is_surf[:, None] * surf_cols[None, :]
                        + (1.0 - row_is_surf)[:, None]
                        * (1.0 - surf_cols)[None, :])
        rel = _phase(state.rel, jnp.eye(6, dtype=jnp.float32), pts, ss,
                     joint_assoc, joint_resid, cfg, jac_mask=jac_mask)
    else:
        # ---- surf phase: (pitch, roll, tz)
        knn_surf = cfg.odom_surf_fit == "knn"

        def surf_assoc(rel):
            return (_assoc_surf_knn(rel, flat, ref_s, cfg) if knn_surf
                    else _assoc_surf(rel, flat, ref_s, cfg))

        def surf_resid(assoc):
            def resid_at(q):
                if knn_surf:
                    pn, pd, ok = assoc
                    d = jnp.sum(pn * q, axis=-1) + pd
                else:
                    i1, i2, i3, ok = assoc
                    d = _surf_distance(
                        q, ref_s.xyz[i1], ref_s.xyz[i2], ref_s.xyz[i3])
                qn = jnp.sqrt(jnp.sqrt(_safe_norm(q)))
                return d, qn, ok
            return resid_at

        rel = _phase(state.rel, _SURF_CHART, flat.xyz, flat.s,
                     surf_assoc, surf_resid, cfg)

        # ---- corner phase: (yaw, tx, ty)
        def corner_assoc(rel):
            return _assoc_corner(rel, sharp, ref_c, cfg)

        def corner_resid(assoc):
            i1, i2, ok = assoc

            def resid_at(q):
                d = _corner_distance(q, ref_c.xyz[i1], ref_c.xyz[i2])
                qn = jnp.ones_like(d)  # corner weights not range-normalized
                return d, qn, ok
            return resid_at

        rel = _phase(rel, _CORNER_CHART, sharp.xyz, sharp.s,
                     corner_assoc, corner_resid, cfg)

    rel = jax.tree_util.tree_map(
        lambda a, b: jnp.where(gate, a, b), rel, state.rel)

    # First scan (no references yet): the map frame IS this scan's frame —
    # do not fold the seed into the pose (checkSystemInitialization analog,
    # featureAssociation.cpp:1605-1637).
    initialized = (n_ref_c + n_ref_s) > 0
    acc = state.pose.compose(rel)
    # one compose per scan accumulates here for the whole run: project the
    # rotation back onto SO(3) so float32 error cannot build up
    acc = Pose(project_so3(acc.R), acc.t)
    pose = jax.tree_util.tree_map(
        lambda a, b: jnp.where(initialized, a, b), acc, state.pose)

    # Build next references at this sweep's end frame
    # (featureAssociation.cpp:1759-1788).
    new_ref_c = feats.less_sharp._replace(
        xyz=warp_to_end(rel, feats.less_sharp.xyz, feats.less_sharp.s))
    new_ref_s = feats.less_flat._replace(
        xyz=warp_to_end(rel, feats.less_flat.xyz, feats.less_flat.s))

    new_state = state._replace(
        pose=pose, rel=rel, ref_corner=new_ref_c, ref_surf=new_ref_s)
    return new_state, pose, rel
