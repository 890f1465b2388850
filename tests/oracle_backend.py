"""NumPy oracle of the reference back-end semantics: sequential scan-to-scan
LM odometry, scan-to-map registration, keyframes and pose-graph correction.

Together with oracle_frontend/oracle_features this forms a complete
sequential, reference-faithful pipeline (projection -> segmentation ->
features -> two-step LM -> scan-to-map -> keyframes/loop), implemented
independently of the JAX engine: plain Python loops, brute-force NN instead
of KD-trees, finite-difference Jacobians instead of autodiff, dense
least-squares instead of CG.  Reference call stack: featureAssociation.cpp:
1666-1725, mapOptmization.cpp:1093-1350, 1353-1454.

It exists to catch INTEGRATION bugs in the device pipeline: per-kernel
oracles verify each stage, this verifies the composition at the trajectory
level (test_oracle_pipeline.py asserts ATE between the two stays small).
Intentional, documented deviations of the engine (Huber weights vs the
reference's linear reject, full GN steps vs 0.05 damping) shift individual
solves slightly; both implementations converge to the same geometric optima
on well-constrained scenes, which is what the ATE bound checks.
"""

from __future__ import annotations

import numpy as np

FD_EPS = 1e-4


# ---------------------------------------------------------------- SO(3)


def _exp(w):
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3) + _hat(w)
    K = _hat(w / th)
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _hat(w):
    return np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0.0]])


def _log(R):
    cos_t = np.clip((np.trace(R) - 1) / 2, -1, 1)
    th = np.arccos(cos_t)
    if th < 1e-8:
        return np.zeros(3)
    v = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return th / (2 * np.sin(th)) * v


# ---------------------------------------------------------- associations


def _nn(q, ref):
    d2 = np.sum((ref[None, :, :] - q[:, None, :]) ** 2, axis=2)
    return d2


def _nn1(q, ref, chunk=512):
    """Chunked nearest neighbor: returns (index, squared distance)."""
    idx = np.zeros(len(q), np.int64)
    dmin = np.zeros(len(q))
    for a in range(0, len(q), chunk):
        b = min(a + chunk, len(q))
        d2 = np.sum((ref[None, :, :].astype(np.float32)
                     - q[a:b, None, :].astype(np.float32)) ** 2, axis=2)
        j = np.argmin(d2, axis=1)
        idx[a:b] = j
        dmin[a:b] = d2[np.arange(b - a), j]
    return idx, dmin


def _knn5(q, ref, chunk=256):
    """5-NN indices + 5th distance, chunked so the (Q, N) matrix stays small."""
    idx = np.zeros((len(q), 5), np.int64)
    d5 = np.zeros(len(q))
    for a in range(0, len(q), chunk):
        b = min(a + chunk, len(q))
        d2 = np.sum((ref[None, :, :].astype(np.float32)
                     - q[a:b, None, :].astype(np.float32)) ** 2, axis=2)
        part = np.argpartition(d2, 4, axis=1)[:, :5]
        rows = np.arange(b - a)[:, None]
        order = np.argsort(d2[rows, part], axis=1)
        sel = part[rows, order]
        idx[a:b] = sel
        d5[a:b] = d2[rows[:, 0], sel[:, 4]]
    return idx, d5


def oracle_assoc_corner(q, ref_xyz, ref_ring, thr):
    """Nearest corner + nearest in a different ring within +-2
    (featureAssociation.cpp:1052-1104).  Returns (i1, i2, ok)."""
    d2 = _nn(q, ref_xyz)
    i1 = np.argmin(d2, axis=1)
    r1 = ref_ring[i1]
    dr = ref_ring[None, :] - r1[:, None]
    m2 = (dr != 0) & (np.abs(dr) <= 2)
    d2b = np.where(m2, d2, np.inf)
    i2 = np.argmin(d2b, axis=1)
    ok = (d2[np.arange(len(q)), i1] < thr) & \
        (d2b[np.arange(len(q)), i2] < thr)
    return i1, i2, ok


def oracle_assoc_surf(q, ref_xyz, ref_ring, thr):
    """Nearest + same-ring 2nd + adjacent-ring 3rd
    (featureAssociation.cpp:1163-1226)."""
    d2 = _nn(q, ref_xyz)
    n = len(q)
    i1 = np.argmin(d2, axis=1)
    r1 = ref_ring[i1]
    dr = ref_ring[None, :] - r1[:, None]
    cols = np.arange(ref_xyz.shape[0])
    m2 = (dr == 0) & (cols[None, :] != i1[:, None])
    m3 = (dr != 0) & (np.abs(dr) <= 2)
    d2b = np.where(m2, d2, np.inf)
    d2c = np.where(m3, d2, np.inf)
    i2 = np.argmin(d2b, axis=1)
    i3 = np.argmin(d2c, axis=1)
    ar = np.arange(n)
    ok = (d2[ar, i1] < thr) & (d2b[ar, i2] < thr) & (d2c[ar, i3] < thr)
    return i1, i2, i3, ok


# ------------------------------------------------------------- residuals


def corner_resid(q, a, b):
    """Point-to-line distances, unsigned (featureAssociation.cpp:1121-1135)."""
    ab = a - b
    num = np.linalg.norm(np.cross(q - a, q - b), axis=1)
    den = np.linalg.norm(ab, axis=1) + 1e-12
    return num / den


def corner_normal(q, a, b):
    """Unit direction of the perpendicular from q to line ab."""
    u = (a - b) / (np.linalg.norm(a - b, axis=1, keepdims=True) + 1e-12)
    e = q - a
    perp = e - np.sum(e * u, axis=1, keepdims=True) * u
    return perp / (np.linalg.norm(perp, axis=1, keepdims=True) + 1e-12)


def surf_resid(q, a, b, c):
    n = np.cross(b - a, c - a)
    n = n / (np.linalg.norm(n, axis=1, keepdims=True) + 1e-12)
    return np.sum(n * (q - a), axis=1), n


# -------------------------------------------------------- two-step LM


def _gn_solve(J, d, w, dof, eig_thresh, proj):
    """Weighted normal equations + degeneracy projection
    (featureAssociation.cpp:1301-1356)."""
    A = J * w[:, None]
    b = -(w * d)
    H = A.T @ A
    g = A.T @ b
    if proj is None:
        lam, V = np.linalg.eigh((J * (w > 0)[:, None]).T @ (J * (w > 0)[:, None]))
        keep = (lam >= eig_thresh).astype(float)
        proj = (V * keep[None, :]) @ V.T
    x = np.linalg.solve(H + 1e-6 * np.eye(dof), g)
    return proj @ x, proj


def oracle_odometry_step(rel, cur, ref, cfg):
    """Two-step LM (featureAssociation.cpp:1666-1695): 5 association rounds x
    5 GN iterations of the surf phase (pitch, roll, tz) then the corner phase
    (yaw, tx, ty), reference weights 1 - 1.8|d| (surf range-normalized),
    degeneracy eigen threshold 10.  rel is the frame-to-frame motion (s = 1,
    motion-compensated input); cur/ref are dicts with xyz/ring arrays."""
    R, t = rel
    thr = cfg.nearest_feature_search_sq_dist

    surf_chart = [(np.array([0.0, 1.0, 0.0]), np.zeros(3)),   # pitch wy
                  (np.array([1.0, 0.0, 0.0]), np.zeros(3)),   # roll wx
                  (np.zeros(3), np.array([0.0, 0.0, 1.0]))]   # vz
    corner_chart = [(np.array([0.0, 0.0, 1.0]), np.zeros(3)),  # yaw wz
                    (np.zeros(3), np.array([1.0, 0.0, 0.0])),  # vx
                    (np.zeros(3), np.array([0.0, 1.0, 0.0]))]  # vy

    def phase(R, t, pts, ring, assoc_fn, resid_fn, chart):
        proj = None
        for _round in range(cfg.odom_outer_iters):
            q = pts @ R.T + t
            assoc = assoc_fn(q)
            proj = None  # refreshed per association round (engine parity)
            for _it in range(cfg.odom_inner_iters):
                q = pts @ R.T + t
                d, n, w_extra, ok = resid_fn(q, assoc)
                if ok.sum() < cfg.odom_min_constraints:
                    break
                # J rows for residual n . q(x), q(x) = q + w x q + v
                J = np.stack([
                    np.sum(n * (np.cross(np.broadcast_to(wb, q.shape), q)
                                + vb), axis=1)
                    for wb, vb in chart], axis=1)
                w = (1.0 - 1.8 * np.abs(d) * w_extra)
                w = np.where(ok & (w > 0.1), w, 0.0)
                x, proj = _gn_solve(J, d, w, 3, cfg.odom_degen_eig_thresh,
                                    proj)
                wv = sum(x[k] * chart[k][0] for k in range(3))
                vv = sum(x[k] * chart[k][1] for k in range(3))
                R = _exp(wv) @ R
                t = t + vv
                if (np.degrees(np.linalg.norm(wv)) < cfg.odom_delta_rot_deg
                        and 100 * np.linalg.norm(vv)
                        < cfg.odom_delta_trans_cm):
                    break
        return R, t

    # ---- surf phase
    s_xyz, s_ring = cur["flat_xyz"], cur["flat_ring"]
    r_xyz, r_ring = ref["surf_xyz"], ref["surf_ring"]
    if len(s_xyz) and len(r_xyz) >= 3:
        def s_assoc(q):
            return oracle_assoc_surf(q, r_xyz, r_ring, thr)

        def s_resid(q, assoc):
            i1, i2, i3, ok = assoc
            d, n = surf_resid(q, r_xyz[i1], r_xyz[i2], r_xyz[i3])
            w_extra = 1.0 / np.sqrt(np.sqrt(
                np.linalg.norm(q, axis=1) + 1e-9))
            return d, n, w_extra, ok

        R, t = phase(R, t, s_xyz, s_ring, s_assoc, s_resid, surf_chart)

    # ---- corner phase
    c_xyz, c_ring = cur["sharp_xyz"], cur["sharp_ring"]
    rc_xyz, rc_ring = ref["corner_xyz"], ref["corner_ring"]
    if len(c_xyz) and len(rc_xyz) >= 2:
        def c_assoc(q):
            return oracle_assoc_corner(q, rc_xyz, rc_ring, thr)

        def c_resid(q, assoc):
            i1, i2, ok = assoc
            a, b = rc_xyz[i1], rc_xyz[i2]
            d = corner_resid(q, a, b)
            n = corner_normal(q, a, b)
            return d, n, np.ones_like(d), ok

        R, t = phase(R, t, c_xyz, c_ring, c_assoc, c_resid, corner_chart)
    return R, t


# ------------------------------------------------------------- mapping


def voxel_centroid(pts, leaf):
    """Centroid-per-voxel downsample (PCL VoxelGrid semantics,
    mapOptmization.cpp:249-257)."""
    if len(pts) == 0:
        return pts
    keys = np.floor(pts / leaf).astype(np.int64)
    _, inv = np.unique(keys, axis=0, return_inverse=True)
    n = inv.max() + 1
    sums = np.zeros((n, 3))
    cnt = np.zeros(n)
    np.add.at(sums, inv, pts)
    np.add.at(cnt, inv, 1.0)
    return sums / cnt[:, None]


def oracle_scan_to_map(T, corner, surf, map_corner, map_surf, cfg):
    """6-DoF GN against the local map (mapOptmization.cpp:1093-1350):
    5-NN line/plane fits, weights 1 - 0.9|d| (surf range-normalized), eigen
    threshold 100, <=10 iterations."""
    R, t = T
    if len(map_corner) < 10 or len(map_surf) < 100:
        return R, t
    proj = None
    for it in range(cfg.map_iters):
        qc = corner @ R.T + t
        qs = surf @ R.T + t

        q0s, ns, ds, ws = [], [], [], []
        # corner constraints (batched over points, same per-point rules)
        if len(map_corner) >= 5 and len(qc):
            nn, d5 = _knn5(qc, map_corner)
            P = map_corner[nn]                        # (N, 5, 3)
            c = P.mean(axis=1)
            X = P - c[:, None, :]
            cov = np.einsum("nki,nkj->nij", X, X) / 5
            lam, V = np.linalg.eigh(cov)
            ok = (d5 < cfg.map_nn_radius_sq) \
                & (lam[:, 2] > cfg.map_line_eig_ratio * lam[:, 1])
            v = V[:, :, 2]
            a, b = c + 0.1 * v, c - 0.1 * v
            d = corner_resid(qc, a, b)
            n = corner_normal(qc, a, b)
            w = 1.0 - 0.9 * np.abs(d)
            ok &= w > 0.1
            q0s.append(qc[ok]); ns.append(n[ok])
            ds.append(d[ok]); ws.append(w[ok])
        # surf constraints
        if len(map_surf) >= 5 and len(qs):
            nn, d5 = _knn5(qs, map_surf)
            P = map_surf[nn]
            AtA = np.einsum("nki,nkj->nij", P, P)
            Atb = -P.sum(axis=1)
            tr = np.trace(AtA, axis1=1, axis2=2)
            nvec = np.linalg.solve(
                AtA + (1e-9 * tr[:, None, None] + 1e-12) * np.eye(3),
                Atb[..., None])[..., 0]
            norm = np.linalg.norm(nvec, axis=1)
            n = nvec / np.maximum(norm, 1e-12)[:, None]
            dplane = 1.0 / np.maximum(norm, 1e-12)
            resid = np.abs(np.einsum("nki,ni->nk", P, n)
                           + dplane[:, None])
            c = P.mean(axis=1)
            X = P - c[:, None, :]
            lam = np.linalg.eigvalsh(np.einsum("nki,nkj->nij", X, X) / 5)
            d = np.einsum("ni,ni->n", n, qs) + dplane
            w = 1.0 - 0.9 * np.abs(d) / np.sqrt(np.sqrt(
                np.linalg.norm(qs, axis=1) + 1e-9))
            ok = ((d5 < cfg.map_nn_radius_sq) & (norm > 1e-9)
                  & np.all(resid <= cfg.map_plane_max_resid, axis=1)
                  & (lam[:, 1] > cfg.map_plane_min_spread ** 2)
                  & (w > 0.1))
            q0s.append(qs[ok]); ns.append(n[ok])
            ds.append(d[ok]); ws.append(w[ok])

        if not q0s or sum(len(x) for x in ds) < cfg.map_min_constraints:
            break
        q0 = np.concatenate(q0s)
        n = np.concatenate(ns)
        d = np.concatenate(ds)
        w = np.concatenate(ws)
        Jw = np.cross(q0, n)             # d/dw of n.(q + w x q)
        J = np.concatenate([Jw, n], axis=1)
        x, proj = _gn_solve(J, d, w, 6, cfg.map_degen_eig_thresh,
                            proj if it > 0 else None)
        R = _exp(x[:3]) @ R
        t = t + x[3:]
        if (np.degrees(np.linalg.norm(x[:3])) < cfg.map_delta_rot_deg
                and 100 * np.linalg.norm(x[3:]) < cfg.map_delta_trans_cm):
            break
    return R, t


def oracle_pose_graph(kf_R, kf_t, meas, loops, cfg, iters=20):
    """Dense least-squares pose-graph GN over the chain + loop edges
    (gtsam/iSAM2 replacement semantics, mapOptmization.cpp:1376-1398).
    meas: list of (Z_R, Z_t) chain measurements (i-1 -> i); loops: list of
    (i, j, Z_R, Z_t, w)."""
    K = len(kf_R)
    R = [r.copy() for r in kf_R]
    t = [x.copy() for x in kf_t]
    w_chain_rot = 1.0 / cfg.pg_rot_sigma
    w_chain_tr = 1.0 / cfg.pg_trans_sigma
    for _ in range(iters):
        H = np.zeros((6 * K, 6 * K))
        g = np.zeros(6 * K)

        def add_edge(i, j, ZR, Zt, wr, wt):
            # residual of T_i^-1 T_j vs Z, chordal-style: rotation residual
            # log(Z_R^T R_i^T R_j), translation residual R_i^T(t_j-t_i)-Z_t
            Rij = R[i].T @ R[j]
            r_rot = _log(ZR.T @ Rij) * wr
            r_tr = (R[i].T @ (t[j] - t[i]) - Zt) * wt
            r = np.concatenate([r_rot, r_tr])
            # finite-difference Jacobian wrt (w_i, v_i, w_j, v_j)
            Jrow = np.zeros((6, 12))
            for k in range(12):
                dw = np.zeros(12)
                dw[k] = FD_EPS
                Ri = _exp(dw[0:3]) @ R[i]
                ti = t[i] + dw[3:6]
                Rj = _exp(dw[6:9]) @ R[j]
                tj = t[j] + dw[9:12]
                rr = np.concatenate([
                    _log(ZR.T @ (Ri.T @ Rj)) * wr,
                    (Ri.T @ (tj - ti) - Zt) * wt])
                Jrow[:, k] = (rr - r) / FD_EPS
            idx = np.concatenate([np.arange(6 * i, 6 * i + 6),
                                  np.arange(6 * j, 6 * j + 6)])
            H[np.ix_(idx, idx)] += Jrow.T @ Jrow
            g[idx] += -Jrow.T @ r

        for i in range(1, K):
            ZR, Zt = meas[i]
            add_edge(i - 1, i, ZR, Zt, w_chain_rot, w_chain_tr)
        for (i, j, ZR, Zt, w) in loops:
            add_edge(i, j, ZR, Zt, w_chain_rot * np.sqrt(w),
                     w_chain_tr * np.sqrt(w))
        # prior on node 0
        H[:6, :6] += np.eye(6) / cfg.pg_prior_sigma ** 2
        g[:6] += -np.concatenate([_log(R[0]), t[0]]) / cfg.pg_prior_sigma ** 2

        dx = np.linalg.solve(H + 1e-6 * np.eye(6 * K), g)
        for i in range(K):
            R[i] = _exp(dx[6 * i:6 * i + 3]) @ R[i]
            t[i] = t[i] + dx[6 * i + 3:6 * i + 6]
        if np.linalg.norm(dx) < 1e-6:
            break
    return R, t
