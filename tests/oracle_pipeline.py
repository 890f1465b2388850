"""Sequential NumPy oracle of the COMPLETE reference pipeline.

Composes the stage oracles (oracle_frontend: projection/ground/segmentation/
compaction; oracle_features: curvature/occlusion/picks; oracle_backend:
two-step LM, scan-to-map, keyframes, pose graph) into a whole-trajectory
SLAM run with the reference's scheduling (odometry every scan, mapping every
cfg.mapping_process_every scans, loop checks on a cadence) — the
reference-faithful end-to-end baseline the device pipeline is regression-
tested against (test_oracle_pipeline.py).

Assumes motion-compensated input (deskew=False, s = 1), the configuration the
synthetic raycast scans satisfy.
"""

from __future__ import annotations

import numpy as np

from tests import oracle_backend as ob
from tests.oracle_features import oracle_extract
from tests.oracle_frontend import (
    oracle_compact,
    oracle_edges,
    oracle_ground,
    oracle_project,
    oracle_segment,
)


def oracle_frontend_features(xyz, valid, ring, cfg):
    """Raw scan -> feature sets (dict of xyz/ring arrays per class)."""
    xyz_grid, rng_grid, valid_grid = oracle_project(xyz, valid, ring, cfg)
    ground = oracle_ground(xyz_grid, valid_grid, cfg)
    seg, edge_h, edge_v, _, _ = oracle_edges(rng_grid, valid_grid, ground, cfg)
    _, cluster_good, outlier = oracle_segment(seg, edge_h, edge_v, cfg)
    rings, outliers = oracle_compact(rng_grid, ground, cluster_good,
                                     outlier, cfg)

    R = cfg.sensor.n_scan
    W = cfg.sensor.horizon_scan
    rng_c = np.zeros((R, W), np.float32)
    col_c = np.zeros((R, W), np.int32)
    grd_c = np.zeros((R, W), bool)
    val_c = np.zeros((R, W), bool)
    count = np.zeros(R, np.int32)
    for i, kept in enumerate(rings):
        for k, (j, r, g) in enumerate(kept):
            rng_c[i, k] = r
            col_c[i, k] = j
            grd_c[i, k] = g
            val_c[i, k] = True
        count[i] = len(kept)

    labels, _, _, _ = oracle_extract(rng_c, col_c, grd_c, val_c, count, cfg)

    def collect(pred):
        pts, rid = [], []
        for i in range(R):
            for k in range(int(count[i])):
                if pred(labels[i, k], grd_c[i, k]):
                    pts.append(xyz_grid[i, col_c[i, k]])
                    rid.append(i)
        return (np.asarray(pts, np.float64).reshape(-1, 3),
                np.asarray(rid, np.int64))

    sharp_xyz, sharp_ring = collect(lambda l, g: l == 2)
    lsharp_xyz, lsharp_ring = collect(lambda l, g: l >= 1)
    flat_xyz, flat_ring = collect(lambda l, g: l == -1)

    # less-flat: every label<=0 point, voxel-downsampled per ring
    # (featureAssociation.cpp:766-783)
    lflat_xyz, lflat_ring = [], []
    for i in range(R):
        pts = [xyz_grid[i, col_c[i, k]] for k in range(int(count[i]))
               if labels[i, k] <= 0]
        if pts:
            ds = ob.voxel_centroid(np.asarray(pts, np.float64),
                                   cfg.leaf_less_flat)
            lflat_xyz.extend(ds)
            lflat_ring.extend([i] * len(ds))
    lflat_xyz = np.asarray(lflat_xyz, np.float64).reshape(-1, 3)
    lflat_ring = np.asarray(lflat_ring, np.int64)

    out_xyz = np.asarray(
        [xyz_grid[rc] for rc in sorted(outliers)], np.float64).reshape(-1, 3)

    return {
        "sharp_xyz": sharp_xyz, "sharp_ring": sharp_ring,
        "lsharp_xyz": lsharp_xyz, "lsharp_ring": lsharp_ring,
        "flat_xyz": flat_xyz, "flat_ring": flat_ring,
        "lflat_xyz": lflat_xyz, "lflat_ring": lflat_ring,
        "outlier_xyz": out_xyz,
    }


class OraclePipeline:
    """Sequential SLAM driver over the NumPy oracles."""

    def __init__(self, cfg, loop_check_every=10, loop_enabled=False):
        self.cfg = cfg
        self.loop_check_every = loop_check_every
        self.loop_enabled = loop_enabled
        self.frame = 0
        # odometry state
        self.pose = (np.eye(3), np.zeros(3))
        self.rel = (np.eye(3), np.zeros(3))
        self.ref = None
        # mapping state
        self.kf_R, self.kf_t, self.kf_time = [], [], []
        self.kf_corner, self.kf_surf = [], []
        self.meas = [None]
        self.loops = []
        self.n_closed = 0
        self.bef = (np.eye(3), np.zeros(3))
        self.aft = (np.eye(3), np.zeros(3))
        self.trajectory = []

    # ---- helpers ----

    @staticmethod
    def _compose(a, b):
        return (a[0] @ b[0], a[0] @ b[1] + a[1])

    @staticmethod
    def _inv(a):
        return (a[0].T, -(a[0].T @ a[1]))

    def _local_map(self, center):
        cfg = self.cfg
        mc, ms = [], []
        for R, t, c, s in zip(self.kf_R, self.kf_t,
                              self.kf_corner, self.kf_surf):
            if np.linalg.norm(t - center) \
                    > cfg.surrounding_keyframe_search_radius:
                continue
            mc.append(c @ R.T + t)
            ms.append(s @ R.T + t)
        if not mc:
            return np.zeros((0, 3)), np.zeros((0, 3))
        mc = ob.voxel_centroid(np.concatenate(mc), cfg.leaf_map_corner)
        ms = ob.voxel_centroid(np.concatenate(ms), cfg.leaf_map_surf)
        return mc, ms

    # ---- per-scan ----

    def process_scan(self, xyz, valid, ring, t=None):
        cfg = self.cfg
        t = self.frame * cfg.sensor.scan_period if t is None else t
        f = oracle_frontend_features(xyz, valid, ring, cfg)

        # odometry (scan-to-scan)
        if self.ref is not None and (
                len(self.ref["corner_xyz"]) >= cfg.odom_min_last_corner
                and len(self.ref["surf_xyz"]) >= cfg.odom_min_last_surf):
            cur = {"flat_xyz": f["flat_xyz"], "flat_ring": f["flat_ring"],
                   "sharp_xyz": f["sharp_xyz"], "sharp_ring": f["sharp_ring"]}
            self.rel = ob.oracle_odometry_step(self.rel, cur, self.ref, cfg)
        if self.ref is not None:
            self.pose = self._compose(self.pose, self.rel)
        self.ref = {
            "corner_xyz": f["lsharp_xyz"], "corner_ring": f["lsharp_ring"],
            "surf_xyz": f["lflat_xyz"], "surf_ring": f["lflat_ring"],
        }

        # mapping cadence
        if self.frame % cfg.mapping_process_every == 0:
            self._mapping_step(f, t)
        if (self.loop_enabled and self.frame % self.loop_check_every == 0
                and len(self.kf_R) > 2):
            self._loop_step(t)

        fused = self._compose(self.aft,
                              self._compose(self._inv(self.bef), self.pose))
        self.trajectory.append(fused[1].copy())
        self.frame += 1
        return fused

    def _mapping_step(self, f, t):
        cfg = self.cfg
        # prediction by odometry delta (mapOptmization.cpp:376-461)
        delta = self._compose(self._inv(self.bef), self.pose)
        T = self._compose(self.aft, delta)

        corner = ob.voxel_centroid(f["lsharp_xyz"], cfg.leaf_scan_corner)
        surf_in = np.concatenate([f["lflat_xyz"], f["outlier_xyz"]]) \
            if len(f["outlier_xyz"]) else f["lflat_xyz"]
        surf = ob.voxel_centroid(surf_in, cfg.leaf_scan_surf)

        mc, ms = self._local_map(T[1])
        R, tt = ob.oracle_scan_to_map(T, corner, surf, mc, ms, cfg)
        T = (R, tt)

        # keyframe insertion (mapOptmization.cpp:1353-1454)
        if (not self.kf_R or np.linalg.norm(T[1] - self.kf_t[-1])
                >= cfg.keyframe_min_translation):
            if self.kf_R:
                prev = (self.kf_R[-1], self.kf_t[-1])
                Z = self._compose(self._inv(prev), T)
                self.meas.append(Z)
            self.kf_R.append(T[0].copy())
            self.kf_t.append(T[1].copy())
            self.kf_time.append(t)
            self.kf_corner.append(corner)
            self.kf_surf.append(surf)
        self.bef = self.pose
        self.aft = T

    def _loop_step(self, t):
        cfg = self.cfg
        cur = len(self.kf_R) - 1
        cur_t = self.kf_t[cur]
        best, best_d = -1, np.inf
        for j in range(len(self.kf_R)):
            d = np.linalg.norm(self.kf_t[j] - cur_t)
            if (d < cfg.history_keyframe_search_radius
                    and abs(self.kf_time[j] - t) > cfg.loop_min_time_gap
                    and d < best_d):
                best, best_d = j, d
        if best < 0:
            return
        # ICP: latest keyframe cloud vs history submap around the candidate
        src = np.concatenate([self.kf_corner[cur], self.kf_surf[cur]])
        src = src @ self.kf_R[cur].T + self.kf_t[cur]
        H = cfg.history_keyframe_search_num
        tgt = []
        for j in range(max(0, best - H), min(len(self.kf_R), best + H + 1)):
            c = np.concatenate([self.kf_corner[j], self.kf_surf[j]])
            tgt.append(c @ self.kf_R[j].T + self.kf_t[j])
        tgt = ob.voxel_centroid(np.concatenate(tgt), cfg.leaf_history)

        R_icp, t_icp = np.eye(3), np.zeros(3)
        for _ in range(cfg.loop_icp_iters):
            q = src @ R_icp.T + t_icp
            j, dmin = ob._nn1(q, tgt)
            keep = dmin < cfg.loop_icp_max_corr_dist ** 2
            if keep.sum() < 10:
                break
            P, Q = q[keep], tgt[j[keep]]
            cp, cq = P.mean(0), Q.mean(0)
            U, _, Vt = np.linalg.svd((P - cp).T @ (Q - cq))
            Rk = Vt.T @ np.diag([1, 1, np.linalg.det(Vt.T @ U.T)]) @ U.T
            tk = cq - Rk @ cp
            R_icp, t_icp = Rk @ R_icp, Rk @ t_icp + tk
        q = src @ R_icp.T + t_icp
        _, dmin = ob._nn1(q, tgt)
        fitness = float(np.mean(dmin))
        if fitness >= cfg.history_keyframe_fitness_score:
            return
        # loop edge Z = (T_cur')^-1 T_cand with corrected current pose
        T_corr = self._compose((R_icp, t_icp),
                               (self.kf_R[cur], self.kf_t[cur]))
        Z = self._compose(self._inv(T_corr),
                          (self.kf_R[best], self.kf_t[best]))
        w = 1.0 / max(fitness, 1e-3)
        self.loops.append((cur, best, Z[0], Z[1], w))
        self.n_closed += 1
        newR, newt = ob.oracle_pose_graph(
            self.kf_R, self.kf_t, self.meas, self.loops, cfg)
        # re-anchor the latched mapped pose like the engine's state rewrite
        delta = self._compose((newR[cur], newt[cur]),
                              self._inv((self.kf_R[cur], self.kf_t[cur])))
        self.aft = self._compose(delta, self.aft)
        self.kf_R, self.kf_t = newR, newt
