"""NumPy oracle of the reference front-end semantics.

Sequential transliteration (from understanding, in NumPy/Python) of the
reference's imageProjection stage: projection scatter, ground stencil, BFS
flood-fill segmentation with cluster-validity rules, and the row-major
segmented-cloud emission (reference: imageProjection.cpp:199-368, 370-460).
Used only by tests to check the data-parallel kernels compute the same thing.
"""

from __future__ import annotations

from collections import deque

import numpy as np

FLT_MAX = 1.0e9


def oracle_project(xyz, valid, ring, cfg):
    s = cfg.sensor
    R, H = s.n_scan, s.horizon_scan
    rng_grid = np.full((R, H), FLT_MAX, np.float32)
    xyz_grid = np.zeros((R, H, 3), np.float32)
    for i in range(xyz.shape[0]):
        if not valid[i]:
            continue
        x, y, z = xyz[i]
        r = np.sqrt(x * x + y * y + z * z)
        if r < s.min_range or r > s.max_range:
            continue
        if s.use_ring:
            row = int(ring[i])
        else:
            vert = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
            row = int(np.floor((vert + s.ang_bottom) / s.ang_res_y))
        if row < 0 or row >= R:
            continue
        horizon = np.degrees(np.arctan2(x, y))
        col = int(-round((horizon - 90.0) / s.ang_res_x) + H // 2)
        if col >= H:
            col -= H
        if col < 0 or col >= H:
            continue
        # nearest-wins (the kernel's deterministic rule)
        if r < rng_grid[row, col]:
            rng_grid[row, col] = r
            xyz_grid[row, col] = [x, y, z]
    return xyz_grid, rng_grid, rng_grid < FLT_MAX


def oracle_ground(xyz_grid, valid_grid, cfg):
    s = cfg.sensor
    R, H = valid_grid.shape
    ground = np.zeros((R, H), bool)
    for j in range(H):
        for i in range(s.ground_scan_ind):
            if not (valid_grid[i, j] and valid_grid[i + 1, j]):
                continue
            d = xyz_grid[i + 1, j] - xyz_grid[i, j]
            ang = np.degrees(np.arctan2(d[2], np.hypot(d[0], d[1])))
            if abs(ang - s.mount_angle) <= cfg.ground_angle_thresh_deg:
                ground[i, j] = True
                ground[i + 1, j] = True
    return ground & valid_grid


def oracle_edges(rng_grid, valid_grid, ground, cfg):
    """Edge masks from the beta-angle predicate, computed in float64.

    Returns (seg, edge_h, edge_v) matching ops.segmentation.build_edges
    conventions, plus the raw angles for tolerance checks.
    """
    R, H = valid_grid.shape
    seg = valid_grid & ~ground
    r64 = rng_grid.astype(np.float64)

    def angles(a, b, alpha):
        d1 = np.maximum(a, b)
        d2 = np.minimum(a, b)
        return np.arctan2(d2 * np.sin(alpha), d1 - d2 * np.cos(alpha))

    ang_h = angles(r64, np.roll(r64, -1, axis=1), cfg.segment_alpha_x)
    ang_v = np.zeros((R, H))
    ang_v[:-1] = angles(r64[:-1], r64[1:], cfg.segment_alpha_y)
    edge_h = (ang_h > cfg.segment_theta) & seg & np.roll(seg, -1, axis=1)
    edge_v = np.zeros((R, H), bool)
    edge_v[:-1] = (ang_v[:-1] > cfg.segment_theta) & seg[:-1] & seg[1:]
    return seg, edge_h, edge_v, ang_h, ang_v


def oracle_segment(seg, edge_h, edge_v, cfg):
    """BFS flood fill over a given edge graph; returns (labels, good, outlier).

    labels: int array, -1 where not segmentable, else a component id.
    Mirrors the reference's queue-based flood fill + validity rules
    (imageProjection.cpp:370-460) but takes the connectivity as input so the
    graph is bit-identical to the device kernel's.
    """
    R, H = seg.shape
    labels = np.full((R, H), -1, np.int64)
    cluster_good = np.zeros((R, H), bool)
    outlier = np.zeros((R, H), bool)
    next_label = 0

    def connected(r, c, rr, cc):
        if rr == r + 1:
            return edge_v[r, c]
        if rr == r - 1:
            return edge_v[rr, cc]
        if cc == (c + 1) % H:
            return edge_h[r, c]
        return edge_h[rr, cc]

    for r0 in range(R):
        for c0 in range(H):
            if not seg[r0, c0] or labels[r0, c0] >= 0:
                continue
            comp = [(r0, c0)]
            labels[r0, c0] = next_label
            q = deque([(r0, c0)])
            rows_seen = {r0}
            while q:
                r, c = q.popleft()
                for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                    rr, cc = r + dr, (c + dc) % H
                    if rr < 0 or rr >= R:
                        continue
                    if not seg[rr, cc] or labels[rr, cc] >= 0:
                        continue
                    if connected(r, c, rr, cc):
                        labels[rr, cc] = next_label
                        comp.append((rr, cc))
                        rows_seen.add(rr)
                        q.append((rr, cc))
            good = len(comp) >= cfg.segment_big_cluster or (
                len(comp) >= cfg.segment_valid_point_num
                and len(rows_seen) >= cfg.segment_valid_line_num
            )
            for rc in comp:
                if good:
                    cluster_good[rc] = True
                else:
                    outlier[rc] = True
            next_label += 1
    return labels, cluster_good, outlier


def oracle_compact(rng_grid, ground, cluster_good, outlier, cfg):
    """Row-major emission (imageProjection.cpp:312-368).

    Returns per-ring lists of (col, range, is_ground) plus the outlier pixel
    set {(row, col)}.
    """
    s = cfg.sensor
    R, H = rng_grid.shape
    rings = []
    outliers = set()
    for i in range(R):
        kept = []
        for j in range(H):
            if outlier[i, j]:
                if i > s.ground_scan_ind and j % 5 == 0:
                    outliers.add((i, j))
                continue
            if cluster_good[i, j] or ground[i, j]:
                if ground[i, j] and not cluster_good[i, j]:
                    if j % 5 != 0 and j > 5 and j < H - 5:
                        continue
                kept.append((j, float(rng_grid[i, j]), bool(ground[i, j])))
        rings.append(kept)
    return rings, outliers
