"""NumPy oracle for feature extraction (ring-local reference semantics).

Mirrors featureAssociation.cpp:621-784 pick logic on the per-ring compacted
layout: sector split, descending corner picks (<=2 sharp, <=20 less-sharp),
ascending ground-only flat picks (<=4, last one unsuppressed), +-5 neighbor
suppression stopped at column gaps > 10, occlusion/parallel-beam pre-masking.
Ties in curvature are broken by lowest index (the kernel's argmax rule).
"""

from __future__ import annotations

import numpy as np


def oracle_curvature(rng, valid, count):
    R, W = rng.shape
    r = np.where(valid, rng, 0.0).astype(np.float32)
    curv = np.zeros((R, W), np.float32)
    cvalid = np.zeros((R, W), bool)
    for i in range(R):
        for k in range(5, int(count[i]) - 5):
            d = np.float32(-10.0) * r[i, k]
            for off in range(1, 6):
                d += r[i, k - off] + r[i, k + off]
            curv[i, k] = d * d
            cvalid[i, k] = True
    return curv, cvalid


def oracle_occlusion(rng, col, count, cfg):
    R, W = rng.shape
    picked = np.zeros((R, W), bool)
    for i in range(R):
        n = int(count[i])
        for k in range(5, n - 6):
            d1, d2 = rng[i, k], rng[i, k + 1]
            cd = abs(int(col[i, k + 1]) - int(col[i, k]))
            if cd < cfg.occlusion_col_diff:
                if d1 - d2 > cfg.occlusion_depth_gap:
                    picked[i, k - 5 : k + 1] = True
                elif d2 - d1 > cfg.occlusion_depth_gap:
                    picked[i, k + 1 : k + 7] = True
            diff1 = abs(rng[i, k - 1] - rng[i, k])
            diff2 = abs(rng[i, k + 1] - rng[i, k])
            if (diff1 > cfg.parallel_beam_frac * rng[i, k]
                    and diff2 > cfg.parallel_beam_frac * rng[i, k]):
                picked[i, k] = True
    return picked


def _suppress(picked, i, k, col, n):
    picked[i, k] = True
    for l in range(1, 6):
        if k + l > n - 1:
            break
        if abs(int(col[i, k + l]) - int(col[i, k + l - 1])) > 10:
            break
        picked[i, k + l] = True
    for l in range(1, 6):
        if k - l < 0:
            break
        if abs(int(col[i, k - l]) - int(col[i, k - l + 1])) > 10:
            break
        picked[i, k - l] = True


def oracle_extract(rng, col, ground, valid, count, cfg):
    """Returns the labels grid: 2 sharp, 1 less-sharp, -1 flat, 0 none."""
    R, W = rng.shape
    curv, cvalid = oracle_curvature(rng, valid, count)
    picked = oracle_occlusion(rng, col, count, cfg)
    labels = np.zeros((R, W), np.int32)

    for i in range(R):
        n = int(count[i])
        start, end = 4, n - 6
        if n < 12:
            continue
        for j in range(cfg.sections_total):
            sp = (start * (6 - j) + end * j) // 6
            ep = (start * (5 - j) + end * (j + 1)) // 6 - 1
            if sp >= ep:
                continue
            sector = list(range(sp, ep + 1))

            # corner picks: descending curvature, lowest-index tie-break
            order = sorted(sector, key=lambda k: (-curv[i, k], k))
            npicked = 0
            for k in order:
                if picked[i, k] or not cvalid[i, k]:
                    continue
                if curv[i, k] <= cfg.edge_threshold or ground[i, k] or not valid[i, k]:
                    continue
                npicked += 1
                if npicked > cfg.edge_feature_num_less:
                    break
                labels[i, k] = 2 if npicked <= cfg.edge_feature_num else 1
                _suppress(picked, i, k, col, n)

            # flat picks: ascending curvature, ground only
            order = sorted(sector, key=lambda k: (curv[i, k], k))
            npicked = 0
            for k in order:
                if picked[i, k] or not cvalid[i, k]:
                    continue
                if curv[i, k] >= cfg.surf_threshold or not ground[i, k] or not valid[i, k]:
                    continue
                labels[i, k] = -1
                npicked += 1
                if npicked >= cfg.surf_feature_num:
                    break
                _suppress(picked, i, k, col, n)
    return labels, curv, cvalid, picked
