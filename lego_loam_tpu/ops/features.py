"""Curvature-based edge/planar feature extraction.

Equivalent of the reference's calculateSmoothness / markOccludedPoints /
extractFeatures (reference: featureAssociation.cpp:621-784), re-laid-out for
the per-ring compacted arrays: all rings are processed in parallel, the six
azimuthal sectors and the ranked picks within a sector remain sequential
(they are sequential in the algorithm: every pick suppresses neighbors that
later picks must see).

Differences by design:
  * ring-local indexing: the reference's global 1-D cloud lets the +-5
    curvature window and neighbor suppression leak a few points across ring
    boundaries; here both are ring-local.
  * the reference sorts each sector then walks it; an iterated masked
    argmax/argmin picks the same points in the same order without the sort.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lego_loam_tpu.config import PipelineConfig
from lego_loam_tpu.ops.voxel import voxel_downsample
from lego_loam_tpu.types import FeatureCloud, ScanFeatures, SegmentedScan

_NEG_INF = -1.0e30


def compute_curvature(packed: SegmentedScan, cfg: PipelineConfig):
    """11-tap range stencil; curvature = (sum of 10 neighbors - 10*r)^2.

    Returns (curv (R, W), curv_valid (R, W)).
    """
    rng = packed.rng * packed.valid
    acc = -10.0 * rng
    for off in range(1, 6):
        acc = acc + jnp.roll(rng, off, axis=1) + jnp.roll(rng, -off, axis=1)
    curv = acc * acc
    W = rng.shape[1]
    idx = jnp.arange(W, dtype=jnp.int32)[None, :]
    curv_valid = (idx >= 5) & (idx <= packed.count[:, None] - 6)
    return curv, curv_valid


def occlusion_mask(packed: SegmentedScan, cfg: PipelineConfig) -> jnp.ndarray:
    """Initial neighbor-picked mask from occlusion / parallel-beam tests
    (featureAssociation.cpp:643-678)."""
    R, W = packed.rng.shape
    rng = packed.rng
    col = packed.col
    idx = jnp.arange(W, dtype=jnp.int32)[None, :]
    in_range = (idx >= 5) & (idx <= packed.count[:, None] - 7)

    nxt = jnp.roll(rng, -1, axis=1)
    col_nxt = jnp.roll(col, -1, axis=1)
    col_diff_ok = jnp.abs(col_nxt - col) < cfg.occlusion_col_diff

    occl_this = in_range & col_diff_ok & (rng - nxt > cfg.occlusion_depth_gap)
    occl_next = in_range & col_diff_ok & (nxt - rng > cfg.occlusion_depth_gap)

    picked = jnp.zeros((R, W), bool)
    # occl_this at i marks i-5..i ; occl_next at i marks i+1..i+6
    for off in range(0, 6):
        picked = picked | jnp.roll(occl_this, -off, axis=1)
    for off in range(1, 7):
        picked = picked | jnp.roll(occl_next, off, axis=1)

    prv = jnp.roll(rng, 1, axis=1)
    diff1 = jnp.abs(prv - rng)
    diff2 = jnp.abs(nxt - rng)
    parallel = (
        in_range
        & (diff1 > cfg.parallel_beam_frac * rng)
        & (diff2 > cfg.parallel_beam_frac * rng)
    )
    return picked | parallel


def _sector_bounds(count: jnp.ndarray, j: jnp.ndarray, cfg: PipelineConfig):
    """Per-ring [sp, ep] of azimuthal sector j (featureAssociation.cpp:693-694)."""
    start = jnp.full_like(count, 4)
    end = count - 6
    sp = (start * (6 - j) + end * j) // 6
    ep = (start * (5 - j) + end * (j + 1)) // 6 - 1
    ok = (sp < ep) & (count >= 12)
    return sp, ep, ok


def _suppress_reach(col, count, cfg):
    """Per-cell suppression reach (left, right): how far a pick at each cell
    marks its +-5 neighbors picked, stopping at column gaps > 10 and ring
    bounds (featureAssociation.cpp:721-732).

    The gap/bound rules don't depend on which cell gets picked, so the reach
    is precomputed ONCE per scan; each pick then suppresses with a single
    band-mask compare instead of 10 sequential gather/scatter rounds (the
    pick loop is the latency-bound part of feature extraction on TPU)."""
    W = col.shape[1]
    idx = jnp.arange(W, dtype=jnp.int32)[None, :]
    # gap[i] = |col[i] - col[i-1]| <= 10 (between cells i-1 and i); the roll
    # wraparound at i=0 is harmless — it is masked by the bounds below
    gap = jnp.abs(col - jnp.roll(col, 1, axis=1)) <= 10
    cnt = count[:, None]

    reach_r = jnp.zeros(col.shape, jnp.int32)
    ok = jnp.ones(col.shape, bool)
    for l in range(1, 6):
        ok = ok & jnp.roll(gap, -l, axis=1) & (idx + l <= cnt - 1)
        reach_r = reach_r + ok.astype(jnp.int32)

    reach_l = jnp.zeros(col.shape, jnp.int32)
    ok = jnp.ones(col.shape, bool)
    for l in range(1, 6):
        ok = ok & jnp.roll(gap, l - 1, axis=1) & (idx - l >= 0)
        reach_l = reach_l + ok.astype(jnp.int32)
    return reach_l, reach_r


@partial(jax.jit, static_argnames=("cfg",))
def label_features(packed: SegmentedScan, cfg: PipelineConfig):
    """Run the sector pick loops; returns the label grid (2 sharp, 1
    less-sharp, -1 flat, 0 none) and the final picked mask."""
    R, W = packed.rng.shape
    rows = jnp.arange(R, dtype=jnp.int32)
    idxs = jnp.arange(W, dtype=jnp.int32)[None, :]

    curv, curv_valid = compute_curvature(packed, cfg)
    picked0 = occlusion_mask(packed, cfg)
    reach_l, reach_r = _suppress_reach(packed.col, packed.count, cfg)

    base = packed.valid & curv_valid
    corner_thresh = jnp.float32(cfg.edge_threshold)
    if cfg.edge_prominence > 0.0:
        # Robust prominence gate (new vs reference): range noise sigma puts
        # a chi-square floor of ~(110 sigma^2) under the 11-tap curvature,
        # and at sigma = 2 cm that floor CLEARS the reference's absolute
        # edgeThreshold=0.1 (utility.h:122) — every sector of a smooth wall
        # then saturates its corner quota with speckle, drowning the real
        # geometric anchors (measured: examples/diag_corridor.py, n_sharp
        # pegged at cap with noise vs ~half without).  The per-ring MEDIAN
        # curvature estimates that noise floor robustly (real edges are
        # sparse); a corner must clear edge_prominence x floor as well as
        # the absolute threshold.  Noise-free data is unaffected (floor ~0).
        inf_fill = jnp.where(base, curv, jnp.inf)
        sorted_c = jnp.sort(inf_fill, axis=1)
        n_ok = jnp.sum(base, axis=1)
        med = jnp.take_along_axis(
            sorted_c, (jnp.maximum(n_ok - 1, 0) // 2)[:, None], axis=1)[:, 0]
        med = jnp.where(jnp.isfinite(med), med, 0.0)
        corner_thresh = jnp.maximum(
            corner_thresh, cfg.edge_prominence * med)[:, None]
    corner_base = base & (curv > corner_thresh) & ~packed.ground
    surf_base = base & (curv < cfg.surf_threshold) & packed.ground

    S = cfg.sections_total
    # (S,) sector bounds per ring: (R, S) each
    j_all = jnp.arange(S, dtype=jnp.int32)
    sp_all, ep_all, ok_all = jax.vmap(
        lambda j: _sector_bounds(packed.count, j, cfg), out_axes=1)(j_all)
    in_sec_all = (
        (idxs[:, None, :] >= sp_all[:, :, None])
        & (idxs[:, None, :] <= ep_all[:, :, None])
        & ok_all[:, :, None]
    )  # (R, S, W)

    def picks_for(sector_mask, n_sectors, labels, picked, base_mask, sign,
                  n_picks, label_of, suppress_last):
        """Iterated argmax picks over (R, n_sectors, W) eligibility."""
        rows_v = jnp.repeat(rows, n_sectors)

        def pick(k, st):
            labels, picked = st
            elig = base_mask[:, None, :] & sector_mask & ~picked[:, None, :]
            score = jnp.where(elig, sign * curv[:, None, :], _NEG_INF)
            idx = jnp.argmax(score, axis=2).astype(jnp.int32)   # (R, S')
            has = jnp.any(elig, axis=2)                          # (R, S')
            lab = label_of(k)
            idx_v = idx.reshape(-1)
            has_v = has.reshape(-1)
            cur = labels[rows_v, idx_v]
            labels = labels.at[rows_v, idx_v].set(jnp.where(has_v, lab, cur))
            sup = has & (suppress_last | (k < n_picks - 1))      # (R, S')
            rl = jnp.take_along_axis(reach_l, idx, axis=1)
            rr = jnp.take_along_axis(reach_r, idx, axis=1)
            band = (
                (idxs[:, None, :] >= (idx - rl)[:, :, None])
                & (idxs[:, None, :] <= (idx + rr)[:, :, None])
                & sup[:, :, None]
            )                                                    # (R, S', W)
            picked = picked | jnp.any(band, axis=1)
            return labels, picked

        return jax.lax.fori_loop(0, n_picks, pick, (labels, picked))

    labels0 = jnp.zeros((R, W), jnp.int32)

    use_pallas = cfg.sector_parallel and (
        cfg.feature_backend == "pallas"
        or (cfg.feature_backend == "auto"
            and jax.default_backend() == "tpu"))
    if use_pallas:
        # both pick loops in ONE kernel launch (the XLA loop below costs
        # ~2.5 ms/scan in launch latency alone; the data is < 1 MB)
        from lego_loam_tpu.ops.features_pallas import pick_features_pallas

        labels, picked = pick_features_pallas(
            curv, corner_base, surf_base, picked0, reach_l, reach_r,
            sp_all, ep_all, ok_all, S, cfg.edge_feature_num_less,
            cfg.edge_feature_num, cfg.surf_feature_num)
    elif cfg.sector_parallel:
        # all sectors pick simultaneously: 24 sequential steps instead of 144
        labels, picked = picks_for(
            in_sec_all, S, labels0, picked0, corner_base, 1.0,
            cfg.edge_feature_num_less,
            lambda k: jnp.where(k < cfg.edge_feature_num, 2, 1), True)
        labels, picked = picks_for(
            in_sec_all, S, labels, picked, surf_base, -1.0,
            cfg.surf_feature_num, lambda k: -1, False)
    else:
        # exact reference ordering: sectors sequential, corner pass then
        # surf pass per sector
        def sector_body(j, st):
            labels, picked = st
            mask = jax.lax.dynamic_slice_in_dim(in_sec_all, j, 1, axis=1)
            labels, picked = picks_for(
                mask, 1, labels, picked, corner_base, 1.0,
                cfg.edge_feature_num_less,
                lambda k: jnp.where(k < cfg.edge_feature_num, 2, 1), True)
            labels, picked = picks_for(
                mask, 1, labels, picked, surf_base, -1.0,
                cfg.surf_feature_num, lambda k: -1, False)
            return labels, picked

        labels, picked = jax.lax.fori_loop(
            0, S, sector_body, (labels0, picked0))
    return labels, picked


@partial(jax.jit, static_argnames=("cfg",))
def extract_features(
    packed: SegmentedScan, outlier_s: jnp.ndarray, cfg: PipelineConfig
) -> ScanFeatures:
    R, W = packed.rng.shape
    rows = jnp.arange(R, dtype=jnp.int32)
    idxs = jnp.arange(W, dtype=jnp.int32)[None, :]

    labels, picked = label_features(packed, cfg)

    ring_grid = jnp.broadcast_to(rows[:, None], (R, W))

    def compact(mask, cap):
        lin = jnp.arange(R * W, dtype=jnp.int32)
        key = jnp.where(mask.reshape(-1), lin, R * W)
        order = jnp.argsort(key)[:cap]
        ok = jnp.take(key, order) < R * W
        return FeatureCloud(
            xyz=jnp.where(ok[:, None], packed.xyz.reshape(-1, 3)[order], 0.0),
            ring=jnp.where(ok, ring_grid.reshape(-1)[order], 0),
            s=jnp.where(ok, packed.row_frac.reshape(-1)[order], 0.0),
            valid=ok,
            ground=jnp.where(ok, packed.ground.reshape(-1)[order], False),
        )

    sharp = compact(labels == 2, cfg.max_sharp)
    less_sharp = compact(labels >= 1, cfg.max_less_sharp)
    flat = compact(labels == -1, cfg.max_flat)

    # less-flat: everything not corner-picked inside the sector span,
    # voxel-downsampled per ring (featureAssociation.cpp:771-783)
    sp0, _, _ = _sector_bounds(packed.count, jnp.int32(0), cfg)
    _, ep5, _ = _sector_bounds(packed.count, jnp.int32(cfg.sections_total - 1), cfg)
    span = (idxs >= sp0[:, None]) & (idxs <= ep5[:, None]) & (packed.count[:, None] >= 12)
    lf_mask = span & (labels <= 0) & packed.valid

    cap_per_ring = cfg.max_less_flat // R

    def ring_ds(xyz, mask, s, gnd):
        aux = jnp.stack([s, gnd.astype(jnp.float32)], axis=1)
        # cls=gnd: a leaf straddling the ground/structure boundary splits
        # instead of emitting a mixed centroid lying off both surfaces —
        # those phantom points corrupted the odometry surf planes
        # systematically at wall bases (examples/diag_corridor2.py)
        return voxel_downsample(
            xyz, mask, cfg.leaf_less_flat, cap_per_ring, aux=aux, cls=gnd
        )

    lf_xyz, lf_aux, lf_valid = jax.vmap(ring_ds)(
        packed.xyz, lf_mask, packed.row_frac, packed.ground)
    less_flat = FeatureCloud(
        xyz=lf_xyz.reshape(-1, 3),
        ring=jnp.broadcast_to(rows[:, None], (R, cap_per_ring)).reshape(-1),
        s=lf_aux[..., 0].reshape(-1),
        valid=lf_valid.reshape(-1),
        # voxel-mean of the bool label; a voxel straddling the ground/wall
        # boundary counts as ground only if ground points dominate it
        ground=lf_aux[..., 1].reshape(-1) > 0.5,
    )

    outlier = FeatureCloud(
        xyz=packed.outlier_xyz,
        ring=jnp.zeros((packed.outlier_xyz.shape[0],), jnp.int32),
        s=outlier_s,
        valid=packed.outlier_valid,
        ground=jnp.zeros((packed.outlier_xyz.shape[0],), bool),
    )

    return ScanFeatures(
        sharp=sharp,
        less_sharp=less_sharp,
        flat=flat,
        less_flat=less_flat,
        outlier=outlier,
    )
