"""Cluster segmentation of the range image.

The reference does a sequential BFS flood fill per seed with a hand-rolled
queue (reference: imageProjection.cpp:370-460).  That is inherently serial;
here the same connected components are computed data-parallel:

  1. build boolean edge grids from the beta-angle predicate
     angle = atan2(d2*sin(a), d1 - d2*cos(a)) > segment_theta
     (d1 >= d2 the two ranges, `a` the angular resolution in that direction);
  2. initialize every segmentable pixel's label with its linear index;
  3. iterate min-label propagation until fixpoint, where each sweep does a
     *segmented min-scan* along rows and columns (log-depth associative scans
     over connected runs) plus a 4-neighbor min with horizontal wraparound —
     so labels cross an entire straight run in one sweep instead of one pixel
     per step as naive propagation would;
  4. reduce per-component size and ring span, apply the reference's validity
     rules (>=30 px, or >=segment_valid_point_num px spanning
     >=segment_valid_line_num rings; imageProjection.cpp:440-451).

A 4-connected component occupies a contiguous row interval, so the ring span
(max_row - min_row + 1) equals the reference's distinct-ring count.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lego_loam_tpu.config import PipelineConfig
from lego_loam_tpu.types import RangeImage


class Segmentation(NamedTuple):
    labels: jnp.ndarray       # (R, H) int32 component root id; -1 if not segmentable
    cluster_good: jnp.ndarray  # (R, H) bool: member of a valid cluster
    outlier: jnp.ndarray       # (R, H) bool: member of an invalid cluster


def _edge_predicate(r1, r2, alpha, theta):
    d1 = jnp.maximum(r1, r2)
    d2 = jnp.minimum(r1, r2)
    angle = jnp.arctan2(d2 * jnp.sin(alpha), d1 - d2 * jnp.cos(alpha))
    return angle > theta


def _segmented_min_scan(labels, conn_prev, axis, reverse):
    """Min-scan of `labels` within runs delimited by `conn_prev`.

    conn_prev[i] == True means element i is connected to element i-1 along
    `axis` (in scan direction).  Returns per-element min over the maximal
    connected run prefix (suffix if reverse).
    """

    def combine(a, b):
        am, ae = a
        bm, be = b
        return jnp.where(be, jnp.minimum(am, bm), bm), ae & be

    m, _ = jax.lax.associative_scan(
        combine, (labels, conn_prev), axis=axis, reverse=reverse
    )
    return m


def build_edges(img: RangeImage, ground: jnp.ndarray, cfg: PipelineConfig):
    """Connectivity graph of the range image.

    Returns (seg, edge_h, edge_v): seg marks pixels that participate in
    clustering; edge_h[r, c] connects (r,c)-(r,c+1 mod H) (circular);
    edge_v[r, c] connects (r,c)-(r+1,c) (last row all False).
    """
    R, H = img.rng.shape
    seg = img.valid & ~ground

    theta = cfg.segment_theta
    ax, ay = cfg.segment_alpha_x, cfg.segment_alpha_y

    rng_r = jnp.roll(img.rng, -1, axis=1)
    edge_h = (
        _edge_predicate(img.rng, rng_r, ax, theta)
        & seg & jnp.roll(seg, -1, axis=1)
    )
    edge_v = (
        _edge_predicate(img.rng[:-1], img.rng[1:], ay, theta)
        & seg[:-1] & seg[1:]
    )
    edge_v = jnp.concatenate([edge_v, jnp.zeros((1, H), bool)], axis=0)
    return seg, edge_h, edge_v


def label_components(
    img: RangeImage,
    ground: jnp.ndarray,
    cfg: PipelineConfig,
    edges=None,
) -> Segmentation:
    R, H = img.rng.shape
    seg, edge_h, edge_v = edges if edges is not None else build_edges(img, ground, cfg)

    big = jnp.int32(R * H)
    lin = jnp.arange(R * H, dtype=jnp.int32).reshape(R, H)
    labels0 = jnp.where(seg, lin, big)

    # Per-direction "connected to predecessor" masks for the scans.
    conn_left = jnp.roll(edge_h, 1, axis=1)       # (r,c) connected to (r,c-1)
    conn_left_lin = conn_left.at[:, 0].set(False)  # linear scan: no wrap inside scan
    conn_right_lin = edge_h.at[:, -1].set(False)
    conn_up = jnp.concatenate([jnp.zeros((1, H), bool), edge_v[:-1]], axis=0)
    conn_down = edge_v

    backend = cfg.segmentation_backend
    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu")
    if use_pallas:
        from lego_loam_tpu.ops.segmentation_pallas import (
            propagate_labels_pallas,
        )

        labels = propagate_labels_pallas(
            labels0, conn_left, edge_h, conn_up, conn_down,
            max_sweeps=cfg.label_prop_max_sweeps)
        return _finalize(labels, seg, R, H, big, cfg)

    def sweep(labels):
        # 4-neighbor min (includes the column wraparound via roll).
        n = jnp.minimum(
            jnp.where(conn_left, jnp.roll(labels, 1, axis=1), big),
            jnp.where(edge_h, jnp.roll(labels, -1, axis=1), big),
        )
        n = jnp.minimum(
            n,
            jnp.where(conn_up, jnp.roll(labels, 1, axis=0), big),
        )
        n = jnp.minimum(
            n,
            jnp.where(conn_down, jnp.roll(labels, -1, axis=0), big),
        )
        labels = jnp.minimum(labels, n)
        # Row runs (log-depth), then column runs.
        labels = jnp.minimum(
            _segmented_min_scan(labels, conn_left_lin, axis=1, reverse=False),
            _segmented_min_scan(labels, conn_right_lin, axis=1, reverse=True),
        )
        labels = jnp.minimum(
            _segmented_min_scan(labels, conn_up, axis=0, reverse=False),
            _segmented_min_scan(labels, conn_down, axis=0, reverse=True),
        )
        return labels

    def cond(state):
        labels, prev_changed, it = state
        return prev_changed & (it < cfg.label_prop_max_sweeps)

    def body(state):
        labels, _, it = state
        new = sweep(labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.bool_(True), jnp.int32(0))
    )
    return _finalize(labels, seg, R, H, big, cfg)


def _finalize(labels, seg, R, H, big, cfg) -> Segmentation:
    """Component statistics + validity rules (imageProjection.cpp:440-451)."""
    use_matmul = cfg.segstats_backend == "matmul" or (
        cfg.segstats_backend == "auto" and jax.default_backend() == "tpu")
    if use_matmul:
        good_grid = _cluster_stats_matmul(labels, seg, R, H, big, cfg)
    else:
        good_grid = _cluster_stats_scatter(labels, seg, R, H, big, cfg)
    cluster_good = seg & good_grid
    outlier = seg & ~cluster_good
    return Segmentation(
        labels=jnp.where(seg, labels, -1),
        cluster_good=cluster_good,
        outlier=outlier,
    )


def _cluster_stats_scatter(labels, seg, R, H, big, cfg):
    """Per-component size/ring-span via scatter reductions (invalid pixels
    hit slot R*H).  Random-index scatters serialize on TPU (~1 ms/scan at
    VLP-16 sizes) — kept as the reference path for other backends."""
    flat = jnp.where(seg, labels, big).reshape(-1)
    ones = seg.reshape(-1).astype(jnp.int32)
    counts = jnp.zeros((R * H + 1,), jnp.int32).at[flat].add(ones)
    rows = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[:, None], (R, H)).reshape(-1)
    min_row = jnp.full((R * H + 1,), R, jnp.int32).at[flat].min(jnp.where(ones == 1, rows, R))
    max_row = jnp.full((R * H + 1,), -1, jnp.int32).at[flat].max(jnp.where(ones == 1, rows, -1))
    span = max_row - min_row + 1
    good = (counts >= cfg.segment_big_cluster) | (
        (counts >= cfg.segment_valid_point_num)
        & (span >= cfg.segment_valid_line_num)
    )
    return good[flat].reshape(R, H)


def _cluster_stats_matmul(labels, seg, R, H, big, cfg):
    """Per-component size/ring-span as MXU matmuls, no scatters.

    Labels are component ROOT linear indices (the min-label fixpoint), so a
    pixel is its component's root iff labels == its own linear index.  The
    first max_clusters roots (by linear index) become compact cluster ids via
    top_k; per-cluster pixel count and per-(cluster, ring) presence are then
    one-hot contractions — dense (R*H, C) compares and matmuls instead of
    random-index scatters.  Components beyond max_clusters (a scan with
    >max_clusters real objects — far beyond anything a VLP-16 sweep
    produces; capacity is configurable) fall into no one-hot column and are
    marked outliers, which is also where the reference sends every
    small/thin cluster."""
    C = cfg.max_clusters
    lin = jnp.arange(R * H, dtype=jnp.int32).reshape(R, H)
    root = seg & (labels == lin)
    # ascending root linear indices; non-roots sort after every real root
    key = jnp.where(root, lin, big).reshape(-1)
    neg_roots, _ = jax.lax.top_k(-key, C)
    root_ids = -neg_roots             # (C,) smallest root indices, ascending
    flat = jnp.where(seg, labels, big).reshape(-1)         # (P,)
    onehot = (flat[:, None] == root_ids[None, :]) & (root_ids[None, :] < big)
    oh = onehot.astype(jnp.float32)                        # (P, C)
    counts = jnp.sum(oh, axis=0)                           # (C,) exact in f32
    ring_oh = jnp.broadcast_to(
        jnp.eye(R, dtype=jnp.float32)[:, None, :], (R, H, R)).reshape(-1, R)
    presence = oh.T @ ring_oh                              # (C, R) MXU
    has_ring = presence > 0.5
    r_idx = jnp.arange(R, dtype=jnp.int32)[None, :]
    min_row = jnp.min(jnp.where(has_ring, r_idx, R), axis=1)
    max_row = jnp.max(jnp.where(has_ring, r_idx, -1), axis=1)
    span = max_row - min_row + 1
    good_c = (counts >= cfg.segment_big_cluster) | (
        (counts >= cfg.segment_valid_point_num)
        & (span >= cfg.segment_valid_line_num)
    )
    # back to pixels: one matvec instead of a gather
    good_flat = (oh @ good_c.astype(jnp.float32)) > 0.5
    return good_flat.reshape(R, H)
