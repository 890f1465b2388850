"""Fixed-shape pytrees that flow between pipeline stages.

The reference moves data between its four processes as serialized ROS
point clouds plus the `cloud_info` side-channel message
(reference: cloud_msgs/msg/cloud_info.msg:1-12).  Here every hand-off is a
NamedTuple of fixed-shape device arrays — the dense-array form JAX wants, and
exactly what `cloud_info` was approximating with its flat vectors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# Sentinel range for empty range-image pixels (reference uses FLT_MAX,
# imageProjection.cpp:152).  A finite value keeps arithmetic NaN-free.
INVALID_RANGE = 1.0e9

# Cluster label for invalid (outlier) segments, mirroring the reference's
# 999999 marker (imageProjection.cpp:457).
OUTLIER_LABEL = 999999


class RangeImage(NamedTuple):
    """Projected scan: all arrays are (n_scan, horizon_scan[, 3])."""

    xyz: jnp.ndarray          # (R, H, 3) point coordinates; 0 where invalid
    rng: jnp.ndarray          # (R, H) range; INVALID_RANGE where empty
    valid: jnp.ndarray        # (R, H) bool
    start_orientation: jnp.ndarray  # scalar, sweep azimuth window start
    end_orientation: jnp.ndarray    # scalar
    orientation_diff: jnp.ndarray   # scalar


class SegmentedScan(NamedTuple):
    """Per-ring compacted segmentation output.

    Valid entries occupy the prefix [0, count[r]) of each ring r; the tail is
    padding.  This replaces the reference's global 1-D segmented cloud +
    startRingIndex/endRingIndex bookkeeping (imageProjection.cpp:312-368): the
    ring structure the reference recovers via indices is explicit here.
    """

    xyz: jnp.ndarray          # (R, W, 3)
    rng: jnp.ndarray          # (R, W)
    col: jnp.ndarray          # (R, W) int32 original column index
    row_frac: jnp.ndarray     # (R, W) relative sweep time in [0, 1]
    ground: jnp.ndarray       # (R, W) bool
    valid: jnp.ndarray        # (R, W) bool
    count: jnp.ndarray        # (R,) int32
    outlier_xyz: jnp.ndarray  # (max_outlier, 3) sampled outlier cloud
    outlier_valid: jnp.ndarray  # (max_outlier,) bool


class FeatureCloud(NamedTuple):
    """One padded feature set: points + per-point ring id + sweep-time frac.

    `ground` carries the segmentation's ground label through to odometry:
    the class-consistent surf association (models/odometry._assoc_surf)
    needs it to keep ground queries from building planes out of wall-base
    points — a systematic z-bias the reference shares (its featureAssociation
    drops the label the ground filter computed, imageProjection.cpp:316-345;
    keeping it is the LeGO-natural fix).  None = label unavailable (gate
    disabled for that cloud)."""

    xyz: jnp.ndarray          # (N, 3)
    ring: jnp.ndarray         # (N,) int32
    s: jnp.ndarray            # (N,) float32 relative sweep time in [0, 1]
    valid: jnp.ndarray        # (N,) bool
    ground: jnp.ndarray | None = None  # (N,) bool, or None


class ScanFeatures(NamedTuple):
    """Front-end output per scan (featureAssociation.cpp:680-784 analog)."""

    sharp: FeatureCloud        # corner candidates for odometry
    less_sharp: FeatureCloud   # corner reference set for the next scan
    flat: FeatureCloud         # planar candidates for odometry (ground only)
    less_flat: FeatureCloud    # planar reference set for the next scan
    outlier: FeatureCloud      # sampled outliers (fed to mapping as surf)


def empty_feature_cloud(capacity: int) -> FeatureCloud:
    return FeatureCloud(
        xyz=jnp.zeros((capacity, 3), jnp.float32),
        ring=jnp.zeros((capacity,), jnp.int32),
        s=jnp.zeros((capacity,), jnp.float32),
        valid=jnp.zeros((capacity,), bool),
        ground=jnp.zeros((capacity,), bool),
    )
