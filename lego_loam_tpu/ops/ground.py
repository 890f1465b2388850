"""Ground extraction: vertical-stencil test on the range image.

Vectorized equivalent of the reference's double loop over the lowest
ground_scan_ind rows (reference: imageProjection.cpp:260-310): the angle of
the segment between vertically adjacent pixels against the horizontal plane
decides ground membership; both endpoints are marked.
"""

from __future__ import annotations

import jax.numpy as jnp

from lego_loam_tpu.config import PipelineConfig
from lego_loam_tpu.types import RangeImage


def mark_ground(img: RangeImage, cfg: PipelineConfig) -> jnp.ndarray:
    """Returns (n_scan, horizon_scan) bool ground mask."""
    g = cfg.sensor.ground_scan_ind
    lower = img.xyz[:g]          # rows 0..g-1
    upper = img.xyz[1 : g + 1]   # rows 1..g
    both_valid = img.valid[:g] & img.valid[1 : g + 1]

    d = upper - lower
    angle_deg = jnp.degrees(
        jnp.arctan2(d[..., 2], jnp.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2))
    )
    is_flat = (
        jnp.abs(angle_deg - cfg.sensor.mount_angle)
        <= cfg.ground_angle_thresh_deg
    ) & both_valid

    ground = jnp.zeros(img.valid.shape, bool)
    ground = ground.at[:g].set(is_flat)
    ground = ground.at[1 : g + 1].set(ground[1 : g + 1] | is_flat)
    return ground & img.valid
