"""Range-image projection: unordered points -> (n_scan, horizon_scan) grid.

TPU-native equivalent of the reference's per-point scatter loop
(reference: imageProjection.cpp:199-257).  Differences by design:

  * fixed-shape: input is a padded (P, 3) array with a validity mask;
  * deterministic scatter: where several points land in one pixel, the
    *nearest* wins (the reference keeps whichever the loop writes last);
  * per-pixel relative sweep time is computed here from azimuth instead of
    being recovered downstream via the reference's intensity-packing hack
    (imageProjection.cpp:250, featureAssociation.cpp:504-523).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lego_loam_tpu.config import PipelineConfig
from lego_loam_tpu.types import INVALID_RANGE, RangeImage

_TWO_PI = 2.0 * jnp.pi


def project_scan(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: PipelineConfig,
    ring: jnp.ndarray | None = None,
) -> RangeImage:
    """Project a padded point list into the range image.

    Args:
      xyz: (P, 3) float32 points in the lidar frame (x fwd, y left, z up).
      valid: (P,) bool input mask (padding / NaN points already excluded).
      cfg: pipeline config (static under jit).
      ring: optional (P,) int32 ring index; required if cfg.sensor.use_ring.

    Returns:
      RangeImage with (n_scan, horizon_scan) grids.
    """
    s = cfg.sensor
    R, H = s.n_scan, s.horizon_scan
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]

    rng = jnp.sqrt(x * x + y * y + z * z)

    if s.use_ring:
        if ring is None:
            raise ValueError(f"sensor {s.name} expects a ring channel")
        row = ring.astype(jnp.int32)
    else:
        vert_deg = jnp.degrees(jnp.arctan2(z, jnp.sqrt(x * x + y * y)))
        row = jnp.floor((vert_deg + s.ang_bottom) / s.ang_res_y).astype(jnp.int32)

    # Column from azimuth, matching the reference's mapping
    # (imageProjection.cpp:235-242): col = -round((atan2(x,y)*deg - 90)/res) + H/2.
    horizon_deg = jnp.degrees(jnp.arctan2(x, y))
    col = (-jnp.round((horizon_deg - 90.0) / s.ang_res_x)).astype(jnp.int32) + H // 2
    col = jnp.where(col >= H, col - H, col)

    ok = (
        valid
        & (row >= 0) & (row < R)
        & (col >= 0) & (col < H)
        & (rng >= s.min_range) & (rng <= s.max_range)
    )

    flat = jnp.where(ok, row * H + col, R * H)  # invalid points -> dropped slot

    # Nearest-point-wins via sort instead of scatter: random-index scatters
    # and gathers cost ~0.25 ms each at this size on TPU while a multi-
    # operand sort of the same data is ~0.1 ms.  Sort points by (cell,
    # range); the first entry of each cell run is the winner; a second
    # single-key sort compacts the winners to the front in ascending cell
    # order so the final scatter has sorted unique indices (the fast path).
    rng_k = jnp.where(ok, rng, INVALID_RANGE)
    s1 = jax.lax.sort(
        (flat, rng_k, xyz[:, 0], xyz[:, 1], xyz[:, 2]),
        dimension=0, num_keys=2)
    cell, rng_s = s1[0], s1[1]
    P = xyz.shape[0]
    lead = jnp.concatenate(
        [jnp.ones((1,), bool), cell[1:] != cell[:-1]]) & (cell < R * H)
    # losers dump to unique slots beyond the grid so the scatter indices
    # stay strictly unique AND ascending (both fast-path preconditions)
    pos = jnp.arange(P, dtype=jnp.int32)
    wkey = jnp.where(lead, cell, R * H + pos)
    s2 = jax.lax.sort((wkey,) + s1[1:], dimension=0, num_keys=1)
    wcell, wrng = s2[0], s2[1]
    wxyz = jnp.stack(s2[2:5], axis=1)
    win = wcell < R * H

    rng_grid = jnp.full((R * H + P,), INVALID_RANGE, jnp.float32)
    rng_grid = rng_grid.at[wcell].set(
        jnp.where(win, wrng, INVALID_RANGE),
        indices_are_sorted=True, unique_indices=True)
    xyz_grid = jnp.zeros((R * H + P, 3), jnp.float32)
    xyz_grid = xyz_grid.at[wcell].set(
        jnp.where(win[:, None], wxyz, 0.0),
        indices_are_sorted=True, unique_indices=True)
    rng_grid = rng_grid[: R * H].reshape(R, H)
    xyz_grid = xyz_grid[: R * H].reshape(R, H, 3)
    valid_grid = rng_grid < INVALID_RANGE

    # Sweep azimuth window from the first/last valid raw points
    # (imageProjection.cpp:199-209).
    first = jnp.argmax(valid)
    last = P - 1 - jnp.argmax(valid[::-1])
    start_ori = -jnp.arctan2(y[first], x[first])
    end_ori = -jnp.arctan2(y[last], x[last]) + _TWO_PI
    diff0 = end_ori - start_ori
    end_ori = jnp.where(diff0 > 3.0 * jnp.pi, end_ori - _TWO_PI,
                        jnp.where(diff0 < jnp.pi, end_ori + _TWO_PI, end_ori))
    ori_diff = end_ori - start_ori

    return RangeImage(
        xyz=xyz_grid,
        rng=rng_grid,
        valid=valid_grid,
        start_orientation=start_ori,
        end_orientation=end_ori,
        orientation_diff=ori_diff,
    )


def pixel_rel_time(img: RangeImage) -> jnp.ndarray:
    """Relative sweep time in [0, 1] per pixel, from pixel azimuth.

    Vectorized stand-in for the reference's sequential half-pass unwrapping
    (featureAssociation.cpp:504-523): rel = ((ori - start) mod 2pi) / diff.
    Differs from the reference only for the handful of pixels at the sweep
    seam when the sweep covers more/less than a full turn.
    """
    x = img.xyz[..., 0]
    y = img.xyz[..., 1]
    ori = -jnp.arctan2(y, x)
    rel = jnp.mod(ori - img.start_orientation, _TWO_PI) / jnp.maximum(
        img.orientation_diff, 1e-3
    )
    return jnp.clip(rel, 0.0, 1.0)
