"""Parity: Pallas single-launch pick kernel vs the XLA sector-parallel loop.

Both paths must produce identical label grids and picked masks on real
front-end data (the kernel implements the same algorithm step for step; see
ops/features_pallas.py).  Runs in interpret mode on CPU via monkeypatching
the kernel entry with interpret=True.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lego_loam_tpu import config_for
from lego_loam_tpu.io import synthetic as syn
from lego_loam_tpu.ops import features_pallas
from lego_loam_tpu.ops.compaction import segment_scan
from lego_loam_tpu.ops.features import label_features
from lego_loam_tpu.ops.projection import project_scan

CFG_XLA = config_for("vlp16", sector_parallel=True, feature_backend="xla")
CFG_PAL = config_for("vlp16", sector_parallel=True, feature_backend="pallas")


@pytest.fixture(scope="module")
def packed():
    world = syn.default_world(seed=5)
    xyz, valid, ring = syn.raycast(
        world, np.eye(3), np.array([1.0, -2.0, 1.6]), CFG_XLA.sensor,
        noise=0.01)
    img = project_scan(jnp.asarray(xyz), jnp.asarray(valid), CFG_XLA,
                       jnp.asarray(ring))
    packed, o_rel, ground, seg = segment_scan(img, CFG_XLA)
    return packed


def test_pick_kernel_matches_xla(packed, monkeypatch):
    from functools import partial

    monkeypatch.setattr(
        features_pallas, "pick_features_pallas",
        partial(features_pallas.pick_features_pallas.__wrapped__,
                interpret=True))

    lab_x, pick_x = label_features(packed, CFG_XLA)
    lab_p, pick_p = label_features(packed, CFG_PAL)
    lab_x, pick_x, lab_p, pick_p = map(
        np.asarray, (lab_x, pick_x, lab_p, pick_p))

    n_sharp = int((lab_x == 2).sum())
    n_flat = int((lab_x == -1).sum())
    assert n_sharp > 0 and n_flat > 0, "fixture produced no features"
    np.testing.assert_array_equal(lab_p, lab_x)
    np.testing.assert_array_equal(pick_p, pick_x)


def test_pick_kernel_empty_scan(monkeypatch):
    from functools import partial

    monkeypatch.setattr(
        features_pallas, "pick_features_pallas",
        partial(features_pallas.pick_features_pallas.__wrapped__,
                interpret=True))

    from lego_loam_tpu.types import SegmentedScan

    R = CFG_PAL.sensor.n_scan
    W = CFG_PAL.sensor.horizon_scan
    empty = SegmentedScan(
        xyz=jnp.zeros((R, W, 3), jnp.float32),
        rng=jnp.zeros((R, W), jnp.float32),
        col=jnp.zeros((R, W), jnp.int32),
        row_frac=jnp.zeros((R, W), jnp.float32),
        ground=jnp.zeros((R, W), bool),
        valid=jnp.zeros((R, W), bool),
        count=jnp.zeros((R,), jnp.int32),
        outlier_xyz=jnp.zeros((CFG_PAL.max_outlier, 3), jnp.float32),
        outlier_valid=jnp.zeros((CFG_PAL.max_outlier,), bool),
    )
    lab, pick = label_features(empty, CFG_PAL)
    assert not np.asarray(lab).any()
