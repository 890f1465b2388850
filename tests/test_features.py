"""Feature extraction + voxel filter vs NumPy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lego_loam_tpu import config_for
from lego_loam_tpu.io import synthetic as syn
from lego_loam_tpu.ops.compaction import segment_scan
from lego_loam_tpu.ops.features import (
    compute_curvature,
    extract_features,
    label_features,
    occlusion_mask,
)
from lego_loam_tpu.ops.projection import project_scan
from lego_loam_tpu.ops.voxel import voxel_downsample

from tests import oracle_features as ofeat

# the oracle mirrors the reference's sequential sector ordering and its
# absolute edge threshold (no prominence gate)
CFG = config_for("vlp16", sector_parallel=False, edge_prominence=0.0)


@pytest.fixture(scope="module")
def packed():
    world = syn.default_world(seed=5)
    xyz, valid, ring = syn.raycast(
        world, np.eye(3), np.array([1.0, -2.0, 1.6]), CFG.sensor, noise=0.01
    )
    img = project_scan(jnp.asarray(xyz), jnp.asarray(valid), CFG, jnp.asarray(ring))
    packed, o_rel, ground, seg = segment_scan(img, CFG)
    return packed, o_rel


def test_voxel_downsample_oracle():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-4, 4, size=(500, 3)).astype(np.float32)
    valid = rng.uniform(size=500) < 0.9
    leaf = 0.5
    out, ok = voxel_downsample(jnp.asarray(pts), jnp.asarray(valid), leaf, 512)
    got = {tuple(np.round(p, 4)) for p in np.asarray(out)[np.asarray(ok)]}

    keys = np.floor(pts[valid] / leaf).astype(int)
    cents = {}
    for k, p in zip(map(tuple, keys), pts[valid]):
        cents.setdefault(k, []).append(p)
    want = {tuple(np.round(np.mean(v, axis=0), 4)) for v in cents.values()}
    assert len(got) == len(want)
    # match with tolerance
    wa = np.array(sorted(want))
    ga = np.array(sorted(got))
    np.testing.assert_allclose(ga, wa, atol=1e-3)


def test_voxel_downsample_cap_and_empty():
    pts = jnp.zeros((64, 3), jnp.float32)
    out, ok = voxel_downsample(pts, jnp.zeros((64,), bool), 0.2, 16)
    assert not bool(jnp.any(ok))
    # all points in one voxel -> single centroid
    pts = jnp.ones((64, 3), jnp.float32) * 0.05
    out, ok = voxel_downsample(pts, jnp.ones((64,), bool), 0.2, 16)
    assert int(jnp.sum(ok)) == 1
    np.testing.assert_allclose(out[0], 0.05, atol=1e-6)


def test_curvature_oracle(packed):
    packed, _ = packed
    curv, cvalid = compute_curvature(packed, CFG)
    ocurv, ocvalid = ofeat.oracle_curvature(
        np.asarray(packed.rng), np.asarray(packed.valid), np.asarray(packed.count))
    np.testing.assert_array_equal(np.asarray(cvalid), ocvalid)
    m = ocvalid
    np.testing.assert_allclose(np.asarray(curv)[m], ocurv[m], rtol=1e-4, atol=1e-4)


def test_occlusion_oracle(packed):
    packed, _ = packed
    got = np.asarray(occlusion_mask(packed, CFG))
    want = ofeat.oracle_occlusion(
        np.asarray(packed.rng), np.asarray(packed.col), np.asarray(packed.count), CFG)
    np.testing.assert_array_equal(got, want)


def test_labels_match_oracle(packed):
    packed, _ = packed
    labels, picked = label_features(packed, CFG)
    olabels, ocurv, ocvalid, opicked = ofeat.oracle_extract(
        np.asarray(packed.rng), np.asarray(packed.col), np.asarray(packed.ground),
        np.asarray(packed.valid), np.asarray(packed.count), CFG)
    labels = np.asarray(labels)
    diff = labels != olabels
    # borderline curvature ties could differ; demand exact match here
    assert diff.sum() == 0, f"{diff.sum()} label mismatches at {np.argwhere(diff)[:5]}"
    assert (labels == 2).sum() > 20      # some sharp corners exist
    assert (labels == -1).sum() > 50     # some flat ground points exist


def test_extract_features_shapes(packed):
    packed, o_rel = packed
    feats = extract_features(packed, o_rel, CFG)
    assert feats.sharp.xyz.shape == (CFG.max_sharp, 3)
    assert feats.less_sharp.xyz.shape == (CFG.max_less_sharp, 3)
    assert feats.flat.xyz.shape == (CFG.max_flat, 3)
    assert feats.less_flat.xyz.shape[0] == (CFG.max_less_flat // CFG.sensor.n_scan) * CFG.sensor.n_scan
    n_sharp = int(jnp.sum(feats.sharp.valid))
    n_flat = int(jnp.sum(feats.flat.valid))
    n_lf = int(jnp.sum(feats.less_flat.valid))
    assert 10 < n_sharp <= 2 * 6 * CFG.sensor.n_scan
    assert 50 < n_flat <= 4 * 6 * CFG.sensor.n_scan
    assert n_lf > 500
    # ring ids consistent: all sharp points carry the ring their pixels came from
    assert int(jnp.max(feats.sharp.ring)) < CFG.sensor.n_scan
    assert float(jnp.max(feats.sharp.s)) <= 1.0
