"""Front-end kernels vs the NumPy oracle of the reference semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from lego_loam_tpu import config_for
from lego_loam_tpu.io import synthetic as syn
from lego_loam_tpu.ops.compaction import compact_segments, segment_scan
from lego_loam_tpu.ops.ground import mark_ground
from lego_loam_tpu.ops.projection import project_scan
from lego_loam_tpu.ops.segmentation import label_components

from tests import oracle_frontend as oracle

CFG = config_for("vlp16")


@pytest.fixture(scope="module")
def scan():
    world = syn.default_world(seed=3)
    R = np.eye(3)
    t = np.array([0.0, 0.0, 1.6])
    xyz, valid, ring = syn.raycast(world, R, t, CFG.sensor, noise=0.0)
    return xyz, valid, ring


@pytest.fixture(scope="module")
def img(scan):
    xyz, valid, ring = scan
    return project_scan(jnp.asarray(xyz), jnp.asarray(valid), CFG, jnp.asarray(ring))


def test_projection_matches_oracle(scan, img):
    xyz, valid, ring = scan
    oxyz, orng, ovalid = oracle.oracle_project(xyz, valid, ring, CFG)
    np.testing.assert_array_equal(np.asarray(img.valid), ovalid)
    np.testing.assert_allclose(
        np.asarray(img.rng)[ovalid], orng[ovalid], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(img.xyz)[ovalid], oxyz[ovalid], rtol=1e-6)
    # synthetic rays land exactly on their generating (row, col)
    assert np.asarray(img.valid).sum() > 10000


def test_projection_grid_alignment(scan, img):
    # each ray was generated for a specific (row, col); check a sample
    xyz, valid, ring = scan
    H = CFG.sensor.horizon_scan
    v = np.asarray(img.valid)
    rngs = np.asarray(img.rng)
    xyzg = np.asarray(img.xyz)
    for i in [17, 1234, 20000, 25555]:
        if not valid[i]:
            continue
        r, c = i // H, i % H
        assert v[r, c]
        assert rngs[r, c] <= np.linalg.norm(xyz[i]) + 1e-5


def test_ground_matches_oracle(img):
    g = np.asarray(mark_ground(img, CFG))
    og = oracle.oracle_ground(np.asarray(img.xyz), np.asarray(img.valid), CFG)
    np.testing.assert_array_equal(g, og)
    assert og.sum() > 1000  # plenty of ground in the courtyard


def test_edge_predicate_matches_float64(img):
    from lego_loam_tpu.ops.segmentation import build_edges

    ground = mark_ground(img, CFG)
    segm, eh, ev = build_edges(img, ground, CFG)
    oseg, oeh, oev, ang_h, ang_v = oracle.oracle_edges(
        np.asarray(img.rng), np.asarray(img.valid), np.asarray(ground), CFG)
    np.testing.assert_array_equal(np.asarray(segm), oseg)
    # device (f32) and oracle (f64) may only disagree within fp noise of the
    # 60-degree threshold
    tol = 1e-4
    mism_h = np.asarray(eh) != oeh
    mism_v = np.asarray(ev) != oev
    assert np.all(np.abs(ang_h[mism_h] - CFG.segment_theta) < tol)
    assert np.all(np.abs(ang_v[mism_v] - CFG.segment_theta) < tol)
    assert mism_h.mean() < 1e-3 and mism_v.mean() < 1e-3


def test_segmentation_matches_oracle(img):
    from lego_loam_tpu.ops.segmentation import build_edges

    ground = mark_ground(img, CFG)
    edges = build_edges(img, ground, CFG)
    seg = label_components(img, ground, CFG, edges=edges)
    labels = np.asarray(seg.labels)
    good = np.asarray(seg.cluster_good)
    out = np.asarray(seg.outlier)

    olabels, ogood, oout = oracle.oracle_segment(
        np.asarray(edges[0]), np.asarray(edges[1]), np.asarray(edges[2]), CFG)

    np.testing.assert_array_equal(good, ogood)
    np.testing.assert_array_equal(out, oout)

    # partitions agree: oracle component -> set of device roots must be 1:1
    segmask = labels >= 0
    np.testing.assert_array_equal(segmask, olabels >= 0)
    pairs = set(zip(olabels[segmask].tolist(), labels[segmask].tolist()))
    assert len(pairs) == len({a for a, _ in pairs})
    assert len(pairs) == len({b for _, b in pairs})
    assert good.sum() > 3000


def test_compaction_matches_oracle(img):
    ground = mark_ground(img, CFG)
    seg = label_components(img, ground, CFG)
    packed, o_rel = compact_segments(img, ground, seg, CFG)

    rings, outliers = oracle.oracle_compact(
        np.asarray(img.rng), np.asarray(ground),
        np.asarray(seg.cluster_good), np.asarray(seg.outlier), CFG)

    counts = np.asarray(packed.count)
    cols = np.asarray(packed.col)
    rngs = np.asarray(packed.rng)
    gflags = np.asarray(packed.ground)
    vmask = np.asarray(packed.valid)
    for r, kept in enumerate(rings):
        assert counts[r] == len(kept), f"ring {r}"
        assert vmask[r].sum() == len(kept)
        for k, (j, rr, gf) in enumerate(kept):
            assert cols[r, k] == j
            assert gflags[r, k] == gf
            np.testing.assert_allclose(rngs[r, k], rr, rtol=1e-6)

    H = CFG.sensor.horizon_scan
    got = set()
    ov = np.asarray(packed.outlier_valid)
    oxyz = np.asarray(packed.outlier_xyz)
    xyzg = np.asarray(img.xyz)
    for k in range(ov.shape[0]):
        if not ov[k]:
            continue
        # recover (row, col) by matching coordinates
        d = np.linalg.norm(xyzg.reshape(-1, 3) - oxyz[k], axis=1)
        i = int(np.argmin(d))
        assert d[i] < 1e-5
        got.add((i // H, i % H))
    assert got == outliers


def test_segment_scan_jits(img):
    import jax

    f = jax.jit(lambda im: segment_scan(im, CFG))
    packed, o_rel, ground, seg = f(img)
    assert packed.xyz.shape == (CFG.sensor.n_scan, CFG.sensor.horizon_scan, 3)
    assert np.asarray(packed.count).sum() > 3000


def test_pallas_segmentation_matches_xla(img):
    """The Pallas label-propagation kernel (interpret mode on CPU) must give
    bit-identical labels to the XLA scan path."""
    import jax.numpy as jnp

    from lego_loam_tpu.ops.segmentation import build_edges
    from lego_loam_tpu.ops.segmentation_pallas import propagate_labels_pallas

    ground = mark_ground(img, CFG)
    edges = build_edges(img, ground, CFG)
    seg_xla = label_components(img, ground, CFG, edges=edges)

    seg, edge_h, edge_v = edges
    R, H = seg.shape
    big = jnp.int32(R * H)
    labels0 = jnp.where(seg, jnp.arange(R * H, dtype=jnp.int32).reshape(R, H), big)
    conn_left = jnp.roll(edge_h, 1, axis=1)
    conn_up = jnp.concatenate([jnp.zeros((1, H), bool), edge_v[:-1]], axis=0)
    lab = propagate_labels_pallas(labels0, conn_left, edge_h, conn_up, edge_v,
                                  CFG.label_prop_max_sweeps, interpret=True)
    lab = jnp.where(seg, lab, -1)
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(seg_xla.labels))


def test_segstats_matmul_matches_scatter(img):
    """The MXU one-hot cluster-stats path must reproduce the scatter
    reductions exactly (same validity per pixel)."""
    ground = mark_ground(img, CFG)
    seg_sc = label_components(img, ground, CFG.replace(
        segstats_backend="scatter"))
    seg_mm = label_components(img, ground, CFG.replace(
        segstats_backend="matmul"))
    np.testing.assert_array_equal(
        np.asarray(seg_sc.cluster_good), np.asarray(seg_mm.cluster_good))
    np.testing.assert_array_equal(
        np.asarray(seg_sc.outlier), np.asarray(seg_mm.outlier))

    # overflow behavior: with a tiny cluster cap, overflowed components all
    # become outliers (never silently "good")
    seg_tiny = label_components(img, ground, CFG.replace(
        segstats_backend="matmul", max_clusters=2))
    good_tiny = np.asarray(seg_tiny.cluster_good)
    assert good_tiny.sum() <= np.asarray(seg_sc.cluster_good).sum()
    assert np.array_equal(
        good_tiny | np.asarray(seg_tiny.outlier),
        np.asarray(seg_sc.cluster_good) | np.asarray(seg_sc.outlier))
