"""Unit tests for the round-5 robustness gates:

  * odom_class_gate — class-consistent surf association
    (models/odometry._assoc_surf): ground queries must not build planes out
    of wall-base points (the corridor +z bias root cause,
    examples/diag_corridor2.py);
  * edge_prominence — corner curvature must clear a multiple of the
    per-ring median curvature (the range-noise floor), so sensor noise on
    smooth walls cannot saturate the per-sector corner quota;
  * utils/debug.dump_stages — the per-stage debug-cloud dump (the
    reference's rviz debugging workflow, imageProjection.cpp:480-506).
"""

import jax.numpy as jnp
import numpy as np

from lego_loam_tpu import config_for
from lego_loam_tpu.models import odometry as odo
from lego_loam_tpu.types import FeatureCloud
from lego_loam_tpu.utils.math3d import Pose

CFG = config_for("vlp16", deskew=False)


def _cloud(xyz, ring, ground):
    n = len(xyz)
    return FeatureCloud(
        xyz=jnp.asarray(xyz, jnp.float32),
        ring=jnp.asarray(ring, jnp.int32),
        s=jnp.ones((n,), jnp.float32),
        valid=jnp.ones((n,), bool),
        ground=jnp.asarray(ground, bool),
    )


def test_class_gate_rejects_cross_class_neighbors():
    """A ground query surrounded by a nearer wall point must pick the
    farther ground points when the gate is on, the wall point when off."""
    # query: ground point at origin-ish
    q = _cloud([[5.0, 0.0, -1.6]], [1], [True])
    # refs: two ground points on ring 1 + one ground on ring 2 (far), and a
    # NEARER wall-base point on ring 2
    ref = _cloud(
        [[5.1, 0.2, -1.6], [5.1, -0.2, -1.6],      # ring 1, ground
         [8.0, 0.0, -1.6],                          # ring 2, ground, far
         [5.2, 0.6, -1.0]],                         # ring 2, WALL, near
        [1, 1, 2, 2],
        [True, True, True, False])

    rel = Pose.identity()
    i1, i2, i3, ok = odo._assoc_surf(rel, q, ref, CFG)
    assert bool(ok[0])
    assert int(i3[0]) == 2, "gate on: adjacent-ring pick must be ground"

    cfg_off = CFG.replace(odom_class_gate=False)
    i1, i2, i3, ok = odo._assoc_surf(rel, q, ref, cfg_off)
    assert int(i3[0]) == 3, "gate off: nearest adjacent-ring pick is wall"


def test_class_gate_none_labels_disable_gate():
    q = FeatureCloud(
        xyz=jnp.asarray([[5.0, 0.0, -1.6]], jnp.float32),
        ring=jnp.asarray([1], jnp.int32), s=jnp.ones((1,), jnp.float32),
        valid=jnp.ones((1,), bool))          # ground=None
    ref = _cloud(
        [[5.1, 0.2, -1.6], [5.1, -0.2, -1.6], [5.2, 0.6, -1.0]],
        [1, 1, 2], [True, True, False])
    i1, i2, i3, ok = odo._assoc_surf(Pose.identity(), q, ref, CFG)
    assert int(i3[0]) == 2   # no labels -> plain nearest-in-adjacent-ring


def test_edge_prominence_suppresses_noise_corners():
    """Same scan +- range noise: without the prominence gate noise saturates
    the corner quota; with it the sharp count stays near the noise-free
    count.  (The corridor regime, examples/diag_corridor.py: n_sharp pegged
    at cap with sigma=2 cm.)"""
    from lego_loam_tpu.io import synthetic as syn
    from lego_loam_tpu.models.pipeline import frontend_step
    from lego_loam_tpu.models import odometry as od

    world = syn.corridor_world(length=300.0, pole_period=12.0,
                               end_caps=False)
    R0, t0 = np.eye(3), np.array([2.0, 0.0, 1.6])

    def n_sharp(cfg, noise):
        xyz, valid, ring = syn.raycast(world, R0, t0, cfg.sensor,
                                       noise=noise,
                                       rng=np.random.default_rng(0))
        ostate = od.init_state(cfg)
        _, feats, *_ = frontend_step(
            ostate, jnp.asarray(xyz, jnp.float32), jnp.asarray(valid),
            jnp.asarray(ring, jnp.int32), Pose.identity(), Pose.identity(),
            jnp.float32(0.0), cfg, cfg.sensor.use_ring)
        return int(jnp.sum(feats.sharp.valid))

    base = config_for("vlp16", deskew=False)
    n_clean = n_sharp(base, 0.0)
    n_gated = n_sharp(base, 0.02)
    n_ungated = n_sharp(base.replace(edge_prominence=0.0), 0.02)
    assert n_ungated > 1.5 * n_clean, (
        f"expected noise to inflate ungated corners: {n_ungated} vs "
        f"{n_clean} clean")
    assert n_gated < 0.6 * n_ungated, (
        f"prominence gate ineffective: {n_gated} vs ungated {n_ungated}")


def test_dump_stages_writes_all_clouds(tmp_path):
    from lego_loam_tpu.io import synthetic as syn
    from lego_loam_tpu.utils.debug import dump_stages

    cfg = config_for("vlp16", deskew=False)
    world = syn.default_world(seed=0)
    xyz, valid, ring = syn.raycast(world, np.eye(3),
                                   np.array([0.0, 0.0, 1.6]), cfg.sensor)
    counts = dump_stages(cfg, xyz, valid, ring, str(tmp_path))
    for stage in ("projected", "ground", "segmented", "outlier", "sharp",
                  "less_sharp", "flat", "less_flat"):
        assert (tmp_path / f"{stage}.pcd").exists(), stage
        assert counts[stage] >= 0
    assert counts["ground"] > 500
    assert counts["sharp"] > 0
    assert counts["projected"] >= counts["segmented"]
