"""End-to-end pipeline driver + exports."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from lego_loam_tpu import config_for
from lego_loam_tpu.io import synthetic as syn
from lego_loam_tpu.io.pcd import export_maps, load_pcd, save_pcd
from lego_loam_tpu.models.pipeline import LegoLoamPipeline

CFG = config_for(
    "vlp16", deskew=False,
    max_keyframes=64, max_map_corner=2048, max_map_surf=8192,
    kf_corner_cap=512, kf_surf_cap=2048, kf_outlier_cap=512,
    max_scan_corner_ds=512, max_scan_surf_ds=2048, nn_query_tile=256,
    mapping_process_every=2,
)


def test_pcd_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    p = str(tmp_path / "x.pcd")
    save_pcd(p, pts)
    np.testing.assert_allclose(load_pcd(p), pts, atol=0)
    save_pcd(p, pts, binary=False)
    np.testing.assert_allclose(load_pcd(p), pts, atol=1e-5)


def test_pipeline_end_to_end(tmp_path):
    world = syn.default_world(seed=4)
    poses = syn.circle_trajectory(12, radius=8.0, arc=0.35 * np.pi)
    pipe = LegoLoamPipeline(CFG)

    R0, t0 = poses[0]
    errs = []
    for k, (R, t) in enumerate(poses):
        xyz, valid, ring = syn.raycast(world, R, t, CFG.sensor, noise=0.01,
                                       rng=np.random.default_rng(k))
        res = pipe.process_scan(xyz, valid, ring)
        tw = R0 @ np.asarray(res.fused_pose.t) + t0
        errs.append(np.linalg.norm(tw - t))
        assert res.stats["n_sharp"] > 10

    assert np.sqrt(np.mean(np.square(errs))) < 0.15
    assert int(pipe.mstate.n_kf) >= 5
    assert len(pipe.trajectory) == 12

    written = export_maps(pipe, str(tmp_path))
    assert written[str(tmp_path / "trajectory.pcd")] == int(pipe.mstate.n_kf)
    surf = load_pcd(str(tmp_path / "surfaceMap.pcd"))
    assert surf.shape[0] > 1000
    # ground plane must be at z ~ -1.6 (sensor height) in the map frame
    ground = surf[np.abs(surf[:, 2] + 1.6) < 0.2]
    assert ground.shape[0] > 0.3 * surf.shape[0]
