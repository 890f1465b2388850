"""Checkpoint/resume: state roundtrip + continued operation."""

import numpy as np
import pytest

from lego_loam_tpu import config_for
from lego_loam_tpu.io import synthetic as syn
from lego_loam_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from lego_loam_tpu.models.pipeline import LegoLoamPipeline

CFG = config_for(
    "vlp16", deskew=False,
    max_keyframes=64, max_map_corner=2048, max_map_surf=8192,
    kf_corner_cap=256, kf_surf_cap=1024, kf_outlier_cap=256,
    max_scan_corner_ds=256, max_scan_surf_ds=1024, nn_query_tile=256)


def test_checkpoint_resume(tmp_path):
    world = syn.default_world(seed=5)
    poses = syn.circle_trajectory(8, radius=8.0, arc=0.25 * np.pi)

    def scan(k):
        R, t = poses[k]
        return syn.raycast(world, R, t, CFG.sensor, noise=0.01,
                           rng=np.random.default_rng(k))

    # run A: 4 scans, checkpoint, 4 more
    a = LegoLoamPipeline(CFG)
    for k in range(4):
        a.process_scan(*scan(k), t=0.1 * k)
    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(a, ckpt)
    for k in range(4, 8):
        ra = a.process_scan(*scan(k), t=0.1 * k)

    # run B: resume from checkpoint, same 4 scans
    b = LegoLoamPipeline(CFG)
    load_checkpoint(b, ckpt)
    assert b.frame == 4
    for k in range(4, 8):
        rb = b.process_scan(*scan(k), t=0.1 * k)

    np.testing.assert_allclose(
        np.asarray(ra.fused_pose.t), np.asarray(rb.fused_pose.t), atol=1e-5)
    assert int(a.mstate.n_kf) == int(b.mstate.n_kf)


def test_checkpoint_config_mismatch(tmp_path):
    a = LegoLoamPipeline(CFG)
    ckpt = str(tmp_path / "s.npz")
    save_checkpoint(a, ckpt)
    other = LegoLoamPipeline(CFG.replace(max_keyframes=32))
    with pytest.raises(ValueError):
        load_checkpoint(other, ckpt)
