"""Pipeline-level loop closure: detect, close, and correct on a revisit."""

import numpy as np

from lego_loam_tpu import config_for
from lego_loam_tpu.io import synthetic as syn
from lego_loam_tpu.models.pipeline import LegoLoamPipeline

CFG = config_for(
    "vlp16", deskew=False,
    max_keyframes=64, max_map_corner=2048, max_map_surf=8192,
    kf_corner_cap=256, kf_surf_cap=1024, kf_outlier_cap=256,
    max_scan_corner_ds=256, max_scan_surf_ds=1024, nn_query_tile=256,
    mapping_process_every=1, loop_closure_enabled=True,
    loop_min_time_gap=3.0, max_loop_edges=8,
    pg_gn_iters=4, keyframe_min_translation=0.25)


def test_out_and_back_loop_closure():
    world = syn.default_world(seed=6)
    ts = [np.array([0.45 * i, 0.0, 1.6]) for i in range(8)] + \
         [np.array([0.45 * (7 - i), 0.3, 1.6]) for i in range(8)]
    pipe = LegoLoamPipeline(CFG, loop_check_every=2)
    for k, t in enumerate(ts):
        xyz, valid, ring = syn.raycast(world, np.eye(3), t, CFG.sensor,
                                       noise=0.01,
                                       rng=np.random.default_rng(k))
        res = pipe.process_scan(xyz, valid, ring, t=0.55 * k)
    assert int(pipe.mstate.n_loops) >= 1, "no loop closure fired on revisit"
    # final pose: the revisit position relative to scan 0
    final = np.asarray(res.fused_pose.t)
    true_final = ts[-1] - np.array([0.0, 0.0, 1.6])
    assert np.linalg.norm(final - true_final) < 0.12, (final, true_final)


def test_kitti_pose_export(tmp_path):
    from lego_loam_tpu.io.kitti import write_poses_kitti

    rng = np.random.default_rng(0)
    Rs = np.tile(np.eye(3), (5, 1, 1))
    ts = rng.normal(size=(5, 3))
    p = str(tmp_path / "poses.txt")
    write_poses_kitti(p, Rs, ts)
    rows = np.loadtxt(p).reshape(-1, 3, 4)
    np.testing.assert_allclose(rows[:, :, :3], Rs, atol=1e-7)
    np.testing.assert_allclose(rows[:, :, 3], ts, atol=1e-7)
