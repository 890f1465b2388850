"""HDL-64E (KITTI-style) pipeline: elevation-math rows, no ring channel."""

import numpy as np

from lego_loam_tpu import config_for
from lego_loam_tpu.io import synthetic as syn
from lego_loam_tpu.io.kitti import pad_scan
from lego_loam_tpu.models.pipeline import LegoLoamPipeline

CFG = config_for(
    "hdl64e", deskew=False,
    max_keyframes=32, max_map_corner=2048, max_map_surf=8192,
    kf_corner_cap=256, kf_surf_cap=1024, kf_outlier_cap=256,
    max_scan_corner_ds=256, max_scan_surf_ds=1024, nn_query_tile=256,
    max_less_flat=8192, max_less_sharp=4096, max_sharp=1024, max_flat=2048,
    max_outlier=4096,
)


def test_hdl64e_pipeline():
    world = syn.default_world(seed=9)
    poses = syn.circle_trajectory(6, radius=8.0, arc=0.12 * np.pi)
    pipe = LegoLoamPipeline(CFG)

    R0, t0 = poses[0]
    errs = []
    for k, (R, t) in enumerate(poses):
        xyz, valid, ring = syn.raycast(world, R, t, CFG.sensor, noise=0.02,
                                       rng=np.random.default_rng(k))
        # go through the KITTI ingest path: raw (N,4) -> padded, no ring
        raw = np.concatenate(
            [xyz[valid], np.zeros((valid.sum(), 1), np.float32)], axis=1)
        xyz_p, valid_p = pad_scan(raw, CFG)
        res = pipe.process_scan(xyz_p, valid_p, None, t=0.1 * k)
        tw = R0 @ np.asarray(res.fused_pose.t) + t0
        errs.append(np.linalg.norm(tw - t))
        assert res.stats["n_sharp"] > 20
    assert np.sqrt(np.mean(np.square(errs))) < 0.2, errs
