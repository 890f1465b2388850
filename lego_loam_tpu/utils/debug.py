"""Per-stage debug cloud dumps — the reference's rviz debugging workflow.

The reference publishes on-demand debug clouds from every stage (ground /
segmented / outlier clouds from imageProjection.cpp:480-506, sharp / flat /
less-* feature clouds from featureAssociation.cpp:790-816, history / corrected
submaps from mapOptmization.cpp:863-869) and its README's debugging story is
"look at them in rviz".  Here every stage hand-off is already an inspectable
pytree; this module adds the missing convenience: run one scan through the
front-end stages and dump each intermediate as a PCD (+ a summary dict), so
"what did segmentation do to frame k" is one call.

Usage:
    from lego_loam_tpu.utils.debug import dump_stages
    info = dump_stages(cfg, xyz, valid, ring, "/tmp/frame42")
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from lego_loam_tpu.config import PipelineConfig
from lego_loam_tpu.io.pcd import save_pcd
from lego_loam_tpu.ops.compaction import segment_scan
from lego_loam_tpu.ops.features import extract_features
from lego_loam_tpu.ops.projection import project_scan


def dump_stages(cfg: PipelineConfig, xyz, valid, ring=None,
                out_dir: str = ".", prefix: str = "") -> dict:
    """Run projection -> segmentation -> features on ONE scan and write each
    stage's cloud as `<out_dir>/<prefix><stage>.pcd`.

    Returns {stage: point_count} for quick console triage.  Clouds are in
    the sensor frame, exactly what the reference's debug publishers emit
    (full_cloud_projected, ground_cloud, segmented_cloud, outlier_cloud,
    sharp/less_sharp/flat/less_flat)."""
    os.makedirs(out_dir, exist_ok=True)
    xyz = jnp.asarray(xyz, jnp.float32)
    valid = jnp.asarray(valid)
    ring = (jnp.asarray(ring, jnp.int32) if ring is not None
            and cfg.sensor.use_ring else None)

    img = project_scan(xyz, valid, cfg, ring)
    packed, o_rel, ground, seg = segment_scan(img, cfg)
    feats = extract_features(packed, o_rel, cfg)

    counts = {}

    def dump(name, pts, mask):
        pts = np.asarray(pts, np.float32).reshape(-1, 3)
        mask = np.asarray(mask).reshape(-1)
        pts = pts[mask]
        save_pcd(os.path.join(out_dir, f"{prefix}{name}.pcd"), pts)
        counts[name] = int(pts.shape[0])

    dump("projected", img.xyz, img.valid)
    dump("ground", img.xyz, np.asarray(img.valid) & np.asarray(ground))
    dump("segmented", packed.xyz, packed.valid)
    dump("segmented_nonground", packed.xyz,
         np.asarray(packed.valid) & ~np.asarray(packed.ground))
    dump("outlier", packed.outlier_xyz, packed.outlier_valid)
    for name in ("sharp", "less_sharp", "flat", "less_flat"):
        fc = getattr(feats, name)
        dump(name, fc.xyz, fc.valid)
    return counts


def dump_keyframe(pipeline, k: int, out_dir: str = ".") -> dict:
    """Write keyframe k's stored corner/surf/outlier blocks (map frame) —
    the reference's history-submap debug publisher analog
    (mapOptmization.cpp:863-869)."""
    os.makedirs(out_dir, exist_ok=True)
    st = pipeline.mstate
    R = np.asarray(st.kf_R[k])
    t = np.asarray(st.kf_t[k])
    counts = {}
    for name, pts, val in (
            ("kf_corner", st.kf_corner[k], st.kf_corner_valid[k]),
            ("kf_surf", st.kf_surf[k], st.kf_surf_valid[k]),
            ("kf_outlier", st.kf_outlier[k], st.kf_outlier_valid[k])):
        p = np.asarray(pts)[np.asarray(val)] @ R.T + t
        save_pcd(os.path.join(out_dir, f"{name}_{k}.pcd"),
                 p.astype(np.float32))
        counts[name] = int(p.shape[0])
    return counts
