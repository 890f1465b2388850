"""Checkpoint / resume of the full SLAM state.

The reference has no resume path at all — only a shutdown-time PCD dump
(SURVEY.md §5; reference: mapOptmization.cpp:724-755).  Here the whole SLAM
state (odometry references, keyframe pool, pose graph, IMU buffer) is one
pytree of arrays, so checkpointing is a flat npz archive and resume is a
reshape-free load.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(pipeline):
    from lego_loam_tpu.models.pipeline import LegoLoamPipeline  # noqa

    tree = {
        "ostate": pipeline.ostate,
        "mstate": pipeline.mstate,
        "imu_buf": pipeline.imu_host.state(),
    }
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_checkpoint(pipeline, path: str) -> None:
    leaves, _ = _flatten(pipeline)
    meta = {
        "frame": pipeline.frame,
        "imu_used": pipeline.imu_used,
        "n_leaves": len(leaves),
        "version": 1,
    }
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["trajectory"] = (
        np.stack(pipeline.trajectory) if pipeline.trajectory
        else np.zeros((0, 3), np.float32))
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_checkpoint(pipeline, path: str) -> None:
    """Restore state in place.  The pipeline must be built with the same
    PipelineConfig (shapes must match)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    meta = json.loads(bytes(data["meta_json"]).decode())
    leaves, treedef = _flatten(pipeline)
    if meta["n_leaves"] != len(leaves):
        raise ValueError(
            f"checkpoint has {meta['n_leaves']} leaves, pipeline expects "
            f"{len(leaves)} — config mismatch?")
    new_leaves = []
    for i, ref in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if arr.shape != ref.shape:
            raise ValueError(
                f"leaf {i}: checkpoint shape {arr.shape} != {ref.shape}")
        new_leaves.append(jnp.asarray(arr, ref.dtype))
    tree = jax.tree_util.tree_unflatten(treedef, new_leaves)
    pipeline.ostate = tree["ostate"]
    pipeline.mstate = tree["mstate"]
    pipeline.imu_host.load_state(tree["imu_buf"])
    pipeline.frame = int(meta["frame"])
    pipeline.imu_used = bool(meta["imu_used"])
    pipeline.trajectory = [t for t in data["trajectory"]]
