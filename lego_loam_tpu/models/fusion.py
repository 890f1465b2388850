"""High-rate pose fusion (TransformFusion node replacement).

The reference's fourth process re-applies the odometry increment since the
last mapping solve on top of the last mapped pose at every 10 Hz odometry
message (reference: transformFusion.cpp:94-239, consuming the odometry pose
the mapping node smuggles through the twist field of its output message).
In SE(3) this is a two-line compose; the side-channel disappears because the
latched poses live in MappingState.
"""

from __future__ import annotations

from lego_loam_tpu.models.mapping import MappingState
from lego_loam_tpu.utils.math3d import Pose


def fuse_pose(state: MappingState, odom_pose: Pose) -> Pose:
    """Map-accurate pose at odometry rate: aft o (bef^-1 o odom)."""
    delta = state.bef_mapped.inverse().compose(odom_pose)
    return state.aft_mapped.compose(delta)
