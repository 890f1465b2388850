"""lego_loam_tpu: a TPU-native lidar SLAM engine (JAX/XLA/Pallas).

Brand-new implementation of the full LeGO-LOAM capability set
(vigorbird/LeGO-LOAM_comment) designed for TPU: fixed-shape jitted programs,
MXU-batched nearest-neighbor search, scan-based connected-component labeling,
matrix-free pose-graph optimization, and mesh-sharded distributed back-end.
"""

from lego_loam_tpu.config import (  # noqa: F401
    DEFAULT_CONFIG,
    HDL32E,
    HDL64E,
    OS1_16,
    OS1_64,
    PipelineConfig,
    SENSOR_PRESETS,
    SensorSpec,
    VLP16,
    VLS128,
    config_for,
)
from lego_loam_tpu.utils.math3d import Pose  # noqa: F401

__version__ = "0.1.0"
