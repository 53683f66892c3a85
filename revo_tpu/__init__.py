"""revo_tpu — a TPU-native edge-based visual-odometry / SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
fabianschenk/REVO (Robust Edge-based Visual Odometry, BMVC17/IROS17): RGB-D
image pyramids, Canny edge extraction, Euclidean distance-transform keyframes,
coarse-to-fine Gauss-Newton/LM SE(3) frame-to-keyframe alignment, histogram
-voting keyframe selection, pose-graph trajectory output — plus capabilities
the reference lacks: batched multi-sequence tracking, device-mesh sharding and
pose-graph/windowed bundle adjustment over XLA collectives.
"""

from revo_tpu import lie
from revo_tpu.config import (
    CameraConfig,
    DatasetConfig,
    OptimizerConfig,
    PyramidConfig,
    SystemConfig,
    TrackerConfig,
    load_config,
)

__version__ = "0.1.0"

__all__ = [
    "lie",
    "CameraConfig",
    "DatasetConfig",
    "OptimizerConfig",
    "PyramidConfig",
    "SystemConfig",
    "TrackerConfig",
    "load_config",
    "__version__",
]
