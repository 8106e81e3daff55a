"""threecrate-tpu: a TPU-native 3D point-cloud & mesh processing framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
rajgandhi1/threecrate (Rust/wgpu): filtering, normal estimation, the ICP
registration family, NDT, FPFH/SHOT features, global registration,
segmentation, surface reconstruction, mesh simplification, TSDF fusion,
broad file I/O, and a Python API — redesigned for dense padded arrays,
fused matmul neighbor search, batched small linear algebra, and
device-mesh sharding instead of KD-trees, rayon and compute shaders.
"""

__version__ = "0.1.0"

from . import core, models, ops, utils
from .core import (
    CameraIntrinsics,
    OrganizedPointCloud,
    PointCloud,
    Transform,
    TriangleMesh,
)
from .core.errors import (
    AlgorithmError,
    DeviceError,
    InvalidDataError,
    IoError,
    ThreeCrateError,
    UnsupportedError,
    UnsupportedFormatError,
    VisualizationError,
)
# the flat tc.* surface (mirrors the reference's python module,
# threecrate-python/src/lib.rs:2504-2591)
from .api import *  # noqa: F401,F403
from . import api

__all__ = [
    "core", "ops", "utils", "api",
    "PointCloud", "TriangleMesh", "Transform",
    "OrganizedPointCloud", "CameraIntrinsics",
    "ThreeCrateError", "IoError", "InvalidDataError", "AlgorithmError",
    "DeviceError", "VisualizationError", "UnsupportedError",
    "UnsupportedFormatError",
    "__version__",
]
