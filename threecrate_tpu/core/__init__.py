"""Core data model: points, clouds, meshes, transforms, errors.

TPU-native counterpart of threecrate-core (reference
threecrate-core/src/lib.rs:6-33).
"""

from .errors import (
    AlgorithmError,
    DeviceError,
    InvalidDataError,
    IoError,
    ThreeCrateError,
    UnsupportedError,
    UnsupportedFormatError,
    VisualizationError,
    require,
)
from .mesh import TriangleMesh
from .organized import CameraIntrinsics, OrganizedPointCloud
from .point_cloud import COLORS, INTENSITY, NORMALS, PointCloud
from .transform import (
    Transform,
    axis_angle_to_matrix,
    matrix_to_quaternion,
    quaternion_to_matrix,
    se3_exp,
    skew,
)

__all__ = [
    "AlgorithmError", "DeviceError", "InvalidDataError", "IoError",
    "ThreeCrateError", "UnsupportedError", "UnsupportedFormatError",
    "VisualizationError", "require",
    "TriangleMesh", "CameraIntrinsics", "OrganizedPointCloud",
    "PointCloud", "COLORS", "INTENSITY", "NORMALS",
    "Transform", "axis_angle_to_matrix", "matrix_to_quaternion",
    "quaternion_to_matrix", "se3_exp", "skew",
]
