"""Surface reconstruction: the TPU-native threecrate-reconstruction.

Grid algorithms (marching tetrahedra isosurface, dense screened
Poisson, MLS) run fully on device; triangulation-style algorithms
(Delaunay, BPA front propagation, CSG) are host-side by design with
device-batched candidate generation (SURVEY §7.8).
"""

from .alpha_shape import (
    AlphaMode,
    AlphaShapeConfig,
    alpha_shape_reconstruction,
    estimate_optimal_alpha,
)
from .ball_pivoting import (
    BallPivotingConfig,
    ball_pivoting_reconstruction,
    estimate_radii,
    fill_boundary_holes,
)
from .delaunay import DelaunayConfig, ProjectionPlane, delaunay_reconstruction
from .marching_cubes import (
    VolumetricGrid,
    create_cube_volume,
    create_sphere_volume,
    marching_cubes,
    reconstruct_marching_cubes,
)
from .moving_least_squares import (
    MlsConfig,
    PolynomialBasis,
    WeightKernel,
    mls_reconstruct,
    mls_smooth,
)
from .pipeline import (
    Algorithm,
    DataCharacteristics,
    PipelineConfig,
    QualityLevel,
    ReconstructionResult,
    UseCase,
    analyze_data,
    auto_reconstruct,
    auto_reconstruct_detailed,
    select_algorithm,
)
from .poisson import PoissonConfig, poisson_reconstruct

__all__ = [
    "AlphaMode", "AlphaShapeConfig", "alpha_shape_reconstruction",
    "estimate_optimal_alpha",
    "BallPivotingConfig", "ball_pivoting_reconstruction", "estimate_radii",
    "fill_boundary_holes",
    "DelaunayConfig", "ProjectionPlane", "delaunay_reconstruction",
    "VolumetricGrid", "create_cube_volume", "create_sphere_volume",
    "marching_cubes", "reconstruct_marching_cubes",
    "MlsConfig", "PolynomialBasis", "WeightKernel", "mls_reconstruct",
    "mls_smooth",
    "Algorithm", "DataCharacteristics", "PipelineConfig", "QualityLevel",
    "ReconstructionResult", "UseCase", "analyze_data", "auto_reconstruct",
    "auto_reconstruct_detailed", "select_algorithm",
    "PoissonConfig", "poisson_reconstruct",
]
