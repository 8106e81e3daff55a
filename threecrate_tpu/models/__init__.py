"""Flagship pipeline "models" — jittable end-to-end compositions.

A geometry framework's model families are its canonical pipelines, not
neural networks. These mirror the reference's example pipelines
(examples/*.rs) as single fused device programs:

* :class:`PerceptionStep` — normals + ICP scan alignment, one jit;
* :class:`OdometryModel` — KISS-ICP scan-to-map odometry;
* :class:`RegistrationModel` — global (RANSAC/FPFH) init + ICP refine;
* :class:`ReconstructionModel` — filter → normals → surface → simplify.
"""

from .perception import (PerceptionResult, PerceptionStep, OdometryModel,
                         RegistrationModel, ReconstructionModel)

__all__ = [
    "PerceptionResult", "PerceptionStep", "OdometryModel",
    "RegistrationModel", "ReconstructionModel",
]
