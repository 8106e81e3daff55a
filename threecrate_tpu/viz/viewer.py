"""Viewer API: one-line show_* helpers + an interactive viewer shell.

Covers threecrate-visualization: ``show_point_cloud``/``show_mesh``
one-liners (visualization/src/lib.rs:21-32) and the ``InteractiveViewer``
(interactive_viewer.rs:116) with its ViewData variants (:27-32),
runtime-tunable ICP/RANSAC parameter blocks (:51-83) and pipeline
toggle (:43-47). The reference drives a winit window; this environment
is headless, so frames render through viz.renderer (device-side) and
are written to PNG / returned as arrays. The control surface (orbit/
pan/zoom, parameter structs, re-run pipeline) is identical in spirit.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Union

import numpy as np

from ..core.mesh import TriangleMesh
from ..core.point_cloud import PointCloud
from .camera import OrbitCamera
from .renderer import render_mesh, render_point_cloud, save_image


class ViewData(enum.Enum):
    """interactive_viewer.rs:27-32."""

    EMPTY = "empty"
    POINT_CLOUD = "point_cloud"
    COLORED_POINT_CLOUD = "colored_point_cloud"
    MESH = "mesh"


class PipelineType(enum.Enum):
    """CPU/GPU toggle (interactive_viewer.rs:43-47) → here it picks the
    exact vs windowed neighbor search for the live pipelines."""

    EXACT = "exact"
    WINDOWED = "windowed"


@dataclasses.dataclass
class ICPParams:
    """Runtime-tunable ICP knobs (interactive_viewer.rs:51-66)."""

    max_iterations: int = 30
    convergence_threshold: float = 1e-6
    max_correspondence_distance: Optional[float] = None


@dataclasses.dataclass
class RANSACParams:
    """Runtime-tunable RANSAC knobs (interactive_viewer.rs:67-83)."""

    distance_threshold: float = 0.01
    max_iterations: int = 512


class InteractiveViewer:
    """Headless interactive viewer: holds content + camera, renders
    frames on demand (the winit event loop becomes explicit method
    calls; notebook/video loops drive it)."""

    def __init__(self, width: int = 960, height: int = 720):
        self.width = width
        self.height = height
        self.camera: Optional[OrbitCamera] = None
        self.data_kind = ViewData.EMPTY
        self._content: Optional[Union[PointCloud, TriangleMesh]] = None
        self.icp_params = ICPParams()
        self.ransac_params = RANSACParams()
        self.pipeline = PipelineType.EXACT
        self.point_size = 2

    # -- content ---------------------------------------------------------
    def set_point_cloud(self, cloud: PointCloud) -> None:
        self._content = cloud
        self.data_kind = (ViewData.COLORED_POINT_CLOUD
                          if cloud.colors is not None
                          else ViewData.POINT_CLOUD)
        self.camera = OrbitCamera.fit(cloud.to_numpy())

    def set_mesh(self, mesh: TriangleMesh) -> None:
        self._content = mesh
        self.data_kind = ViewData.MESH
        v, _ = mesh.to_numpy()
        self.camera = OrbitCamera.fit(v)

    # -- camera controls ---------------------------------------------------
    def orbit(self, d_yaw: float, d_pitch: float) -> None:
        if self.camera:
            self.camera.orbit(d_yaw, d_pitch)

    def zoom(self, factor: float) -> None:
        if self.camera:
            self.camera.zoom(factor)

    def pan(self, dx: float, dy: float) -> None:
        if self.camera:
            self.camera.pan(dx, dy)

    # -- live pipelines (the viewer's "run ICP/RANSAC" hotkeys) -----------
    def run_plane_segmentation(self):
        from ..ops.segmentation import segment_plane
        if not isinstance(self._content, PointCloud):
            raise ValueError("plane segmentation needs a point cloud")
        return segment_plane(self._content,
                             self.ransac_params.distance_threshold,
                             self.ransac_params.max_iterations)

    def run_icp(self, target: PointCloud):
        from ..ops.registration import icp_point_to_point
        if not isinstance(self._content, PointCloud):
            raise ValueError("ICP needs a point cloud loaded")
        return icp_point_to_point(
            self._content, target,
            self.icp_params.max_iterations,
            self.icp_params.convergence_threshold,
            self.icp_params.max_correspondence_distance)

    # -- rendering ---------------------------------------------------------
    def render(self) -> np.ndarray:
        if self._content is None:
            return np.zeros((self.height, self.width, 3), np.float32)
        if self.data_kind == ViewData.MESH:
            return render_mesh(self._content, self.camera,
                               self.width, self.height)
        return render_point_cloud(self._content, self.camera,
                                  self.width, self.height,
                                  self.point_size)

    def screenshot(self, path) -> None:
        save_image(path, self.render())


def show_point_cloud(cloud: PointCloud, path=None, **kw) -> np.ndarray:
    """One-liner (visualization/src/lib.rs:21): render (and optionally
    save) a cloud; returns the image array."""
    img = render_point_cloud(cloud, **kw)
    if path is not None:
        save_image(path, img)
    return img


def show_mesh(mesh: TriangleMesh, path=None, **kw) -> np.ndarray:
    """One-liner (visualization/src/lib.rs:32)."""
    img = render_mesh(mesh, **kw)
    if path is not None:
        save_image(path, img)
    return img
