"""Frame-to-model depth tracking: projective point-to-plane ICP against
raycast TSDF maps (the KinectFusion loop).

The reference tracks frames against accumulated point maps with
kNN-based ICP (kiss_icp.rs, registration.rs); with a TSDF resident on
device the classic dense alternative becomes available: raycast the
model into the previous camera (``ops/tsdf_raycast``), then align the
new depth frame by PROJECTIVE data association — each frame pixel's
correspondence is found by projecting it into the model view, a
constant-time pixel lookup instead of a neighbor search. The entire
Gauss-Newton iteration is elementwise math over the (H, W) maps plus
one 6×6 normal-equation reduction: no kNN, no sort, no scatter — the
best-conditioned shape this hardware offers, and the reason
KinectFusion ran realtime in 2011 on far weaker silicon.

Pipeline per frame (``FrameToModelOdometry.register_frame``):
  raycast model @ last pose → track (GN, fori_loop, one jit) →
  sparse_integrate @ new pose. All state stays device-resident (the
  odometry round-trip lesson: host transfers of padded state through a
  tunneled device dominate everything else).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.transform import Transform, se3_exp
from . import linalg
from .tsdf_raycast import RaycastResult, sparse_raycast
from .tsdf_sparse import SparseTsdfVolume, create_sparse_volume, \
    sparse_integrate


@dataclasses.dataclass(frozen=True)
class FrameToModelConfig:
    """Tracking + fusion knobs (defaults sized for indoor RGB-D)."""

    max_iterations: int = 10
    dist_gate: float = 0.10          # reject |plane residual| above (m)
    normal_gate: float = 0.5         # reject cos(frame n, model n) below
    near: float = 0.1
    far: float = 6.0
    max_steps: int = 96              # raycast march budget
    depth_scale: float = 1.0
    min_valid_pixels: int = 100      # below → tracking lost, keep pose
    # render the tracking model at 1/s resolution (KinectFusion-style
    # pyramid): s=2 quarters the per-frame raycast cost; the tracker's
    # bilinear association interpolates the coarser maps. Measured on
    # the wavy-scene probes: s=2 keeps rot error within the s=1
    # tolerance band. render() is unaffected (always full-res).
    model_render_scale: int = 1
    # subsample the FRAME by this stride for tracking (GN residual
    # and association-gather count scale with frame pixels; a 480x640
    # frame at stride 2 still contributes ~77k correspondences).
    # Fusion always uses the full-resolution frame.
    track_stride: int = 1
    # per-frame fusion touches only blocks in the frame's truncation
    # band, compacted to this fraction of max_blocks (see
    # tsdf_sparse.sparse_integrate); 1.0 = update every row.
    update_fraction: float = 0.5

    def __post_init__(self):
        if self.max_iterations < 1:
            raise ValueError("max_iterations must be >= 1")
        if self.model_render_scale < 1:
            raise ValueError("model_render_scale must be >= 1")
        if self.track_stride < 1:
            raise ValueError("track_stride must be >= 1")
        if self.dist_gate <= 0:
            raise ValueError("dist_gate must be positive")
        if not 0.0 < self.update_fraction <= 1.0:
            raise ValueError("update_fraction must be in (0, 1]")


class TrackResult(NamedTuple):
    cam_to_world: jnp.ndarray   # (4, 4) refined pose
    rmse: jnp.ndarray           # scalar plane-residual RMSE (gated set)
    n_valid: jnp.ndarray        # scalar int32 gated correspondences
    converged: jnp.ndarray      # bool: enough correspondences at exit


def _backproject(depth: jnp.ndarray, intr: jnp.ndarray,
                 depth_scale: float):
    """Depth image → camera-frame vertex map + central-difference
    normal map (normals point toward the camera, −z halfspace)."""
    h, w = depth.shape
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    d = depth.astype(jnp.float32) / depth_scale
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    pts = jnp.stack([(u - cx) / fx * d, (v - cy) / fy * d, d], axis=-1)
    valid = d > 1e-6

    dx = jnp.roll(pts, -1, axis=1) - jnp.roll(pts, 1, axis=1)
    dy = jnp.roll(pts, -1, axis=0) - jnp.roll(pts, 1, axis=0)
    n = jnp.cross(dy, dx)          # oriented so n·z < 0 for a wall
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(nn, 1e-12)
    vx = jnp.roll(valid, -1, 1) & jnp.roll(valid, 1, 1)
    vy = jnp.roll(valid, -1, 0) & jnp.roll(valid, 1, 0)
    border = jnp.zeros((h, w), bool).at[1:-1, 1:-1].set(True)
    nvalid = valid & vx & vy & border & (nn[..., 0] > 1e-12)
    return pts, n, valid & nvalid


@functools.partial(jax.jit, static_argnames=("max_iterations",
                                             "depth_scale"))
def track(model: RaycastResult, model_cam_to_world: jnp.ndarray,
          depth: jnp.ndarray, intr: jnp.ndarray,
          init_cam_to_world: jnp.ndarray,
          max_iterations: int = 10, dist_gate: float = 0.1,
          normal_gate: float = 0.5, depth_scale: float = 1.0,
          min_valid_pixels: int = 100,
          model_intr: Optional[jnp.ndarray] = None) -> TrackResult:
    """Align one depth frame to raycast model maps.

    ``model``: raycast of the TSDF from ``model_cam_to_world`` (world-
    space vertices/normals). ``init_cam_to_world``: pose seed for the
    new frame (constant-velocity or last pose). Returns the refined
    camera-to-world pose.

    The model maps may be a DIFFERENT resolution than the frame
    (pyramid tracking: render the model at half resolution to halve
    the per-frame raycast cost); pass the intrinsics the model was
    raycast with as ``model_intr`` (defaults to ``intr``).
    """
    h, w = depth.shape
    mh, mw = model.mask.shape
    mintr = intr if model_intr is None else model_intr
    fx, fy, cx, cy = mintr[0], mintr[1], mintr[2], mintr[3]
    pts_c, nrm_c, fvalid = _backproject(depth, intr, depth_scale)
    p_f = pts_c.reshape(-1, 3)
    n_f = nrm_c.reshape(-1, 3)
    okf = fvalid.reshape(-1)

    # gate on the confident channel when present: grazing/border hits
    # whose depth came from nearest-sample interpolation carry a
    # systematic half-voxel bias that GN would converge onto
    ok_src = model.mask if model.confident is None else model.confident
    # pack vertex(3) + normal(3) + ok(1) into ONE 7-wide map: each
    # bilinear corner costs a single 7-wide row gather instead of
    # three separate 3/3/1-wide ones (row gathers amortise with width)
    m_pack = jnp.concatenate(
        [model.vertices.reshape(-1, 3),
         model.normals.reshape(-1, 3),
         ok_src.reshape(-1, 1).astype(jnp.float32)], axis=1)

    # world → model camera (for projective association)
    r_m = model_cam_to_world[:3, :3]
    t_m = model_cam_to_world[:3, 3]
    hi = jax.lax.Precision.HIGHEST

    def gn_step(carry):
        t_mat, _, _, step, _ = carry
        r = t_mat[:3, :3]
        t = t_mat[:3, 3]
        p_w = jnp.matmul(p_f, r.T, precision=hi) + t
        n_w = jnp.matmul(n_f, r.T, precision=hi)

        # project into the model view; BILINEAR map interpolation —
        # nearest-pixel association leaves a half-pixel quantization
        # bias that GN converges onto (measured ~0.3° on a 80×60 wavy
        # scene; bilinear removes it)
        p_mc = jnp.matmul(p_w - t_m, r_m, precision=hi)  # r_m.T @ x
        z = p_mc[:, 2]
        uf = p_mc[:, 0] / jnp.maximum(z, 1e-9) * fx + cx
        vf = p_mc[:, 1] / jnp.maximum(z, 1e-9) * fy + cy
        u0 = jnp.floor(uf).astype(jnp.int32)
        v0 = jnp.floor(vf).astype(jnp.int32)
        au = (uf - u0.astype(jnp.float32))[:, None]
        av = (vf - v0.astype(jnp.float32))[:, None]
        inb = (z > 1e-6) & (u0 >= 0) & (u0 + 1 < mw) \
            & (v0 >= 0) & (v0 + 1 < mh)
        u0 = jnp.clip(u0, 0, mw - 2)
        v0 = jnp.clip(v0, 0, mh - 2)
        p00 = v0 * mw + u0
        c00 = m_pack[p00]
        c01 = m_pack[p00 + 1]
        c10 = m_pack[p00 + mw]
        c11 = m_pack[p00 + mw + 1]
        cb = ((1 - av) * ((1 - au) * c00 + au * c01)
              + av * ((1 - au) * c10 + au * c11))
        q = cb[:, 0:3]
        nq = cb[:, 3:6]
        nq = nq / jnp.maximum(jnp.linalg.norm(nq, axis=1, keepdims=True),
                              1e-12)
        # ok channel: min over the 4 corners ≥ 1 ⇔ all corners valid
        all_ok = jnp.minimum(jnp.minimum(c00[:, 6], c01[:, 6]),
                             jnp.minimum(c10[:, 6], c11[:, 6])) > 0.5

        res = jnp.sum((p_w - q) * nq, axis=1)
        ok = okf & inb & all_ok \
            & (jnp.abs(res) < dist_gate) \
            & (jnp.sum(n_w * nq, axis=1) > normal_gate)
        wgt = ok.astype(jnp.float32)

        a = jnp.concatenate([jnp.cross(p_w, nq), nq], axis=1)   # (N, 6)
        aw = a * wgt[:, None]
        hmat = jnp.matmul(aw.T, a, precision=hi)
        g = -jnp.matmul(aw.T, res, precision=hi)
        n_ok = jnp.sum(wgt)
        xi = linalg.solve_psd(hmat, g, damping=1e-6)
        enough = n_ok >= min_valid_pixels
        xi = jnp.where(enough, xi, jnp.zeros_like(xi))
        t_new = jnp.matmul(se3_exp(xi), t_mat, precision=hi)
        mse = jnp.sum(jnp.where(ok, res * res, 0.0)) \
            / jnp.maximum(n_ok, 1.0)
        return (t_new, mse, n_ok, step + 1,
                jnp.linalg.norm(xi))

    def gn_cond(carry):
        _, _, _, step, dxi = carry
        # stop when the update stalls (|xi| < ~1e-6: sub-micrometre /
        # sub-microradian) — typical small-motion tracks converge in
        # 4-6 of the 10 budgeted iterations, and each GN round costs a
        # full projective association pass
        return (step < max_iterations) & (dxi > 1e-6)

    t0 = init_cam_to_world.astype(jnp.float32)
    t_fin, mse, n_ok, _, _ = jax.lax.while_loop(
        gn_cond, gn_step,
        (t0, jnp.float32(0.0), jnp.float32(0.0), jnp.int32(0),
         jnp.float32(1.0)))
    conv = n_ok >= min_valid_pixels
    t_fin = jnp.where(conv, t_fin, t0)
    return TrackResult(t_fin, jnp.sqrt(mse), n_ok.astype(jnp.int32),
                       conv)


class FrameToModelOdometry:
    """KinectFusion-style odometry: a device-resident sparse TSDF is
    the map; each frame is tracked against its raycast and fused in.

    Mirrors ``KissIcpOdometry``'s surface (``register_frame`` →
    ``Transform``) for depth-camera streams. All per-frame state stays
    on device; only the 4×4 pose is materialised per call.
    """

    def __init__(self, intrinsics, height: int, width: int,
                 voxel_size: float = 0.02,
                 origin=(-2.0, -2.0, 0.0),
                 grid_blocks: Tuple[int, int, int] = (32, 32, 32),
                 block: int = 8, max_blocks: int = 16384,
                 config: FrameToModelConfig = FrameToModelConfig(),
                 with_color: bool = False):
        self.config = config
        self.height, self.width = height, width
        self.grid_blocks, self.block = grid_blocks, block
        self.intr = jnp.asarray(
            [intrinsics.fx, intrinsics.fy, intrinsics.cx, intrinsics.cy]
            if hasattr(intrinsics, "fx") else intrinsics, jnp.float32)
        self.volume: SparseTsdfVolume = create_sparse_volume(
            voxel_size, origin=origin, grid_blocks=grid_blocks,
            block=block, max_blocks=max_blocks, with_color=with_color)
        self.pose = jnp.eye(4, dtype=jnp.float32)
        self._prev_delta = jnp.eye(4, dtype=jnp.float32)
        self.n_frames = 0
        self.last_track: Optional[TrackResult] = None

    def register_frame(self, depth, rgb=None) -> Transform:
        """Track + fuse one depth frame; returns the world pose."""
        cfg = self.config
        depth = jnp.asarray(depth)
        if self.n_frames > 0:
            # constant-velocity seed, then raycast the model from it
            seed = jnp.matmul(self.pose, self._prev_delta,
                              precision=jax.lax.Precision.HIGHEST)
            s = cfg.model_render_scale
            mh, mw = self.height // s, self.width // s
            half = (jnp.float32(s) - 1.0) / 2.0
            mintr = self.intr if s == 1 else jnp.stack(
                [self.intr[0] / s, self.intr[1] / s,
                 (self.intr[2] - half) / s, (self.intr[3] - half) / s])
            model = sparse_raycast(
                self.volume, mintr, seed, mh, mw,
                grid_blocks=self.grid_blocks, block=self.block,
                near=cfg.near, far=cfg.far, max_steps=cfg.max_steps)
            ts = cfg.track_stride
            if ts > 1:
                # strided slice keeps original pixel j·ts as the new
                # pixel j: u_orig = ts·u_new ⇒ (fx, cx) divide by ts
                # (unlike the model pyramid's box-center convention)
                tdepth = depth[::ts, ::ts]
                tintr = jnp.stack(
                    [self.intr[0] / ts, self.intr[1] / ts,
                     self.intr[2] / ts, self.intr[3] / ts])
                min_px = max(1, cfg.min_valid_pixels // (ts * ts))
            else:
                tdepth, tintr = depth, self.intr
                min_px = cfg.min_valid_pixels
            tr = track(model, seed, tdepth, tintr, seed,
                       max_iterations=cfg.max_iterations,
                       dist_gate=cfg.dist_gate,
                       normal_gate=cfg.normal_gate,
                       depth_scale=cfg.depth_scale,
                       min_valid_pixels=min_px,
                       model_intr=mintr)
            self.last_track = tr
            new_pose = tr.cam_to_world
            inv_prev = Transform.from_matrix(self.pose).inverse().matrix
            self._prev_delta = jnp.matmul(
                inv_prev, new_pose, precision=jax.lax.Precision.HIGHEST)
            self.pose = new_pose
        self.volume = sparse_integrate(
            self.volume, depth, self.intr, self.pose,
            grid_blocks=self.grid_blocks, block=self.block, rgb=rgb,
            depth_scale=cfg.depth_scale,
            update_fraction=cfg.update_fraction)
        self.n_frames += 1
        return Transform.from_matrix(self.pose)

    def render(self, cam_to_world=None) -> RaycastResult:
        """Raycast the current model (default: from the current pose)."""
        pose = self.pose if cam_to_world is None else \
            jnp.asarray(cam_to_world, jnp.float32)
        return sparse_raycast(
            self.volume, self.intr, pose, self.height, self.width,
            grid_blocks=self.grid_blocks, block=self.block,
            near=self.config.near, far=self.config.far,
            max_steps=self.config.max_steps)
