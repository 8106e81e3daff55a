"""Frame-to-model tracking: recover known camera motion against a
raycast TSDF model (synthetic wavy-surface scene; the model raycast of
the fused volume is the rendering oracle for moved frames)."""

import numpy as np
import jax.numpy as jnp

from threecrate_tpu.core.transform import Transform
from threecrate_tpu.ops import frame_to_model as f2m
from threecrate_tpu.ops import tsdf_sparse as sp
from threecrate_tpu.ops import tsdf_raycast as rc


H, W = 60, 80
INTR = jnp.asarray([70.0, 70.0, W / 2 - 0.5, H / 2 - 0.5], jnp.float32)
# tracking accuracy is resolution-limited and best when voxel ≈ pixel
# world footprint (z/fx ≈ 0.029 here): measured rot bias 0.0054 rad at
# 0.0625 m voxels vs 0.0007 at 0.0312
GRID = (16, 16, 16)
VOX = 4.0 / 128
EYE = jnp.eye(4, dtype=jnp.float32)


def _wavy_depth():
    yy, xx = np.mgrid[0:H, 0:W]
    d = 2.0 + 0.3 * np.sin(xx / 10.0) * np.cos(yy / 7.0) \
        + 0.1 * np.sin(yy / 5.0)
    return jnp.asarray(d, jnp.float32)


def _fused_volume(depth):
    vol = sp.create_sparse_volume(VOX, origin=(-2.0, -2.0, 0.5),
                                  grid_blocks=GRID, block=8,
                                  max_blocks=4096)
    return sp.sparse_integrate(vol, depth, INTR, EYE,
                               grid_blocks=GRID, block=8)


def _pose(rx=0.0, ry=0.0, rz=0.0, t=(0.0, 0.0, 0.0)):
    tr = Transform.from_euler_xyz(jnp.asarray([rx, ry, rz], jnp.float32),
                                  jnp.asarray(t, jnp.float32))
    return tr.matrix


def _pose_err(a, b):
    d = np.asarray(jnp.matmul(jnp.linalg.inv(a), b))
    rot = np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1))
    return rot, np.linalg.norm(d[:3, 3])


class TestTrack:
    def test_recovers_known_motion(self):
        depth0 = _wavy_depth()
        vol = _fused_volume(depth0)
        true_pose = _pose(rx=0.02, ry=-0.015, rz=0.01,
                          t=(0.03, -0.02, 0.025))
        # synthesize the moved frame by raycasting the fused model
        frame = rc.sparse_raycast(vol, INTR, true_pose, H, W,
                                  grid_blocks=GRID, block=8,
                                  near=0.6, far=4.0)
        depth1 = frame.depth          # 0 where miss = invalid
        model = rc.sparse_raycast(vol, INTR, EYE, H, W,
                                  grid_blocks=GRID, block=8,
                                  near=0.6, far=4.0)
        res = f2m.track(model, EYE, depth1, INTR, EYE,
                        max_iterations=15)
        assert bool(res.converged)
        rot, trans = _pose_err(np.asarray(true_pose),
                               np.asarray(res.cam_to_world))
        assert rot < 2e-3, rot           # < 0.12 deg
        assert trans < 0.5 * VOX, trans
        assert float(res.rmse) < 0.02

    def test_identity_stays_identity(self):
        depth0 = _wavy_depth()
        vol = _fused_volume(depth0)
        model = rc.sparse_raycast(vol, INTR, EYE, H, W,
                                  grid_blocks=GRID, block=8,
                                  near=0.6, far=4.0)
        res = f2m.track(model, EYE, depth0, INTR, EYE, max_iterations=5)
        rot, trans = _pose_err(np.eye(4), np.asarray(res.cam_to_world))
        assert rot < 1e-3 and trans < 0.5 * VOX

    def test_lost_tracking_keeps_seed(self):
        depth0 = _wavy_depth()
        vol = _fused_volume(depth0)
        model = rc.sparse_raycast(vol, INTR, EYE, H, W,
                                  grid_blocks=GRID, block=8,
                                  near=0.6, far=4.0)
        # an empty frame has no valid pixels → pose must stay the seed
        res = f2m.track(model, EYE, jnp.zeros((H, W), jnp.float32),
                        INTR, EYE, max_iterations=5)
        assert not bool(res.converged)
        assert np.allclose(np.asarray(res.cam_to_world), np.eye(4))


class TestOdometry:
    def test_small_trajectory(self):
        depth0 = _wavy_depth()
        master = _fused_volume(depth0)

        gt = [EYE]
        for i in range(1, 4):
            gt.append(_pose(rx=0.008 * i, ry=-0.005 * i,
                            t=(0.012 * i, -0.008 * i, 0.015 * i)))
        frames = [depth0]
        for p in gt[1:]:
            r = rc.sparse_raycast(master, INTR, p, H, W,
                                  grid_blocks=GRID, block=8,
                                  near=0.6, far=4.0)
            frames.append(r.depth)

        from threecrate_tpu.core.organized import CameraIntrinsics
        odo = f2m.FrameToModelOdometry(
            CameraIntrinsics(70.0, 70.0, W / 2 - 0.5, H / 2 - 0.5),
            H, W, voxel_size=VOX, origin=(-2.0, -2.0, 0.5),
            grid_blocks=GRID, block=8, max_blocks=4096,
            config=f2m.FrameToModelConfig(far=4.0, near=0.6))
        poses = [odo.register_frame(f).matrix for f in frames]

        for i, (est, true) in enumerate(zip(poses, gt)):
            rot, trans = _pose_err(np.asarray(true), np.asarray(est))
            assert rot < 5e-3, (i, rot)
            assert trans < 1.5 * VOX, (i, trans)
        assert odo.last_track is not None
        assert int(odo.last_track.n_valid) > 1000

    def test_render_matches_frame(self):
        depth0 = _wavy_depth()
        from threecrate_tpu.core.organized import CameraIntrinsics
        odo = f2m.FrameToModelOdometry(
            CameraIntrinsics(70.0, 70.0, W / 2 - 0.5, H / 2 - 0.5),
            H, W, voxel_size=VOX, origin=(-2.0, -2.0, 0.5),
            grid_blocks=GRID, block=8, max_blocks=4096,
            config=f2m.FrameToModelConfig(far=4.0, near=0.6))
        odo.register_frame(depth0)
        view = odo.render()
        m = np.asarray(view.mask)
        err = np.abs(np.asarray(view.depth) - np.asarray(depth0))[m]
        assert m[10:-10, 10:-10].mean() > 0.9
        assert np.median(err) < 0.5 * VOX

    def test_config_validation(self):
        import pytest
        with pytest.raises(ValueError):
            f2m.FrameToModelConfig(max_iterations=0)
        with pytest.raises(ValueError):
            f2m.FrameToModelConfig(dist_gate=-1.0)


class TestPyramidModel:
    """model_render_scale=2: model raycast at half resolution, frame
    tracked against the coarser maps (KinectFusion pyramid). Accuracy
    must stay within the full-res tolerance band."""

    def test_recovers_motion_halfres_model(self):
        depth0 = _wavy_depth()
        vol = _fused_volume(depth0)
        true_pose = _pose(rx=0.02, ry=-0.015, rz=0.01,
                          t=(0.03, -0.02, 0.025))
        frame = rc.sparse_raycast(vol, INTR, true_pose, H, W,
                                  grid_blocks=GRID, block=8,
                                  near=0.6, far=4.0)
        s = 2
        mh, mw = H // s, W // s
        half = (s - 1) / 2.0
        mintr = jnp.stack([INTR[0] / s, INTR[1] / s,
                           (INTR[2] - half) / s, (INTR[3] - half) / s])
        model = rc.sparse_raycast(vol, mintr, EYE, mh, mw,
                                  grid_blocks=GRID, block=8,
                                  near=0.6, far=4.0)
        res = f2m.track(model, EYE, frame.depth, INTR, EYE,
                        max_iterations=15, model_intr=mintr)
        assert bool(res.converged)
        rot, trans = _pose_err(np.asarray(true_pose),
                               np.asarray(res.cam_to_world))
        assert rot < 2e-3, rot
        assert trans < 0.5 * VOX, trans

    def test_odometry_config_knob(self):
        depth0 = _wavy_depth()
        cfg = f2m.FrameToModelConfig(model_render_scale=2)
        odo = f2m.FrameToModelOdometry(
            INTR, H, W, voxel_size=VOX, origin=(-2.0, -2.0, 0.5),
            grid_blocks=GRID, block=8, max_blocks=4096, config=cfg)
        odo.register_frame(depth0)
        tr = odo.register_frame(depth0)   # same frame → ~identity
        rot, trans = _pose_err(np.eye(4), np.asarray(tr.matrix))
        assert rot < 2e-3 and trans < VOX


class TestTrackStride:
    """track_stride=2: the frame subsampled by strided slicing for
    tracking (fusion stays full-res). Accuracy must stay within the
    full-res tolerance band despite 4x fewer residuals."""

    def test_recovers_motion_strided_frame(self):
        depth0 = _wavy_depth()
        vol = _fused_volume(depth0)
        true_pose = _pose(rx=0.02, ry=-0.015, rz=0.01,
                          t=(0.03, -0.02, 0.025))
        frame = rc.sparse_raycast(vol, INTR, true_pose, H, W,
                                  grid_blocks=GRID, block=8,
                                  near=0.6, far=4.0)
        model = rc.sparse_raycast(vol, INTR, EYE, H, W,
                                  grid_blocks=GRID, block=8,
                                  near=0.6, far=4.0)
        ts = 2
        tintr = jnp.stack([INTR[0] / ts, INTR[1] / ts,
                           INTR[2] / ts, INTR[3] / ts])
        res = f2m.track(model, EYE, frame.depth[::ts, ::ts], tintr,
                        EYE, max_iterations=15, model_intr=INTR,
                        min_valid_pixels=100)
        assert bool(res.converged)
        rot, trans = _pose_err(np.asarray(true_pose),
                               np.asarray(res.cam_to_world))
        assert rot < 2e-3, rot
        assert trans < 0.5 * VOX, trans

    def test_odometry_stride_knob(self):
        depth0 = _wavy_depth()
        cfg = f2m.FrameToModelConfig(model_render_scale=2,
                                     track_stride=2)
        odo = f2m.FrameToModelOdometry(
            INTR, H, W, voxel_size=VOX, origin=(-2.0, -2.0, 0.5),
            grid_blocks=GRID, block=8, max_blocks=4096, config=cfg)
        odo.register_frame(depth0)
        tr = odo.register_frame(depth0)   # same frame → ~identity
        rot, trans = _pose_err(np.eye(4), np.asarray(tr.matrix))
        assert rot < 2e-3 and trans < VOX

    def test_stride_validation(self):
        import pytest
        with pytest.raises(ValueError):
            f2m.FrameToModelConfig(track_stride=0)
