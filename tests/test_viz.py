"""Renderer/viewer tests: geometry actually lands on screen where the
camera math says it should."""

import numpy as np
import pytest

from threecrate_tpu import PointCloud, TriangleMesh
from threecrate_tpu.viz import (
    InteractiveViewer, OrbitCamera, render_mesh, render_point_cloud,
    show_mesh, show_point_cloud)

from conftest import make_sphere_points


BG = np.array([0.08, 0.09, 0.11])


def coverage(img):
    return (np.abs(img - BG) > 0.02).any(-1).mean()


class TestPointRenderer:
    def test_sphere_renders_centered(self):
        pc = PointCloud.from_numpy(make_sphere_points(2000))
        img = render_point_cloud(pc, width=160, height=120)
        assert img.shape == (120, 160, 3)
        cov = coverage(img)
        assert 0.02 < cov < 0.9
        # content is centered: the middle has more hits than the border
        mid = (np.abs(img[40:80, 53:107] - BG) > 0.02).any(-1).mean()
        border = (np.abs(img[:10, :] - BG) > 0.02).any(-1).mean()
        assert mid > border

    def test_colors_used(self):
        pts = make_sphere_points(500)
        cols = np.zeros((500, 3), np.float32)
        cols[:, 0] = 1.0  # pure red
        pc = PointCloud.from_numpy(pts, colors=cols)
        img = render_point_cloud(pc, width=120, height=90)
        lit = np.abs(img - BG).max(-1) > 0.05
        assert lit.any()
        np.testing.assert_allclose(img[lit][:, 0], 1.0, atol=1e-5)

    def test_depth_occlusion(self):
        # two points on the same ray: near point must win the pixel
        cam = OrbitCamera(target=np.zeros(3, np.float32), distance=5.0,
                          yaw=0.0, pitch=0.0)
        # camera on +x axis looking -x: points at x=1 (near) and x=-1 (far)
        near = np.array([[1.0, 0, 0]], np.float32)
        far = np.array([[-1.0, 0, 0]], np.float32)
        cols = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
        pc = PointCloud.from_numpy(np.concatenate([near, far]), colors=cols)
        img = render_point_cloud(pc, cam, width=60, height=60, point_size=3)
        lit = np.abs(img - BG).max(-1) > 0.05
        assert lit.any()
        # every lit pixel is red (near point)
        assert (img[lit][:, 0] > 0.9).all()


class TestMeshRenderer:
    def _tetra(self):
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                     np.float32)
        f = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32)
        return TriangleMesh.from_numpy(v, f)

    def test_renders_filled_shape(self):
        img = render_mesh(self._tetra(), width=160, height=120)
        cov = coverage(img)
        assert 0.05 < cov < 0.9

    def test_shading_varies_by_face(self):
        m = self._tetra()
        v, _ = m.to_numpy()
        cam = OrbitCamera.fit(v)
        cam.yaw, cam.pitch = 4.0, -0.5   # angle showing several faces
        img = render_mesh(m, cam, width=160, height=120)
        lit = img[np.abs(img - BG).max(-1) > 0.02]
        # multiple faces with different lambert terms → >1 distinct level
        assert np.unique(np.round(lit[:, 0], 2)).size >= 2


class TestViewer:
    def test_viewer_roundtrip(self, tmp_path):
        pc = PointCloud.from_numpy(make_sphere_points(500))
        v = InteractiveViewer(width=120, height=90)
        v.set_point_cloud(pc)
        v.orbit(0.3, 0.1)
        v.zoom(0.8)
        v.pan(0.05, 0.02)
        img = v.render()
        assert img.shape == (90, 120, 3)
        p = tmp_path / "shot.png"
        v.screenshot(p)
        assert p.exists() and p.stat().st_size > 100

    def test_viewer_live_pipelines(self):
        rng = np.random.default_rng(0)
        xy = rng.uniform(-1, 1, (300, 2)).astype(np.float32)
        pts = np.concatenate([xy, 0.001 * rng.normal(
            size=(300, 1)).astype(np.float32)], 1)
        v = InteractiveViewer()
        v.set_point_cloud(PointCloud.from_numpy(pts))
        res = v.run_plane_segmentation()
        assert int(res.inlier_count) > 250
        icp_res = v.run_icp(PointCloud.from_numpy(pts))
        assert bool(icp_res.converged)

    def test_show_helpers(self, tmp_path):
        pc = PointCloud.from_numpy(make_sphere_points(200))
        img = show_point_cloud(pc, tmp_path / "c.png", width=80, height=60)
        assert (tmp_path / "c.png").exists()
        m = TriangleMesh.from_numpy(
            np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
            np.array([[0, 1, 2]], np.int32))
        show_mesh(m, tmp_path / "m.png", width=80, height=60)
        assert (tmp_path / "m.png").exists()


class TestTerminalLoop:
    """The viewer's terminal event loop (the winit ApplicationHandler
    analog — interactive_viewer.rs:116) driven by a scripted key
    sequence; closes §2.7's missing-event-loop gap headlessly."""

    def _viewer(self):
        from threecrate_tpu.viz import InteractiveViewer
        rng = np.random.default_rng(0)
        pts = rng.normal(0, 1, (500, 3)).astype(np.float32)
        v = InteractiveViewer(width=160, height=120)
        v.set_point_cloud(PointCloud.from_numpy(pts))
        return v

    def test_scripted_session(self, capsys):
        v = self._viewer()
        yaw0 = v.camera.yaw
        dist0 = v.camera.distance
        frames = v.run_terminal(cols=40, rows=12,
                                keys=iter("ad+-wpq"))
        out = capsys.readouterr().out
        assert frames == 7          # initial + 6 handled keys before q
        assert "\x1b[38;2;" in out  # truecolor cells were emitted
        assert v.pipeline.value == "windowed"   # 'p' toggled

    def test_key_dispatch_moves_camera(self):
        v = self._viewer()
        yaw0 = v.camera.yaw
        assert v.handle_key("a")
        assert v.camera.yaw != yaw0
        d0 = v.camera.distance
        assert v.handle_key("+")
        assert v.camera.distance < d0
        assert not v.handle_key("q")

    def test_frame_ansi_shape(self):
        v = self._viewer()
        s = v.frame_ansi(cols=32, rows=10)
        assert s.count("\n") == 9
        assert s.count("▀") == 32 * 10


class TestPbrRenderer:
    """ShadingMode::Pbr + render_to_texture (gpu/src/mesh.rs:849-1069,
    mesh_pbr.wgsl): per-pixel interpolated normals, metallic-roughness
    BRDF, ACES tone map."""

    def _sphere_mesh(self, n=24):
        th = np.linspace(0, np.pi, n)
        ph = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
        T, P = np.meshgrid(th, ph, indexing="ij")
        v = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P),
                      np.cos(T)], -1).reshape(-1, 3).astype(np.float32)
        f = []
        w = 2 * n
        for i in range(n - 1):
            for j in range(w):
                a = i * w + j
                b = i * w + (j + 1) % w
                c = (i + 1) * w + j
                d = (i + 1) * w + (j + 1) % w
                f += [[a, b, c], [b, d, c]]
        return TriangleMesh.from_numpy(v, np.asarray(f, np.int32))

    def test_pbr_renders_and_differs_from_flat(self):
        from threecrate_tpu.viz import render_mesh_pbr
        m = self._sphere_mesh()
        img_pbr = render_mesh_pbr(m, width=160, height=120)
        img_flat = render_mesh(m, width=160, height=120)
        assert img_pbr.shape == (120, 160, 3)
        assert np.isfinite(img_pbr).all()
        assert 0.05 < coverage(img_pbr) < 0.95
        # a different shading model must produce a different image
        assert np.abs(img_pbr - img_flat).max() > 0.05

    def test_pbr_smooth_normals_gradient(self):
        """Per-pixel interpolated normals on a sphere shade smoothly:
        many distinct intensity levels (flat per-face shading shows
        few)."""
        from threecrate_tpu.viz import render_mesh_pbr
        img = render_mesh_pbr(self._sphere_mesh(), width=160, height=120)
        lit = img[np.abs(img - BG).max(-1) > 0.02]
        assert np.unique(np.round(lit[:, 0], 2)).size > 20

    def test_material_params_have_effect(self):
        from threecrate_tpu.viz import PbrMaterial, render_mesh_pbr
        m = self._sphere_mesh()
        shiny = render_mesh_pbr(m, width=120, height=90,
                                material=PbrMaterial(metallic=0.9,
                                                     roughness=0.1))
        rough = render_mesh_pbr(m, width=120, height=90,
                                material=PbrMaterial(metallic=0.0,
                                                     roughness=0.9))
        assert np.abs(shiny - rough).max() > 0.05

    def test_emission_adds_light(self):
        from threecrate_tpu.viz import PbrMaterial, render_mesh_pbr
        m = self._sphere_mesh()
        dark = render_mesh_pbr(m, width=80, height=60,
                               material=PbrMaterial())
        glow = render_mesh_pbr(m, width=80, height=60,
                               material=PbrMaterial(
                                   emission=(0.5, 0.5, 0.5)))
        mask = np.abs(dark - BG).max(-1) > 0.02
        assert glow[mask].mean() > dark[mask].mean() + 0.05

    def test_render_to_texture_modes(self, tmp_path):
        from threecrate_tpu.viz import render_to_texture, save_image
        m = self._sphere_mesh(12)
        img_p = render_to_texture(m, width=80, height=60,
                                  shading_mode="pbr")
        img_f = render_to_texture(m, width=80, height=60,
                                  shading_mode="flat")
        assert img_p.shape == img_f.shape == (60, 80, 3)
        p = tmp_path / "pbr.png"
        save_image(p, img_p)
        assert p.read_bytes()[:4] == b"\x89PNG"
        import pytest
        with pytest.raises(ValueError):
            render_to_texture(m, shading_mode="wireframe")
