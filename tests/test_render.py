"""Renderer + picking tests: depth correctness, shading modes, GPU-style selection,
and determinism — the reference's render-corpus discipline (README.md:184-197) carried
as self-comparing properties plus exact repeat-render equality."""

import numpy as np
import pytest

from mesheditor_tpu.render import (
    Camera, GBuffer, LightBank, MaterialTable, RenderSettings, box_select,
    box_select_vertices, look_at, orbit_camera, perspective, pick_element, pick_object,
    rasterize, render_mesh, render_scene, shade, view_projection,
)
from mesheditor_tpu.render.camera import frame_points
from mesheditor_tpu.render.raster import project_points
from mesheditor_tpu.render.scene_render import save_png
from mesheditor_tpu.render.shading import vertex_normals


def _quad(z, size=1.0, offset=(0.0, 0.0)):
    s = size / 2
    ox, oy = offset
    pos = np.array(
        [[-s + ox, -s + oy, z], [s + ox, -s + oy, z], [s + ox, s + oy, z],
         [-s + ox, s + oy, z]], np.float32
    )
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return pos, tris


def _front_camera(dist=3.0):
    return Camera(eye=np.array([0.0, 0.0, dist]), target=np.zeros(3), near=0.1, far=50.0)


class TestCamera:
    def test_look_at_target_projects_to_center(self):
        cam = Camera(eye=np.array([1.0, 2.0, 3.0]), target=np.array([0.2, -0.3, 0.1]))
        mvp = view_projection(cam, 64, 64)
        clip = np.asarray(project_points(mvp, cam.target[None, :]))[0]
        ndc = clip[:3] / clip[3]
        assert abs(ndc[0]) < 1e-5 and abs(ndc[1]) < 1e-5

    def test_depth_ordering_in_ndc(self):
        cam = _front_camera()
        mvp = view_projection(cam, 64, 64)
        near_pt = np.array([[0, 0, 1.0]])
        far_pt = np.array([[0, 0, -1.0]])
        zn = np.asarray(project_points(mvp, near_pt))[0]
        zf = np.asarray(project_points(mvp, far_pt))[0]
        assert zn[2] / zn[3] < zf[2] / zf[3]

    def test_frame_points_contains_cloud(self):
        pts = np.random.default_rng(0).standard_normal((64, 3)).astype(np.float32)
        cam = frame_points(pts)
        mvp = view_projection(cam, 64, 64)
        clip = np.asarray(project_points(mvp, pts))
        ndc = clip[:, :3] / clip[:, 3:4]
        assert np.all(np.abs(ndc[:, :2]) < 1.0)
        assert np.all(clip[:, 3] > 0)


class TestRaster:
    def test_front_quad_occludes_back(self):
        p0, t0 = _quad(z=1.0)     # nearer to the z=3 camera
        p1, t1 = _quad(z=-1.0)
        pos = np.concatenate([p0, p1])
        tris = np.concatenate([t0, t1 + 4])
        cam = _front_camera()
        clip = project_points(view_projection(cam, 32, 32), pos)
        gbuf = rasterize(clip, tris, 32, 32)
        center_tri = int(np.asarray(gbuf.tri)[16, 16])
        assert center_tri in (0, 1)  # front quad's triangles

    def test_background_is_minus_one(self):
        pos, tris = _quad(z=0.0, size=0.5)
        cam = _front_camera()
        gbuf = rasterize(project_points(view_projection(cam, 32, 32), pos), tris, 32, 32)
        tri = np.asarray(gbuf.tri)
        assert tri[0, 0] == -1 and tri[16, 16] >= 0

    def test_barycentrics_sum_to_one_where_covered(self):
        pos, tris = _quad(z=0.0)
        cam = _front_camera()
        gbuf = rasterize(project_points(view_projection(cam, 32, 32), pos), tris, 32, 32)
        covered = np.asarray(gbuf.tri) >= 0
        s = np.asarray(gbuf.bary).sum(-1)
        assert np.allclose(s[covered], 1.0, atol=1e-5)

    def test_empty_scene(self):
        gbuf = rasterize(np.zeros((0, 4)), np.zeros((0, 3), np.int32), 8, 8)
        assert np.all(np.asarray(gbuf.tri) == -1)

    def test_perspective_correct_interpolation(self):
        # A quad tilted in depth: the world midpoint (x=0 at the quad) must land where
        # perspective-correct barycentrics put it, not at the screen midpoint.
        pos = np.array([[-1, -1, 2.0], [1, -1, -6.0], [1, 1, -6.0], [-1, 1, 2.0]],
                       np.float32)
        tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        cam = _front_camera(dist=4.0)
        w = h = 65
        gbuf = rasterize(project_points(view_projection(cam, w, h), pos), tris, w, h)
        ys, xs = np.nonzero(np.asarray(gbuf.tri) >= 0)
        row = 32
        sel = ys == row
        assert sel.any()
        bary = np.asarray(gbuf.bary)
        tri_img = np.asarray(gbuf.tri)
        # Reconstruct world x at each covered pixel of the row; it must be monotonic
        # and hit x≈0 off-center (nearer the far side maps to fewer pixels).
        xs_row = np.sort(xs[sel])
        wx = []
        for x in xs_row:
            t = tri_img[row, x]
            b = bary[row, x]
            wx.append((pos[tris[t]][:, 0] * b).sum())
        wx = np.asarray(wx)
        assert np.all(np.diff(wx) > -1e-4)
        # Perspective-correct interpolation is nonlinear in screen space: the world-x
        # recovered at the middle pixel of the span must deviate clearly from the
        # screen-linear interpolation between the span endpoints (screen-space
        # barycentrics would make this difference ~0).
        mid = len(xs_row) // 2
        frac = (xs_row[mid] - xs_row[0]) / max(xs_row[-1] - xs_row[0], 1)
        linear_wx = wx[0] + frac * (wx[-1] - wx[0])
        assert abs(wx[mid] - linear_wx) > 0.1


class TestShading:
    def _render(self, mode="smooth"):
        pos, tris = _quad(z=0.0)
        return render_mesh(pos, tris, camera=_front_camera(),
                           settings=RenderSettings(width=32, height=32, mode=mode))

    def test_lit_quad_brighter_than_background(self):
        img = self._render()
        bg = img[0, 0]
        center = img[16, 16]
        assert center.mean() > bg.mean()

    def test_flat_and_smooth_agree_on_flat_geometry(self):
        flat = self._render("flat")
        smooth = self._render("smooth")
        assert np.allclose(flat, smooth, atol=1e-5)

    def test_flat_and_smooth_differ_on_curved_geometry(self):
        from mesheditor_tpu.mesh import icosphere_surface

        pos, tris = icosphere_surface(2)
        cam = frame_points(pos)
        s_flat = render_mesh(pos, tris, cam, RenderSettings(32, 32, "flat"))
        s_smooth = render_mesh(pos, tris, cam, RenderSettings(32, 32, "smooth"))
        assert not np.allclose(s_flat, s_smooth, atol=1e-3)

    def test_wireframe_overlay_marks_edges(self):
        plain = self._render("smooth")
        wire = self._render("wireframe")
        assert not np.allclose(plain, wire, atol=1e-3)

    def test_wireframe_only_background_interior(self):
        img = self._render("wireframe_only")
        # Interior pixels far from any edge are background-colored.
        assert np.allclose(img[0, 0], img[12, 16], atol=1e-5)

    def test_point_light_falls_off(self):
        pos, tris = _quad(z=0.0, size=4.0)
        normals = vertex_normals(pos, tris)
        cam = _front_camera()
        clip = project_points(view_projection(cam, 33, 33), pos)
        gbuf = rasterize(clip, tris, 33, 33)
        lights = LightBank.from_lists(
            kinds=[1], positions=[[1.2, 0.0, 0.5]], directions=[[0, 0, -1]],
            colors=[[3.0, 3.0, 3.0]],
        )
        img = np.asarray(shade(gbuf, pos, tris=tris, normals=normals,
                               tri_obj=np.zeros(2, np.int32),
                               materials=MaterialTable.default(1), lights=lights,
                               eye=cam.eye, ambient=(0, 0, 0)))
        mid = 16
        right = img[mid, 24].mean()   # nearer the light (light at +x)
        left = img[mid, 8].mean()
        assert right > left

    def test_deterministic_repeat(self):
        a = self._render()
        b = self._render()
        assert np.array_equal(a, b)


class TestPicking:
    def _two_quads(self):
        p0, t0 = _quad(z=0.0, size=0.8, offset=(-0.8, 0.0))
        p1, t1 = _quad(z=0.0, size=0.8, offset=(0.8, 0.0))
        pos = np.concatenate([p0, p1])
        tris = np.concatenate([t0, t1 + 4])
        tri_obj = np.array([0, 0, 1, 1], np.int32)
        cam = _front_camera()
        clip = project_points(view_projection(cam, 64, 64), pos)
        gbuf = rasterize(clip, tris, 64, 64)
        return pos, tris, tri_obj, gbuf, clip

    def test_pick_object(self):
        _, _, tri_obj, gbuf, _ = self._two_quads()
        assert pick_object(gbuf, tri_obj, 16, 32) == 0   # left quad
        assert pick_object(gbuf, tri_obj, 48, 32) == 1   # right quad
        assert pick_object(gbuf, tri_obj, 32, 4) == -1   # background

    def test_pick_elements(self):
        pos, tris, _, gbuf, _ = self._two_quads()
        face = pick_element(gbuf, tris, 16, 32, "face")
        assert face in (0, 1)
        vert = pick_element(gbuf, tris, 16, 32, "vertex")
        assert vert in tris[face]
        edge = pick_element(gbuf, tris, 16, 32, "edge")
        assert len(edge) == 2 and all(v in tris[face] for v in edge)
        assert pick_element(gbuf, tris, 32, 4, "face") is None

    def test_box_select(self):
        _, tris, tri_obj, gbuf, clip = self._two_quads()
        both = box_select(gbuf, tri_obj, 0, 0, 63, 63)
        assert list(both) == [0, 1]
        left_only = box_select(gbuf, tri_obj, 0, 16, 30, 48)
        assert list(left_only) == [0]
        none = box_select(gbuf, tri_obj, 28, 0, 36, 8)
        assert len(none) == 0

    def test_box_select_vertices(self):
        _, tris, _, gbuf, clip = self._two_quads()
        all_ids = box_select_vertices(clip, 64, 64, 0, 0, 63, 63, gbuf, tris)
        assert len(all_ids) == 8
        left = box_select_vertices(clip, 64, 64, 0, 0, 31, 63, gbuf, tris)
        assert set(left.tolist()) == {0, 1, 2, 3}


class TestSceneRender:
    def _scene(self):
        from mesheditor_tpu.scene.components import (
            LightComponent, MeshSurface, Transform, VisualMaterial,
        )
        from mesheditor_tpu.scene.registry import Registry
        from mesheditor_tpu.scene.derive import install_default_pipeline
        from mesheditor_tpu.mesh import icosphere_surface, cuboid_surface

        r = Registry()
        install_default_pipeline(r)
        e1 = r.create()
        pos, tris = icosphere_surface(1)
        r.emplace(e1, MeshSurface(positions=pos, triangles=np.asarray(tris, np.uint32)))
        r.emplace(e1, Transform(translation=np.array([-1.2, 0.0, 0.0])))
        r.emplace(e1, VisualMaterial(base_color=np.array([0.9, 0.2, 0.2, 1.0])))
        e2 = r.create()
        bpos, btris = cuboid_surface((0.5, 0.5, 0.5))
        r.emplace(e2, MeshSurface(positions=bpos, triangles=np.asarray(btris, np.uint32)))
        r.emplace(e2, Transform(translation=np.array([1.2, 0.0, 0.0])))
        r.emplace(e2, VisualMaterial(base_color=np.array([0.2, 0.9, 0.2, 1.0])))
        light = r.create()
        r.emplace(light, LightComponent(kind="directional", intensity=2.0))
        return r, e1, e2

    def test_render_and_pick_entities(self):
        r, e1, e2 = self._scene()
        cam = Camera(eye=np.array([0.0, 0.0, 5.0]), near=0.1, far=50.0)
        view = render_scene(r, camera=cam, settings=RenderSettings(width=96, height=64))
        img = view.image()
        assert img.shape == (64, 96, 3)
        assert np.isfinite(img).all()
        # The two objects are left/right of center; picking recovers entity ids.
        sphere_px = None
        cube_px = None
        tri_img = np.asarray(view.gbuf.tri)
        for (x, y) in [(24, 32), (20, 32), (28, 32)]:
            if tri_img[y, x] >= 0:
                sphere_px = (x, y)
                break
        for (x, y) in [(72, 32), (68, 32), (76, 32)]:
            if tri_img[y, x] >= 0:
                cube_px = (x, y)
                break
        assert sphere_px and cube_px
        assert view.pick_entity(*sphere_px) == e1
        assert view.pick_entity(*cube_px) == e2
        assert set(view.box_select_entities(0, 0, 95, 63)) == {e1, e2}

    def test_material_color_shows(self):
        r, e1, e2 = self._scene()
        cam = Camera(eye=np.array([0.0, 0.0, 5.0]), near=0.1, far=50.0)
        view = render_scene(r, camera=cam, settings=RenderSettings(width=96, height=64))
        img = view.image()
        tri_img = np.asarray(view.gbuf.tri)
        ys, xs = np.nonzero(tri_img >= 0)
        left = img[ys[xs < 48], xs[xs < 48]]
        right = img[ys[xs >= 48], xs[xs >= 48]]
        assert left[:, 0].mean() > left[:, 1].mean()    # red sphere
        assert right[:, 1].mean() > right[:, 0].mean()  # green cube

    def test_supersample_shape(self):
        r, _, _ = self._scene()
        view = render_scene(r, settings=RenderSettings(width=48, height=32, supersample=2))
        assert view.image().shape == (32, 48, 3)

    def test_mode_shape_coloring(self):
        from mesheditor_tpu.mesh import icosphere_surface

        pos, tris = icosphere_surface(1)
        vals = pos[:, 1]
        img = render_mesh(pos, tris, settings=RenderSettings(32, 32),
                          vertex_values=vals)
        assert img.shape == (32, 32, 3) and np.isfinite(img).all()

    def test_save_png_deterministic(self, tmp_path):
        r, _, _ = self._scene()
        view = render_scene(r, settings=RenderSettings(width=48, height=32))
        img = view.image()
        pa, pb = tmp_path / "a.png", tmp_path / "b.png"
        save_png(pa, img)
        save_png(pb, img)
        assert pa.read_bytes() == pb.read_bytes()


class TestHemisphereLight:
    def test_sky_brightens_up_faces(self):
        from mesheditor_tpu.mesh import cuboid_surface
        from mesheditor_tpu.scene.components import MeshSurface
        from mesheditor_tpu.scene.derive import install_default_pipeline
        from mesheditor_tpu.scene.registry import Registry

        r = Registry()
        install_default_pipeline(r)
        e = r.create()
        pos, tris = cuboid_surface((0.5, 0.5, 0.5))
        r.emplace(e, MeshSurface(positions=pos, triangles=np.asarray(tris, np.uint32)))
        cam = Camera(eye=np.array([1.5, 1.8, 2.2]), target=np.zeros(3), near=0.1,
                     far=20.0)
        base = render_scene(r, camera=cam, settings=RenderSettings(48, 48)).image()
        lit = render_scene(r, camera=cam, settings=RenderSettings(
            48, 48, sky=(0.6, 0.6, 0.7), ground=(0.05, 0.04, 0.03))).image()
        # The environment adds light; up-facing pixels gain the most.
        assert lit.mean() > base.mean()
        assert not np.array_equal(base, lit)


class TestNearPlaneClipping:
    def test_clip_near_fans(self):
        import numpy as np

        from mesheditor_tpu.render.raster import clip_near

        # One triangle with exactly one vertex behind the near plane -> quad fan (2 tris).
        clip = np.array([
            [0.0, 0.0, 0.0, 1.0],
            [1.0, 0.0, 0.0, 1.0],
            [0.0, 1.0, 0.0, -0.5],  # behind
        ])
        tris, src, new = clip_near(clip, np.array([[0, 1, 2]]))
        assert tris.shape[0] == 2 and new.shape[0] == 2
        assert set(src.tolist()) == {0}
        # New vertices interpolate on the crossing edges at w = eps.
        for pa, pb, t in new:
            w = clip[int(pa), 3] * (1 - t) + clip[int(pb), 3] * t
            assert abs(w - 1e-4) < 1e-12

    def test_camera_inside_scene_still_renders(self):
        import numpy as np

        from mesheditor_tpu.render import RenderSettings, render_scene
        from mesheditor_tpu.render.camera import Camera
        from mesheditor_tpu.scene.components import MeshSurface, Transform, VisualMaterial
        from mesheditor_tpu.scene.derive import install_default_pipeline
        from mesheditor_tpu.scene.registry import Registry
        from mesheditor_tpu.mesh import plane_surface

        r = Registry()
        install_default_pipeline(r)
        e = r.create()
        r.emplace(e, Transform())
        pts, tris = plane_surface((40.0, 40.0))
        floor = np.asarray(pts)[:, [0, 2, 1]]  # XZ floor
        r.emplace(e, MeshSurface(positions=floor, triangles=np.asarray(tris, np.uint32)))
        r.emplace(e, VisualMaterial(base_color=np.array([0.9, 0.2, 0.2, 1.0])))
        # Eye just above the floor, looking forward: the floor's triangles CROSS the
        # near plane. The reject-path renderer dropped them entirely.
        cam = Camera(eye=np.array([0.0, 0.5, 0.0]),
                     target=np.array([0.0, 0.0, -10.0]), near=0.1, far=100.0)
        settings = RenderSettings(width=96, height=64)
        view = render_scene(r, camera=cam, settings=settings)
        img = np.asarray(view.image())
        bg = np.asarray(settings.background)
        lit = (np.abs(img - bg[None, None, :]).max(-1) > 0.05).mean()
        assert lit > 0.3, f"floor through the near plane barely renders: {lit:.2f}"
        assert view.pick_entity(48, 60) == e  # bottom-center pixel is the floor


class TestEnvironmentIBL:
    @staticmethod
    def _sky_env():
        import numpy as np

        # Blue sky above, warm ground below, bright "sun" blob.
        h, w = 32, 64
        env = np.zeros((h, w, 3), np.float32)
        env[: h // 2] = (0.3, 0.5, 1.2)
        env[h // 2:] = (0.5, 0.35, 0.2)
        env[4:8, 10:14] = (40.0, 38.0, 30.0)
        return env

    def test_prefilter_levels_blur(self):
        import numpy as np

        from mesheditor_tpu.render.environment import prefilter_environment

        env = prefilter_environment(self._sky_env(), levels=4)
        spec = np.asarray(env.specular)
        assert spec.shape[0] == 4 and np.isfinite(spec).all()
        # Rougher levels spread the sun: the peak must fall monotonically.
        peaks = spec.max(axis=(1, 2, 3))
        assert peaks[0] > peaks[1] > peaks[2] > peaks[3]
        diff = np.asarray(env.diffuse)
        assert np.isfinite(diff).all() and diff.max() < peaks[0]

    def test_ibl_lights_the_scene_and_tracks_roughness(self):
        import numpy as np

        from mesheditor_tpu.mesh import icosphere_surface
        from mesheditor_tpu.render import RenderSettings, render_scene
        from mesheditor_tpu.scene.components import (
            MeshSurface, Transform, VisualMaterial,
        )
        from mesheditor_tpu.scene.derive import install_default_pipeline
        from mesheditor_tpu.scene.registry import Registry

        def scene(roughness):
            r = Registry()
            install_default_pipeline(r)
            e = r.create()
            r.emplace(e, Transform())
            pts, tris = icosphere_surface(2)
            r.emplace(e, MeshSurface(positions=np.asarray(pts),
                                     triangles=np.asarray(tris, np.uint32)))
            r.emplace(e, VisualMaterial(metallic=1.0, roughness=roughness,
                                        base_color=np.array([0.9, 0.9, 0.9, 1.0])))
            return r

        env = self._sky_env()
        s_dark = RenderSettings(width=96, height=64, ambient=(0, 0, 0))
        s_env = RenderSettings(width=96, height=64, ambient=(0, 0, 0), environment=env)
        dark = np.asarray(render_scene(scene(0.2), settings=s_dark).image())
        lit = np.asarray(render_scene(scene(0.2), settings=s_env).image())
        assert lit.mean() > dark.mean() + 0.02, "environment must light the metal"
        rough = np.asarray(render_scene(scene(0.95), settings=s_env).image())
        # A mirror sphere shows the sharp sun; a rough one spreads it out.
        assert lit.max() > rough.max() + 0.02
