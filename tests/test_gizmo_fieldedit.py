"""Transform/orientation gizmo math (reference: src/gizmo/TransformGizmo,
OrientationGizmo) and the reflection-driven field-edit kit (src/ui/FieldEdit.h)."""

import numpy as np

from mesheditor_tpu.render import Camera
from mesheditor_tpu.render.gizmo import (
    GizmoDrag, Handle, orientation_axes, pick_handle, ray_through_pixel, snap_view,
)
from mesheditor_tpu.scene.components import AcousticMaterialRef, Transform
from mesheditor_tpu.scene.field_edit import describe_entity, edit_field, editable_fields
from mesheditor_tpu.scene.registry import Registry


def _cam():
    return Camera(eye=np.array([0.0, 0.0, 5.0]), target=np.zeros(3), near=0.1, far=50.0)


class TestRays:
    def test_center_pixel_ray_hits_target(self):
        cam = _cam()
        o, d = ray_through_pixel(cam, 65, 65, 32, 32)
        # Ray passes within a half-pixel of the origin (the look target).
        t = -(o @ d) / (d @ d)
        assert np.linalg.norm(o + t * d) < 0.01

    def test_ray_direction_points_away_from_eye(self):
        cam = _cam()
        o, d = ray_through_pixel(cam, 64, 64, 10, 50)
        assert d[2] < 0  # toward the scene from +z


class TestGizmoDrag:
    def _drag(self, handle, px_from, px_to, w=200, h=200):
        cam = _cam()
        t0 = Transform()
        drag = GizmoDrag(handle, t0, ray_through_pixel(cam, w, h, *px_from))
        return drag.update(ray_through_pixel(cam, w, h, *px_to))

    def test_translate_along_x_moves_only_x(self):
        t = self._drag(Handle("translate", 0), (120, 100), (150, 100))
        assert t.translation[0] > 0.1
        assert abs(t.translation[1]) < 1e-9 and abs(t.translation[2]) < 1e-9

    def test_translate_plane_moves_in_plane(self):
        # Plane handle with normal z: dragging diagonally moves x and y, never z.
        t = self._drag(Handle("translate", 2, plane=True), (110, 110), (140, 80))
        assert abs(t.translation[2]) < 1e-9
        assert t.translation[0] > 0.05 and t.translation[1] > 0.05

    def test_rotate_about_z_changes_rotation_only(self):
        t = self._drag(Handle("rotate", 2), (150, 100), (100, 40))
        w, x, y, z = t.rotation
        assert abs(np.linalg.norm(t.rotation) - 1) < 1e-9
        assert abs(x) < 1e-9 and abs(y) < 1e-9 and abs(z) > 0.05
        assert np.allclose(t.translation, 0) and np.allclose(t.scale, 1)

    def test_scale_axis_scales_that_axis(self):
        t = self._drag(Handle("scale", 0), (120, 100), (160, 100))
        assert t.scale[0] > 1.2
        assert abs(t.scale[1] - 1) < 1e-9 and abs(t.scale[2] - 1) < 1e-9

    def test_drag_is_relative_not_absolute(self):
        # Returning to the grab pixel returns the original transform.
        t = self._drag(Handle("translate", 0), (130, 100), (130, 100))
        assert np.allclose(t.translation, 0, atol=1e-12)


class TestPickHandle:
    def test_pick_x_axis_tip(self):
        cam = _cam()
        from mesheditor_tpu.render.camera import view_projection
        from mesheditor_tpu.render.raster import project_points, screen_coords

        mvp = view_projection(cam, 200, 200)
        tip_px = screen_coords(np.asarray(project_points(
            mvp, np.array([[0.9, 0.0, 0.0]]))), 200, 200)[0]
        h = pick_handle(cam, 200, 200, tip_px[0], tip_px[1], (0, 0, 0), "translate")
        assert h is not None and h.axis == 0 and not h.plane

    def test_miss_returns_none(self):
        cam = _cam()
        assert pick_handle(cam, 200, 200, 5, 5, (0, 0, 0), "translate") is None

    def test_pick_rotation_ring(self):
        cam = _cam()
        from mesheditor_tpu.render.camera import view_projection
        from mesheditor_tpu.render.raster import project_points, screen_coords

        mvp = view_projection(cam, 200, 200)
        # A point on the z-ring (radius 0.8 in the xy plane).
        px = screen_coords(np.asarray(project_points(
            mvp, np.array([[0.8, 0.0, 0.0]]))), 200, 200)[0]
        h = pick_handle(cam, 200, 200, px[0], px[1], (0, 0, 0), "rotate")
        assert h is not None and h.mode == "rotate"


class TestOrientation:
    def test_axes_are_unit_screen_vectors(self):
        axes = orientation_axes(_cam())
        assert set(axes) == {"+x", "-x", "+y", "-y", "+z", "-z"}
        for k in ("+x", "+y"):
            assert abs(np.linalg.norm(axes[k]) - 1) < 1e-9
        # From a front view, +x points right and +y points up (y-down pixels).
        assert axes["+x"][0] > 0.9
        assert axes["+y"][1] < -0.9

    def test_snap_view_looks_down_axis(self):
        cam = snap_view(_cam(), "+x")
        d = np.asarray(cam.target) - np.asarray(cam.eye)
        d = d / np.linalg.norm(d)
        assert np.allclose(d, [-1, 0, 0], atol=1e-12)
        cam_y = snap_view(_cam(), "-y")
        d = np.asarray(cam_y.target) - np.asarray(cam_y.eye)
        assert abs(abs(d[1]) - np.linalg.norm(d)) < 1e-9


class TestFieldEdit:
    def test_editable_fields_with_limits(self):
        rows = editable_fields(AcousticMaterialRef())
        by_name = {r["name"]: r for r in rows}
        assert by_name["density"]["limits"] == (1.0, 30_000.0)
        assert by_name["density"]["kind"] == "float"
        assert by_name["name"]["kind"] == "str"

    def test_edit_clamps_through_action(self):
        r = Registry()
        e = r.create()
        r.emplace(e, AcousticMaterialRef())
        edit_field(r, e, AcousticMaterialRef, "density", 1e9)
        assert r.get(e, AcousticMaterialRef).density == 30_000.0

    def test_describe_entity(self):
        r = Registry()
        e = r.create()
        r.emplace(e, AcousticMaterialRef())
        r.emplace(e, Transform())
        desc = describe_entity(r, e)
        assert "AcousticMaterialRef" in desc
        # Transform's vec fields are editable as vec3/vec4 rows.
        kinds = {row["kind"] for row in desc.get("Transform", [])}
        assert kinds <= {"vec3", "vec4"} and kinds
