"""Physics debug-draw overlays (reference: src/physics/PhysicsDebugDraw)."""

import numpy as np

from mesheditor_tpu.physics.types import (
    PhysicsMotion, ShapeBox, ShapeCapsule, ShapePlane, ShapeSphere,
)
from mesheditor_tpu.physics.world import PhysicsWorld
from mesheditor_tpu.render import Camera
from mesheditor_tpu.render.debug_draw import (
    draw_physics_debug, draw_segments, shape_segments, world_segments,
)


def _cam():
    return Camera(eye=np.array([0.0, 1.0, 4.0]), target=np.zeros(3), near=0.1, far=50.0)


class TestShapeSegments:
    def _world(self):
        w = PhysicsWorld()
        w.add_body(ShapePlane())
        w.add_body(ShapeSphere(0.4), position=(0, 1, 0), motion=PhysicsMotion(mass=1.0))
        w.add_body(ShapeBox((0.3, 0.2, 0.25)), position=(1, 1, 0),
                   motion=PhysicsMotion(mass=1.0))
        w.add_body(ShapeCapsule(0.15, 0.3), position=(-1, 1, 0),
                   motion=PhysicsMotion(mass=1.0))
        return w

    def test_every_shape_produces_segments(self):
        w = self._world()
        segs = world_segments(w)
        assert len(segs) == 4
        for _, s in segs:
            assert s.shape[1:] == (2, 3) and s.shape[0] > 0
            assert np.isfinite(s).all()

    def test_sphere_segments_on_sphere(self):
        w = PhysicsWorld()
        h = w.add_body(ShapeSphere(0.5), position=(2, 3, 4),
                       motion=PhysicsMotion(mass=1.0))
        segs = shape_segments(w.bodies[h])
        d = np.linalg.norm(segs.reshape(-1, 3) - [2, 3, 4], axis=1)
        assert np.allclose(d, 0.5, atol=1e-9)

    def test_box_has_12_edges(self):
        w = PhysicsWorld()
        h = w.add_body(ShapeBox((0.3, 0.2, 0.25)), motion=PhysicsMotion(mass=1.0))
        assert shape_segments(w.bodies[h]).shape[0] == 12

    def test_overlay_marks_pixels(self):
        w = self._world()
        img = np.zeros((60, 80, 3))
        out = draw_physics_debug(img, w, _cam())
        assert out.shape == img.shape
        assert (out != img).any()          # wireframes drew something
        assert (img == 0).all()            # input untouched (copy semantics)

    def test_contacts_marked(self):
        w = PhysicsWorld()
        w.add_body(ShapePlane())
        w.add_body(ShapeSphere(0.4), position=(0, 0.35, 0),
                   motion=PhysicsMotion(mass=1.0), report_contacts=True)
        for _ in range(480):
            w.step()
            if w.sustained:
                break
        assert w.sustained  # resting contact is level-triggered present
        base = np.zeros((60, 80, 3))
        with_c = draw_physics_debug(base, w, _cam(), draw_contacts=True)
        without = draw_physics_debug(base, w, _cam(), draw_contacts=False)
        assert (with_c != without).any()

    def test_behind_camera_segments_dropped(self):
        cam = _cam()
        seg = np.array([[[0, 1, 20.0], [1, 1, 20.0]]])  # behind the z=4 camera
        img = np.zeros((40, 40, 3))
        out = draw_segments(img, seg, cam)
        assert (out == 0).all()
