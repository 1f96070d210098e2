"""Capsule/cylinder/convex-hull shapes and hinge joints (reference: Jolt shape set +
joint limit/drive defs, src/physics/PhysicsTypes.h:57-120). Property-style: resting
stability, penetration resolution, limit enforcement, motor drive — all deterministic."""

import numpy as np

from mesheditor_tpu.physics.types import (
    PhysicsMotion, ShapeBox, ShapeCapsule, ShapeConvexHull, ShapeCylinder, ShapePlane,
    ShapeSphere,
)
from mesheditor_tpu.physics.world import PhysicsWorld, _hull_mesh, _segment_closest


class TestSegmentClosest:
    def test_parallel_segments(self):
        p, q = _segment_closest(np.array([0.0, 0, 0]), np.array([1.0, 0, 0]),
                                np.array([0.0, 1, 0]), np.array([1.0, 1, 0]))
        assert abs(np.linalg.norm(p - q) - 1.0) < 1e-12

    def test_crossing_segments(self):
        p, q = _segment_closest(np.array([-1.0, 0, 0]), np.array([1.0, 0, 0]),
                                np.array([0.0, -1, 0.5]), np.array([0.0, 1, 0.5]))
        assert abs(np.linalg.norm(p - q) - 0.5) < 1e-12

    def test_degenerate_point(self):
        p, q = _segment_closest(np.array([0.0, 0, 0]), np.array([0.0, 0, 0]),
                                np.array([3.0, 4, 0]), np.array([3.0, 4, 0]))
        assert abs(np.linalg.norm(p - q) - 5.0) < 1e-12


class TestHullMesh:
    def test_cube_hull(self):
        pts = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
                       np.float64)
        verts, tris = _hull_mesh(pts)
        assert verts.shape[0] == 8
        # Outward winding: every face normal points away from the center.
        for t in tris:
            a, b, c = verts[t]
            n = np.cross(b - a, c - a)
            assert n @ ((a + b + c) / 3) > 0

    def test_interior_points_dropped(self):
        pts = np.concatenate([
            np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)]),
            np.zeros((5, 3)),
        ])
        verts, _ = _hull_mesh(pts)
        assert verts.shape[0] == 8


class TestCapsule:
    def test_capsule_rests_on_plane(self):
        w = PhysicsWorld()
        w.add_body(ShapePlane())
        # Lying capsule (axis along x): rotate local y to world x.
        q = np.array([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)])
        h = w.add_body(ShapeCapsule(radius=0.2, half_height=0.4),
                       position=(0, 0.3, 0), quat=q, motion=PhysicsMotion(mass=1.0))
        for _ in range(480):
            w.step()
        pos, _ = w.bodies[h].pos, w.bodies[h].quat
        assert abs(pos[1] - 0.2) < 0.02  # resting at radius height
        assert np.linalg.norm(w.bodies[h].vel) < 0.05

    def test_capsule_sphere_contact(self):
        w = PhysicsWorld()
        w.add_body(ShapePlane())
        cap = w.add_body(ShapeCapsule(0.2, 0.4), position=(0, 0.65, 0),
                         motion=PhysicsMotion(mass=1.0))
        sph = w.add_body(ShapeSphere(0.2), position=(0.05, 1.8, 0),
                         motion=PhysicsMotion(mass=0.5), report_contacts=True)
        hit = False
        for _ in range(480):
            w.step()
            if any({i.body_a, i.body_b} == {cap, sph} for i in w.impacts):
                hit = True
            w.impacts.clear()
        assert hit

    def test_capsule_capsule_separation(self):
        w = PhysicsWorld()
        a = w.add_body(ShapeCapsule(0.3, 0.5), position=(0, 0, 0),
                       motion=PhysicsMotion(mass=1.0, gravity_factor=0.0))
        b = w.add_body(ShapeCapsule(0.3, 0.5), position=(0.4, 0, 0),
                       motion=PhysicsMotion(mass=1.0, gravity_factor=0.0))
        for _ in range(240):
            w.step()
        d = np.linalg.norm(w.bodies[a].pos - w.bodies[b].pos)
        assert d > 0.55  # pushed apart toward the 0.6 contact distance

    def test_capsule_box_rest(self):
        w = PhysicsWorld()
        w.add_body(ShapeBox((2.0, 0.25, 2.0)), position=(0, -0.25, 0), static=True)
        cap = w.add_body(ShapeCapsule(0.15, 0.3),
                         quat=np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]),
                         position=(0, 0.5, 0), motion=PhysicsMotion(mass=1.0))
        for _ in range(600):
            w.step()
        assert abs(w.bodies[cap].pos[1] - 0.15) < 0.03

    def test_capsule_mass_between_cylinder_and_sphere_bounds(self):
        w = PhysicsWorld()
        h = w.add_body(ShapeCapsule(0.1, 0.2), position=(0, 5, 0),
                       motion=PhysicsMotion(mass=0.0))
        m = 1.0 / w.bodies[h].inv_mass
        vol = np.pi * 0.01 * 0.4 + 4 / 3 * np.pi * 0.001
        assert abs(m - 1000 * vol) < 1e-9


class TestCylinderAndHull:
    def test_cylinder_rests_upright(self):
        w = PhysicsWorld()
        w.add_body(ShapePlane())
        cyl = w.add_body(ShapeCylinder(radius=0.3, half_height=0.25),
                         position=(0, 0.5, 0), motion=PhysicsMotion(mass=2.0))
        for _ in range(600):
            w.step()
        b = w.bodies[cyl]
        assert abs(b.pos[1] - 0.25) < 0.03
        up = np.array([0.0, 1.0, 0.0])
        from mesheditor_tpu.physics.world import _quat_rotate

        axis = _quat_rotate(b.quat, up)
        assert axis @ up > 0.99  # did not tip over

    def test_cylinder_inertia_exact(self):
        w = PhysicsWorld()
        cyl = w.add_body(ShapeCylinder(radius=0.3, half_height=0.25),
                         position=(0, 5, 0), motion=PhysicsMotion(mass=2.0))
        inert = np.linalg.inv(w.bodies[cyl].inv_inertia_local)
        iy = 2.0 * 0.09 / 2
        ix = 2.0 * (3 * 0.09 + 4 * 0.0625) / 12
        assert np.allclose(np.diag(inert), [ix, iy, ix], rtol=1e-12)

    def test_convex_hull_falls_and_rests(self):
        rng = np.random.default_rng(3)
        pts = rng.standard_normal((40, 3)) * 0.2
        w = PhysicsWorld()
        w.add_body(ShapePlane())
        h = w.add_body(ShapeConvexHull(pts), position=(0, 1.0, 0),
                       motion=PhysicsMotion(mass=1.0))
        for _ in range(720):
            w.step()
        b = w.bodies[h]
        assert 0.0 < b.pos[1] < 0.5
        assert np.linalg.norm(b.vel) < 0.1

    def test_hull_mass_from_volume(self):
        pts = np.array([[x, y, z] for x in (-0.1, 0.1) for y in (-0.1, 0.1)
                        for z in (-0.1, 0.1)])
        w = PhysicsWorld()
        h = w.add_body(ShapeConvexHull(pts), position=(0, 5, 0),
                       motion=PhysicsMotion(mass=0.0))
        m = 1.0 / w.bodies[h].inv_mass
        assert abs(m - 1000 * 0.008) < 1e-6


class TestHinge:
    def _pendulum(self, **hinge_kw):
        w = PhysicsWorld()
        anchor_body = w.add_body(ShapeSphere(0.05), position=(0, 2, 0), static=True)
        bob = w.add_body(ShapeSphere(0.1), position=(0.5, 2, 0),
                         motion=PhysicsMotion(mass=1.0, linear_damping=0.0,
                                              angular_damping=0.0))
        jid = w.add_hinge_joint(anchor_body, bob, world_anchor=(0, 2, 0),
                                world_axis=(0, 0, 1), **hinge_kw)
        return w, bob, jid

    def test_hinge_keeps_anchor(self):
        w, bob, _ = self._pendulum()
        for _ in range(480):
            w.step()
        d = np.linalg.norm(w.bodies[bob].pos - np.array([0, 2, 0]))
        assert abs(d - 0.5) < 0.05  # rod length preserved by the point constraint

    def test_hinge_swings_in_plane(self):
        w, bob, _ = self._pendulum()
        for _ in range(480):
            w.step()
        assert abs(w.bodies[bob].pos[2]) < 0.02  # motion confined to the hinge plane

    def test_hinge_limit_holds(self):
        w, bob, jid = self._pendulum(limit_min=-0.4, limit_max=0.4)
        for _ in range(960):
            w.step()
        angle = w.hinge_angle(jid)
        assert -0.6 < angle < 0.6  # limit enforced (soft overshoot allowed)

    def test_hinge_motor_spins(self):
        w, bob, jid = self._pendulum(motor_velocity=2.0, motor_max_torque=50.0)
        a0 = w.hinge_angle(jid)
        for _ in range(240):
            w.step()
        # The motor drives relative rotation about the axis.
        rel = w.bodies[bob].ang[2]
        assert abs(rel) > 0.5


class TestShapeRoundtrip:
    def test_capsule_cylinder_convex_gltf_roundtrip(self, tmp_path):
        from mesheditor_tpu.io.gltf import export_gltf, import_gltf
        from mesheditor_tpu.mesh import icosphere_surface
        from mesheditor_tpu.scene.components import MeshSurface, RigidBodyComponent
        from mesheditor_tpu.scene.registry import Registry

        r = Registry()
        cap = r.create()
        r.emplace(cap, RigidBodyComponent(shape_kind="capsule", radius=0.2,
                                          half_height=0.7, is_dynamic=True, mass=2.0))
        cyl = r.create()
        r.emplace(cyl, RigidBodyComponent(shape_kind="cylinder", radius=0.4,
                                          half_height=0.3, is_dynamic=True))
        cvx = r.create()
        pos, tris = icosphere_surface(1)
        r.emplace(cvx, MeshSurface(positions=pos, triangles=np.asarray(tris, np.uint32)))
        r.emplace(cvx, RigidBodyComponent(shape_kind="convex", is_dynamic=True))
        p = tmp_path / "shapes.gltf"
        export_gltf(r, p)
        r2 = import_gltf(p)
        kinds = {rb.shape_kind: rb for _, rb in r2.view(RigidBodyComponent)}
        assert set(kinds) == {"capsule", "cylinder", "convex"}
        assert abs(kinds["capsule"].radius - 0.2) < 1e-12
        assert abs(kinds["capsule"].half_height - 0.7) < 1e-12
        assert abs(kinds["cylinder"].radius - 0.4) < 1e-12
        assert abs(kinds["cylinder"].half_height - 0.3) < 1e-12

    def test_scene_build_constructs_new_shapes(self):
        from mesheditor_tpu.mesh import icosphere_surface
        from mesheditor_tpu.physics.scene_build import build_world
        from mesheditor_tpu.scene.components import MeshSurface, RigidBodyComponent
        from mesheditor_tpu.scene.derive import install_default_pipeline
        from mesheditor_tpu.scene.registry import Registry

        r = Registry()
        install_default_pipeline(r)
        cap = r.create()
        r.emplace(cap, RigidBodyComponent(shape_kind="capsule", radius=0.2,
                                          half_height=0.4, is_dynamic=True, mass=1.0))
        cvx = r.create()
        pos, tris = icosphere_surface(1)
        r.emplace(cvx, MeshSurface(positions=pos, triangles=np.asarray(tris, np.uint32)))
        r.emplace(cvx, RigidBodyComponent(shape_kind="convex", is_dynamic=True, mass=1.0))
        r.process()
        world, emap = build_world(r)
        assert len(world.bodies) == 2
        for _ in range(10):
            world.step()  # steps without error
