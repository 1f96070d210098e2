"""KHR_physics_rigid_bodies + KHR_implicit_shapes interchange and world building
(reference: GltfScene.cpp:1664-1775 import, :4150-4180 export)."""

import json

import numpy as np

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu.io.gltf import export_gltf, import_gltf
from mesheditor_tpu.physics.scene_build import build_world, write_back_poses
from mesheditor_tpu.scene.components import Name, RigidBodyComponent, Transform
from mesheditor_tpu.scene.registry import Registry


def physics_scene():
    reg = Registry()
    floor = reg.create()
    reg.emplace(floor, Name("floor"))
    reg.emplace(floor, RigidBodyComponent(shape_kind="plane",
                                          plane_normal=np.array([0.0, 1.0, 0.0])))
    ball = reg.create()
    reg.emplace(ball, Name("ball"))
    reg.emplace(ball, Transform(translation=np.array([0.0, 1.0, 0.0])))
    reg.emplace(ball, RigidBodyComponent(
        shape_kind="sphere", radius=0.1, is_dynamic=True, mass=2.0,
        linear_velocity=np.array([0.3, 0.0, 0.0])))
    crate = reg.create()
    reg.emplace(crate, Name("crate"))
    reg.emplace(crate, Transform(translation=np.array([1.0, 0.2, 0.0])))
    reg.emplace(crate, RigidBodyComponent(
        shape_kind="box", half_extents=np.array([0.2, 0.2, 0.2]), is_dynamic=True,
        mass=5.0))
    return reg, floor, ball, crate


class TestPhysicsExtension:
    def test_roundtrip(self, tmp_path):
        reg, floor, ball, crate = physics_scene()
        path = tmp_path / "scene.gltf"
        export_gltf(reg, path)

        doc = json.loads(path.read_text())
        shapes = doc["extensions"]["KHR_implicit_shapes"]["shapes"]
        assert {s["type"] for s in shapes} == {"plane", "sphere", "box"}
        assert "KHR_physics_rigid_bodies" in doc["extensionsUsed"]
        assert shapes[[s["type"] for s in shapes].index("box")]["box"]["size"] == [0.4, 0.4, 0.4]

        r2 = import_gltf(path)
        bodies = dict(r2.view(RigidBodyComponent))
        assert len(bodies) == 3
        by_name = {r2.get(e, Name).value: rb for e, rb in bodies.items()}
        assert by_name["floor"].shape_kind == "plane" and not by_name["floor"].is_dynamic
        b = by_name["ball"]
        assert b.shape_kind == "sphere" and abs(b.radius - 0.1) < 1e-12
        assert b.is_dynamic and abs(b.mass - 2.0) < 1e-12
        np.testing.assert_allclose(b.linear_velocity, [0.3, 0.0, 0.0])
        np.testing.assert_allclose(by_name["crate"].half_extents, [0.2, 0.2, 0.2])

    def test_imported_scene_simulates(self, tmp_path):
        reg, *_ = physics_scene()
        path = tmp_path / "scene.glb"
        export_gltf(reg, path)
        r2 = import_gltf(path)
        world, handles = build_world(r2)
        assert len(handles) == 3
        for _ in range(240):  # one second
            world.step()
        write_back_poses(r2, world, handles)
        by_name = {r2.get(e, Name).value: e for e, _ in r2.view(RigidBodyComponent)}
        ball_t = r2.get(by_name["ball"], Transform)
        # The ball fell from 1 m and rests on the plane (radius above it), having
        # drifted along its initial velocity.
        assert 0.05 < ball_t.translation[1] < 0.3
        assert ball_t.translation[0] > 0.1
        crate_t = r2.get(by_name["crate"], Transform)
        assert 0.1 < crate_t.translation[1] < 0.35  # settled near half-extent height

    def test_mesh_collider_roundtrip_and_simulation(self, tmp_path):
        from mesheditor_tpu.mesh import grid_box_surface
        from mesheditor_tpu.scene.components import MeshSurface

        reg = Registry()
        slab = reg.create()
        reg.emplace(slab, Name("slab"))
        pts, tris = grid_box_surface(3)
        pts = pts * np.array([2.0, 0.2, 2.0])
        reg.emplace(slab, MeshSurface(positions=pts, triangles=tris))
        reg.emplace(slab, RigidBodyComponent(shape_kind="mesh"))
        ball = reg.create()
        reg.emplace(ball, Name("ball"))
        reg.emplace(ball, Transform(translation=np.array([0.7, 1.0, 0.7])))
        reg.emplace(ball, RigidBodyComponent(shape_kind="sphere", radius=0.05,
                                             is_dynamic=True, mass=0.5))
        path = tmp_path / "terrain.glb"
        export_gltf(reg, path)
        r2 = import_gltf(path)
        by_name = {r2.get(e, Name).value: (e, rb) for e, rb in r2.view(RigidBodyComponent)}
        assert by_name["slab"][1].shape_kind == "mesh"

        world, handles = build_world(r2)
        for _ in range(480):
            world.step()
        p = world.bodies[handles[by_name["ball"][0]]].pos
        # The slab spans [0,1]^3 scaled: its top sits at y=0.2; the ball rests a
        # radius above it.
        assert abs(p[1] - 0.25) < 0.02, p
