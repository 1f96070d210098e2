"""Armature: pose composition and linear-blend skinning vs closed-form rigid motion."""

import numpy as np

from mesheditor_tpu.scene.armature import Armature, Pose, Skin, skin_positions


def two_bone_chain():
    a = Armature()
    root = a.add_bone("root", -1, translation=(0, 0, 0))
    tip = a.add_bone("tip", root, translation=(1.0, 0, 0))
    return a, root, tip


class TestArmature:
    def test_rest_world_composes(self):
        a, root, tip = two_bone_chain()
        rest = a.rest_world()
        assert np.allclose(rest[root][:3, 3], [0, 0, 0])
        assert np.allclose(rest[tip][:3, 3], [1, 0, 0])

    def test_pose_rotation_moves_children(self):
        a, root, tip = two_bone_chain()
        pose = Pose.rest(2)
        # Rotate the root 90 degrees about z: the tip should move to (0, 1, 0).
        pose.rotation[root] = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]
        world = a.pose_world(pose)
        assert np.allclose(world[tip][:3, 3], [0, 1, 0], atol=1e-12)

    def test_rest_pose_is_identity_deform(self):
        a, root, tip = two_bone_chain()
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 2, (50, 3))
        joints = np.zeros((50, 4), np.int64)
        joints[:, 1] = 1
        weights = np.zeros((50, 4))
        weights[:, 0] = 0.5
        weights[:, 1] = 0.5
        skin = Skin.bind(a, joints, weights)
        out = skin_positions(skin, a.rest_world(), pts)
        assert np.allclose(out, pts, atol=1e-12)

    def test_rigidly_bound_vertices_follow_bone(self):
        a, root, tip = two_bone_chain()
        pts = np.array([[1.0, 0.0, 0.0], [1.5, 0.0, 0.0]])
        joints = np.full((2, 4), tip, np.int64)
        weights = np.zeros((2, 4))
        weights[:, 0] = 1.0
        skin = Skin.bind(a, joints, weights)
        pose = Pose.rest(2)
        pose.rotation[root] = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]  # 90 deg z
        out = skin_positions(skin, a.pose_world(pose), pts)
        assert np.allclose(out[0], [0, 1, 0], atol=1e-12)
        assert np.allclose(out[1], [-0.0, 1.5, 0], atol=1e-12)

    def test_blended_vertex_interpolates(self):
        a, root, tip = two_bone_chain()
        pts = np.array([[1.0, 0.0, 0.0]])
        joints = np.array([[root, tip, 0, 0]])
        weights = np.array([[0.5, 0.5, 0, 0]])
        skin = Skin.bind(a, joints, weights)
        pose = Pose.rest(2)
        pose.translation[tip] = [0.0, 2.0, 0.0]  # push the tip up in its local frame
        out = skin_positions(skin, a.pose_world(pose), pts)
        assert np.allclose(out[0], [1.0, 1.0, 0.0], atol=1e-12)  # halfway


class TestEcsSkinning:
    """ECS wiring: ArmatureComponent pose drives DeformedSurface in the derivation
    pass, and the renderer prefers the deformed positions (reference: armature
    deform ranges in the frame pipeline, ArmatureComponents.h:14-52)."""

    def _skinned_scene(self):
        from mesheditor_tpu.scene.armature import (
            Armature, ArmatureComponent, DeformedSurface, Pose, make_skin_component,
        )
        from mesheditor_tpu.scene.components import MeshSurface
        from mesheditor_tpu.scene.derive import install_default_pipeline
        from mesheditor_tpu.scene.registry import Registry

        r = Registry()
        install_default_pipeline(r)
        arm_e = r.create()
        arm = Armature()
        arm.add_bone(name="root")
        arm.add_bone(name="tip", parent=0, translation=(0, 1, 0))
        r.emplace(arm_e, ArmatureComponent(armature=arm, pose=Pose.rest(2)))
        mesh_e = r.create()
        # A 2-segment strip: bottom verts bound to root, top verts to tip.
        pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float64)
        tris = np.array([[0, 1, 2], [1, 3, 2]], np.uint32)
        r.emplace(mesh_e, MeshSurface(positions=pos, triangles=tris))
        joints = np.array([[0, 0, 0, 0], [0, 0, 0, 0], [1, 0, 0, 0], [1, 0, 0, 0]])
        weights = np.array([[1.0, 0, 0, 0]] * 4)
        r.emplace(mesh_e, make_skin_component(arm_e, arm, joints, weights))
        return r, arm_e, mesh_e

    def test_rest_pose_is_identity(self):
        from mesheditor_tpu.scene.armature import DeformedSurface
        from mesheditor_tpu.scene.components import MeshSurface

        r, arm_e, mesh_e = self._skinned_scene()
        r.process()
        d = r.get(mesh_e, DeformedSurface)
        assert d is not None
        assert np.allclose(d.positions, r.get(mesh_e, MeshSurface).positions, atol=1e-12)

    def test_pose_translates_bound_vertices(self):
        from mesheditor_tpu.scene.armature import ArmatureComponent, DeformedSurface

        r, arm_e, mesh_e = self._skinned_scene()
        ac = r.get(arm_e, ArmatureComponent)
        ac.pose.translation[1] = np.array([0.5, 0.0, 0.0])  # nudge the tip bone
        r.process()
        d = r.get(mesh_e, DeformedSurface).positions
        assert np.allclose(d[0], [0, 0, 0], atol=1e-12)       # root-bound untouched
        assert np.allclose(d[2], [0.5, 1.0, 0.0], atol=1e-12)  # tip-bound moved

    def test_renderer_uses_deformed_positions(self):
        from mesheditor_tpu.render import Camera, RenderSettings, render_scene
        from mesheditor_tpu.scene.armature import ArmatureComponent

        r, arm_e, mesh_e = self._skinned_scene()
        cam = Camera(eye=np.array([0.5, 0.5, 4.0]),
                     target=np.array([0.5, 0.5, 0.0]), near=0.1, far=20.0)
        base = render_scene(r, camera=cam, settings=RenderSettings(48, 48)).image()
        ac = r.get(arm_e, ArmatureComponent)
        ac.pose.translation[1] = np.array([1.5, 0.0, 0.0])
        posed = render_scene(r, camera=cam, settings=RenderSettings(48, 48)).image()
        assert not np.array_equal(base, posed)
