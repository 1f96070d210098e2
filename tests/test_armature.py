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
