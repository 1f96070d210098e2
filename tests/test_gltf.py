"""glTF roundtrip: component-level equality after save -> load (the reference's
RoundtripTest discipline, tests/RoundtripTest.cpp)."""

import numpy as np
import pytest

from mesheditor_tpu.io.gltf import export_gltf, import_gltf
from mesheditor_tpu.mesh import icosphere_surface
from mesheditor_tpu.scene import (
    AddObject, Registry, SetAcousticMaterial, SetParent, SetTransform, apply_action,
)
from mesheditor_tpu.scene.components import (
    AcousticMaterialRef, MeshSurface, ModalModel, Name, SceneNode,
    SolveSettingsComponent, Transform,
)


def build_scene() -> Registry:
    r = Registry()
    apply_action(r, AddObject(name="bowl"))
    apply_action(r, AddObject(name="mallet"))
    apply_action(r, SetTransform(entity=1, translation=(0.1, 0.2, 0.3),
                                 rotation=(0.9238795, 0.0, 0.3826834, 0.0),
                                 scale=(2.0, 2.0, 2.0)))
    apply_action(r, SetParent(entity=2, parent=1))
    apply_action(r, SetAcousticMaterial(entity=1, name="Glass"))
    pts, tris = icosphere_surface(1)
    r.emplace(1, MeshSurface(positions=pts, triangles=tris))
    r.emplace(1, SolveSettingsComponent(num_modes=40, min_mode_freq=30.0))
    r.emplace(1, ModalModel(path="abcd1234.npz"))
    return r


@pytest.mark.parametrize("suffix", [".gltf", ".glb"])
class TestRoundtrip:
    def test_roundtrip(self, tmp_path, suffix):
        r = build_scene()
        path = tmp_path / f"scene{suffix}"
        export_gltf(r, path)
        r2 = import_gltf(path)

        names = {r2.get(e, Name).value for e in r2.entities()}
        assert names == {"bowl", "mallet"}
        bowl = next(e for e in r2.entities() if r2.get(e, Name).value == "bowl")
        mallet = next(e for e in r2.entities() if r2.get(e, Name).value == "mallet")

        t = r2.get(bowl, Transform)
        assert np.allclose(t.translation, [0.1, 0.2, 0.3])
        assert np.allclose(t.rotation, [0.9238795, 0.0, 0.3826834, 0.0], atol=1e-6)
        assert np.allclose(t.scale, 2.0)
        assert r2.get(mallet, SceneNode).parent == bowl

        mesh = r2.get(bowl, MeshSurface)
        pts, tris = icosphere_surface(1)
        assert np.allclose(mesh.positions, pts, atol=1e-6)  # f32 quantization
        assert np.array_equal(mesh.triangles, tris)

        mat = r2.get(bowl, AcousticMaterialRef)
        assert mat.name == "Glass"
        assert mat.young_modulus == 6.2e10

        ss = r2.get(bowl, SolveSettingsComponent)
        assert ss.num_modes == 40 and ss.min_mode_freq == 30.0
        assert r2.get(bowl, ModalModel).path == "abcd1234.npz"

    def test_double_roundtrip_stable(self, tmp_path, suffix):
        r = build_scene()
        p1 = tmp_path / f"a{suffix}"
        p2 = tmp_path / f"b{suffix}"
        export_gltf(r, p1)
        export_gltf(import_gltf(p1), p2)
        if suffix == ".glb":
            assert p1.read_bytes() == p2.read_bytes()


class TestMorphTargets:
    def test_morph_roundtrip_and_blend(self, tmp_path):
        from mesheditor_tpu.io.gltf import export_gltf, import_gltf
        from mesheditor_tpu.mesh import icosphere_surface
        from mesheditor_tpu.scene.components import MeshSurface
        from mesheditor_tpu.scene.registry import Registry

        pts, tris = icosphere_surface(1)
        bulge = pts * 0.3                    # target 0: inflate
        squash = pts * np.array([0, -0.5, 0])  # target 1: flatten y
        reg = Registry()
        e = reg.create()
        reg.emplace(e, MeshSurface(positions=pts, triangles=tris,
                                   morph_targets=np.stack([bulge, squash]),
                                   morph_weights=np.array([0.5, 0.25])))
        path = tmp_path / "morph.glb"
        export_gltf(reg, path)
        r2 = import_gltf(path)
        (e2,) = [x for x, _ in r2.view(MeshSurface)]
        m2 = r2.get(e2, MeshSurface)
        assert m2.morph_targets.shape == (2, pts.shape[0], 3)
        np.testing.assert_allclose(m2.morph_weights, [0.5, 0.25])
        expect = pts + 0.5 * bulge + 0.25 * squash
        np.testing.assert_allclose(m2.morphed_positions(), expect, atol=1e-6)

    def test_animated_morph_weights_drive_blend(self):
        from mesheditor_tpu.mesh import icosphere_surface
        from mesheditor_tpu.scene.animation import (
            AnimationChannel, AnimationClip, Interpolation, TargetPath, evaluate_clip,
        )
        from mesheditor_tpu.scene.components import MeshSurface
        from mesheditor_tpu.scene.registry import Registry

        pts, tris = icosphere_surface(1)
        reg = Registry()
        e = reg.create()
        surf = MeshSurface(positions=pts, triangles=tris,
                           morph_targets=pts[None] * 1.0,
                           morph_weights=np.zeros(1))
        reg.emplace(e, surf)
        clip = AnimationClip(channels=[AnimationChannel(
            entity=e, path=TargetPath.WEIGHTS,
            times=np.array([0.0, 1.0]), values=np.array([[0.0], [1.0]]),
            interpolation=Interpolation.LINEAR)])
        weights = evaluate_clip(reg, clip, 0.5)
        surf.morph_weights = weights[e]
        np.testing.assert_allclose(surf.morphed_positions(), pts * 1.5, atol=1e-9)
