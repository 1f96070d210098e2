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
