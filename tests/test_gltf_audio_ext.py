"""KHR_audio_rigid_bodies interchange (reference: GltfScene.cpp:2415-2555, 4462-4552)."""

import json
import struct

import numpy as np

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu.io.gltf import export_gltf, import_gltf
from mesheditor_tpu.io.model_store import save_modal_model
from mesheditor_tpu.mesh import icosphere_surface
from mesheditor_tpu.scene.components import (
    AcousticMaterialRef, MeshSurface, ModalGainComponent, ModalModel, Name,
)
from mesheditor_tpu.scene.registry import Registry
from mesheditor_tpu.types import MassProperties, ModalModes


def synthetic_model(k=5, p=3, seed=0):
    rng = np.random.default_rng(seed)
    return ModalModes(
        freqs=np.linspace(400, 4000, k).astype(np.float32),
        t60s=np.linspace(0.8, 0.1, k).astype(np.float32),
        shapes=rng.standard_normal((p, k, 3)).astype(np.float32) * 0.01,
        positions=rng.standard_normal((p, 3)).astype(np.float32) * 0.05,
        indices=np.array([0, 1, 2], np.uint32),
    )


def scene_with_model(tmp_path):
    reg = Registry()
    e = reg.create()
    pts, tris = icosphere_surface(1)
    reg.emplace(e, Name("bowl"))
    reg.emplace(e, MeshSurface(positions=pts * 0.05, triangles=tris))
    reg.emplace(e, AcousticMaterialRef(name="Glass", density=2600.0,
                                       young_modulus=6.2e10, poisson_ratio=0.2,
                                       alpha=2.0, beta=2e-7))
    reg.emplace(e, ModalGainComponent(value=1.5))
    modes = synthetic_model()
    mass = MassProperties(mass=0.31, center_of_mass=np.array([0.0, 0.01, 0.0]),
                          inertia_diagonal=np.array([1e-4, 2e-4, 3e-4]))
    path = save_modal_model(tmp_path / "store", modes, mass)
    reg.emplace(e, ModalModel(path=str(path)))
    return reg, e, modes, mass


class TestAudioExtension:
    def test_glb_roundtrip_embeds_model(self, tmp_path):
        reg, e, modes, mass = scene_with_model(tmp_path)
        glb = tmp_path / "scene.glb"
        export_gltf(reg, glb)

        # The wire document carries the extension.
        raw = glb.read_bytes()
        jlen, _ = struct.unpack_from("<II", raw, 12)
        doc = json.loads(raw[20:20 + jlen])
        ext = doc["extensions"]["KHR_audio_rigid_bodies"]
        assert len(ext["modalModels"]) == 1 and len(ext["acousticMaterials"]) == 1
        assert ext["acousticMaterials"][0]["youngsModulus"] == 6.2e10
        assert "massProperties" in ext["modalModels"][0]
        assert "KHR_audio_rigid_bodies" in doc["extensionsUsed"]

        # Import into a machine with no prior store: the model travels in the file.
        r2 = import_gltf(glb, store_dir=tmp_path / "store2")
        (e2,) = [x for x, _ in r2.view(ModalModel)]
        mat = r2.get(e2, AcousticMaterialRef)
        assert mat.density == 2600.0 and abs(mat.poisson_ratio - 0.2) < 1e-12
        assert abs(r2.get(e2, ModalGainComponent).value - 1.5) < 1e-12
        from mesheditor_tpu.io.model_store import load_modal_model

        m2, mass2 = load_modal_model(r2.get(e2, ModalModel).path)
        np.testing.assert_allclose(m2.freqs, modes.freqs, rtol=1e-6)
        np.testing.assert_allclose(m2.t60s, modes.t60s, rtol=1e-5)
        np.testing.assert_allclose(m2.shapes, modes.shapes, rtol=1e-6)
        np.testing.assert_array_equal(m2.indices, modes.indices)
        assert abs(mass2.mass - 0.31) < 1e-9

    def test_imported_scene_plays_without_resolving(self, tmp_path):
        from mesheditor_tpu.scene.audio_sync import SceneAudio

        reg, e, modes, mass = scene_with_model(tmp_path)
        glb = tmp_path / "scene.glb"
        export_gltf(reg, glb)
        r2 = import_gltf(glb, store_dir=tmp_path / "store2")
        sa = SceneAudio(r2, tmp_path / "store2")
        report = sa.reconcile()
        assert report.loaded and not report.solved  # fingerprint honored, no eigensolve
        (e2,) = [x for x, _ in r2.view(ModalModel)]
        sa.strike(e2, 0, (0.1, 0.2, 0.05))
        out = np.asarray(sa.synth.render(2048))
        assert np.isfinite(out).all() and np.abs(out).max() > 0

    def test_invalid_material_and_model_fall_back(self, tmp_path, capfd):
        reg, e, modes, mass = scene_with_model(tmp_path)
        gltf_path = tmp_path / "scene.gltf"
        export_gltf(reg, gltf_path)
        doc = json.loads(gltf_path.read_text())
        ext = doc["extensions"]["KHR_audio_rigid_bodies"]
        ext["acousticMaterials"][0]["density"] = -5.0       # invalid -> Ceramic default
        valid_model = dict(ext["modalModels"][0])
        ext["modalModels"][0] = dict(valid_model, decayRates=9999)  # dangling accessor
        for node in doc["nodes"]:
            node.pop("extras", None)  # extension is the only source of truth here
        gltf_path.write_text(json.dumps(doc))

        r2 = import_gltf(gltf_path, store_dir=tmp_path / "store2")
        err = capfd.readouterr().err
        assert "invalid density" in err
        assert "ignoring it" in err
        # The model was rejected, so nothing was bound from the extension (the node
        # extension still references it by index, but it read back empty).
        assert not list(r2.view(ModalModel))
        assert not list(r2.view(AcousticMaterialRef))
