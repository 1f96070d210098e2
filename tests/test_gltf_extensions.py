"""glTF extension breadth: KHR_materials_* factor set, KHR_node_visibility,
KHR_materials_variants, EXT_mesh_gpu_instancing, EXT_texture_webp, and
KHR_mesh_quantization ingestion — the reference's extension table
(/root/reference/README.md:93-119), roundtripped component-by-component
(tests/RoundtripTest.cpp discipline)."""

import base64
import json

import numpy as np
import pytest

from mesheditor_tpu.io.gltf import apply_variant, export_gltf, import_gltf
from mesheditor_tpu.mesh import cuboid_surface
from mesheditor_tpu.scene.components import (
    MaterialVariants,
    MeshSurface,
    Name,
    SceneNode,
    Transform,
    VisibilityComponent,
    VisualMaterial,
)
from mesheditor_tpu.scene.derive import install_default_pipeline
from mesheditor_tpu.scene.registry import Registry


def _scene_with_material(**vm_kwargs):
    r = Registry()
    install_default_pipeline(r)
    e = r.create()
    r.emplace(e, Name("obj"))
    r.emplace(e, SceneNode())
    r.emplace(e, Transform())
    pts, tris = cuboid_surface((0.1, 0.1, 0.1))
    r.emplace(e, MeshSurface(positions=pts, triangles=tris))
    r.emplace(e, VisualMaterial(**vm_kwargs))
    r.drain_events()
    return r, e


FACTOR_FIELDS = dict(
    emissive_strength=3.5, unlit=True, ior=1.33, specular=0.7,
    specular_color=np.array([0.9, 0.8, 0.7]), clearcoat=0.8,
    clearcoat_roughness=0.25, sheen_color=np.array([0.2, 0.1, 0.05]),
    sheen_roughness=0.4, transmission=0.6, diffuse_transmission=0.3,
    diffuse_transmission_color=np.array([0.5, 0.6, 0.7]), thickness=0.02,
    attenuation_distance=0.15, attenuation_color=np.array([0.4, 0.9, 0.3]),
    dispersion=0.1, anisotropy_strength=0.5, anisotropy_rotation=0.7,
    iridescence=0.9, iridescence_ior=1.8, iridescence_thickness_min=150.0,
    iridescence_thickness_max=350.0, alpha_mode="MASK", alpha_cutoff=0.25,
)


class TestMaterialExtensionRoundtrip:
    def test_full_factor_set_roundtrips(self, tmp_path):
        r, _ = _scene_with_material(**FACTOR_FIELDS)
        path = tmp_path / "mat.glb"
        export_gltf(r, path)
        r2 = import_gltf(path)
        (e2, vm2), = list(r2.view(VisualMaterial))
        for key, want in FACTOR_FIELDS.items():
            got = getattr(vm2, key)
            if isinstance(want, np.ndarray):
                assert np.allclose(got, want), key
            elif isinstance(want, float):
                assert got == pytest.approx(want), key
            else:
                assert got == want, key

    def test_extensions_declared(self, tmp_path):
        r, _ = _scene_with_material(**FACTOR_FIELDS)
        path = tmp_path / "mat.gltf"
        export_gltf(r, path)
        doc = json.loads(path.read_text())
        used = set(doc.get("extensionsUsed", []))
        for name in ("KHR_materials_emissive_strength", "KHR_materials_unlit",
                     "KHR_materials_ior", "KHR_materials_specular",
                     "KHR_materials_clearcoat", "KHR_materials_sheen",
                     "KHR_materials_transmission",
                     "KHR_materials_diffuse_transmission", "KHR_materials_volume",
                     "KHR_materials_dispersion", "KHR_materials_anisotropy",
                     "KHR_materials_iridescence"):
            assert name in used, name

    def test_default_material_writes_no_extensions(self, tmp_path):
        r, _ = _scene_with_material()
        path = tmp_path / "plain.gltf"
        export_gltf(r, path)
        doc = json.loads(path.read_text())
        mat = doc["materials"][0]
        assert "extensions" not in mat
        assert "alphaMode" not in mat


class TestExtensionShading:
    def _render(self, **vm_kwargs):
        from mesheditor_tpu.render.scene_render import RenderSettings, render_scene

        r, _ = _scene_with_material(**vm_kwargs)
        s = RenderSettings(width=64, height=48)
        return render_scene(r, settings=s).image()

    def test_unlit_is_flat_base_color(self):
        img = self._render(unlit=True, base_color=np.array([0.5, 0.2, 0.1, 1.0]))
        # Every covered pixel shows the same color: gamma(albedo).
        base = self._render(base_color=np.array([0.5, 0.2, 0.1, 1.0]))
        covered = np.abs(img - img[24, 32]).max(-1) < 1e-5
        assert covered.mean() > 0.2  # the object occupies the view and is constant
        assert not np.allclose(img, base)  # lit render differs

    def test_emissive_strength_brightens(self):
        dim = self._render(emissive=np.array([0.1, 0.1, 0.1]))
        bright = self._render(emissive=np.array([0.1, 0.1, 0.1]), emissive_strength=8.0)
        assert bright.mean() > dim.mean() + 0.01

    def test_clearcoat_changes_highlight(self):
        base = self._render(roughness=0.8)
        coated = self._render(roughness=0.8, clearcoat=1.0, clearcoat_roughness=0.05)
        assert np.abs(coated - base).max() > 0.01

    def test_transmission_pulls_background(self):
        opaque = self._render(base_color=np.array([1.0, 1.0, 1.0, 1.0]))
        glassy = self._render(base_color=np.array([1.0, 1.0, 1.0, 1.0]),
                              transmission=0.9)
        assert np.abs(glassy - opaque).max() > 0.01

    def test_ior_specular_change_reflectance(self):
        base = self._render(metallic=0.0, roughness=0.2)
        high_ior = self._render(metallic=0.0, roughness=0.2, ior=2.4)
        assert np.abs(high_ior - base).max() > 0.005


class TestNodeVisibility:
    def test_hidden_node_not_rendered_and_roundtrips(self, tmp_path):
        from mesheditor_tpu.render.scene_render import RenderSettings, render_scene

        r, e = _scene_with_material(base_color=np.array([1.0, 0.0, 0.0, 1.0]))
        s = RenderSettings(width=48, height=32)
        shown = render_scene(r, settings=s).image()
        r.emplace(e, VisibilityComponent(visible=False))
        hidden = render_scene(r, settings=s).image()
        bg = np.asarray(s.background)
        assert np.allclose(hidden, bg, atol=1e-5)  # nothing drawn
        assert not np.allclose(shown, hidden)
        path = tmp_path / "vis.glb"
        export_gltf(r, path)
        r2 = import_gltf(path)
        vis = [v for _, v in r2.view(VisibilityComponent)]
        assert len(vis) == 1 and vis[0].visible is False

    def test_visibility_inherits_from_parent(self):
        from mesheditor_tpu.render.scene_render import RenderSettings, render_scene

        r, e = _scene_with_material()
        parent = r.create()
        r.emplace(parent, Name("group"))
        r.emplace(parent, SceneNode())
        r.emplace(parent, Transform())
        sn = r.get(e, SceneNode)
        sn.parent = parent
        r.emplace(e, sn)
        r.emplace(parent, VisibilityComponent(visible=False))
        r.drain_events()
        s = RenderSettings(width=32, height=24)
        img = render_scene(r, settings=s).image()
        assert np.allclose(img, np.asarray(s.background), atol=1e-5)


class TestMeshInstancing:
    def test_ext_mesh_gpu_instancing_imports_children(self, tmp_path):
        # Hand-author a minimal document with instancing attributes.
        pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        tris = np.array([0, 1, 2], np.uint32)
        t_arr = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0]], np.float32)
        s_arr = np.array([[1, 1, 1], [2, 2, 2], [1, 1, 3]], np.float32)
        blob = (pts.tobytes() + tris.tobytes() + t_arr.tobytes() + s_arr.tobytes())
        doc = {
            "asset": {"version": "2.0"},
            "scene": 0, "scenes": [{"nodes": [0]}],
            "nodes": [{"name": "grid", "mesh": 0, "extensions": {
                "EXT_mesh_gpu_instancing": {"attributes": {
                    "TRANSLATION": 2, "SCALE": 3}}}}],
            "meshes": [{"primitives": [{
                "attributes": {"POSITION": 0}, "indices": 1}]}],
            "accessors": [
                {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3",
                 "min": [0, 0, 0], "max": [1, 1, 0]},
                {"bufferView": 1, "componentType": 5125, "count": 3, "type": "SCALAR"},
                {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC3"},
                {"bufferView": 3, "componentType": 5126, "count": 3, "type": "VEC3"},
            ],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": 36},
                {"buffer": 0, "byteOffset": 36, "byteLength": 12},
                {"buffer": 0, "byteOffset": 48, "byteLength": 36},
                {"buffer": 0, "byteOffset": 84, "byteLength": 36},
            ],
            "buffers": [{"byteLength": len(blob),
                         "uri": "data:application/octet-stream;base64,"
                                + base64.b64encode(blob).decode()}],
            "extensionsUsed": ["EXT_mesh_gpu_instancing"],
        }
        path = tmp_path / "inst.gltf"
        path.write_text(json.dumps(doc))
        r = import_gltf(path)
        meshes = list(r.view(MeshSurface))
        assert len(meshes) == 3  # one entity per instance; carrier node holds none
        trs = sorted(tuple(np.asarray(r.get(e, Transform).translation))
                     for e, _ in meshes)
        assert trs == [(0.0, 0.0, 0.0), (0.0, 2.0, 0.0), (2.0, 0.0, 0.0)]
        scales = {tuple(np.asarray(r.get(e, Transform).scale)) for e, _ in meshes}
        assert (1.0, 1.0, 3.0) in scales and (2.0, 2.0, 2.0) in scales


class TestWebpTextures:
    def test_webp_export_import_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        tex = rng.integers(0, 255, (8, 8, 4), np.uint8)
        tex[..., 3] = 255
        pts, tris = cuboid_surface((0.1, 0.1, 0.1))
        uvs = np.abs(pts[:, :2]) * 5.0
        r = Registry()
        install_default_pipeline(r)
        e = r.create()
        r.emplace(e, Name("tex"))
        r.emplace(e, SceneNode())
        r.emplace(e, Transform())
        r.emplace(e, MeshSurface(positions=pts, triangles=tris, uvs=uvs))
        r.emplace(e, VisualMaterial(texture=tex))
        r.drain_events()
        path = tmp_path / "webp.glb"
        export_gltf(r, path, texture_format="webp")
        r2 = import_gltf(path)
        (e2, vm2), = list(r2.view(VisualMaterial))
        assert vm2.texture.shape == tex.shape
        assert np.array_equal(vm2.texture, tex)  # lossless WebP

    def test_webp_marked_required(self, tmp_path):
        r, _ = _scene_with_material(texture=np.full((4, 4, 4), 128, np.uint8))
        # UVs are required for texture export paths to be meaningful, but the
        # document structure is what's asserted here.
        path = tmp_path / "webp.gltf"
        export_gltf(r, path, texture_format="webp")
        doc = json.loads(path.read_text())
        assert "EXT_texture_webp" in doc.get("extensionsUsed", [])
        assert "EXT_texture_webp" in doc.get("extensionsRequired", [])
        assert doc["images"][0]["mimeType"] == "image/webp"
        assert "source" not in doc["textures"][0]


class TestMeshQuantization:
    def test_quantized_positions_ingest(self, tmp_path):
        """KHR_mesh_quantization: normalized uint16 POSITION + compensating node
        scale (the reference handles this in its fastgltf import path)."""
        pos_f = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
        q = np.round(pos_f * 65535.0).astype(np.uint16)
        tris = np.array([0, 1, 2], np.uint32)
        blob = q.tobytes() + b"\x00" * ((-q.nbytes) % 4) + tris.tobytes()
        doc = {
            "asset": {"version": "2.0"},
            "scene": 0, "scenes": [{"nodes": [0]}],
            "nodes": [{"mesh": 0, "scale": [2.0, 2.0, 2.0]}],
            "meshes": [{"primitives": [{
                "attributes": {"POSITION": 0}, "indices": 1}]}],
            "accessors": [
                {"bufferView": 0, "componentType": 5123, "count": 3, "type": "VEC3",
                 "normalized": True},
                {"bufferView": 1, "componentType": 5125, "count": 3, "type": "SCALAR"},
            ],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": q.nbytes},
                {"buffer": 0, "byteOffset": q.nbytes + ((-q.nbytes) % 4),
                 "byteLength": 12},
            ],
            "buffers": [{"byteLength": len(blob),
                         "uri": "data:application/octet-stream;base64,"
                                + base64.b64encode(blob).decode()}],
            "extensionsUsed": ["KHR_mesh_quantization"],
            "extensionsRequired": ["KHR_mesh_quantization"],
        }
        path = tmp_path / "quant.gltf"
        path.write_text(json.dumps(doc))
        r = import_gltf(path)
        (e, surf), = list(r.view(MeshSurface))
        assert np.allclose(surf.positions, pos_f, atol=1e-4)
        assert np.allclose(r.get(e, Transform).scale, 2.0)


class TestMaterialVariants:
    def test_variants_roundtrip_and_apply(self, tmp_path):
        r, e = _scene_with_material(base_color=np.array([1.0, 1.0, 1.0, 1.0]))
        red = {"pbrMetallicRoughness": {"baseColorFactor": [1.0, 0.0, 0.0, 1.0]},
               "extensions": {"KHR_materials_ior": {"ior": 1.8}}}
        blue = {"pbrMetallicRoughness": {"baseColorFactor": [0.0, 0.0, 1.0, 1.0]}}
        r.emplace(e, MaterialVariants(
            names=["Red", "Blue"],
            mappings=[{"variants": [0], "material": red},
                      {"variants": [1], "material": blue}]))
        path = tmp_path / "variants.glb"
        export_gltf(r, path)
        r2 = import_gltf(path)
        (e2, mv2), = list(r2.view(MaterialVariants))
        assert mv2.names == ["Red", "Blue"]
        assert len(mv2.mappings) == 2
        changed = apply_variant(r2, "Red")
        assert changed == 1
        vm = r2.get(e2, VisualMaterial)
        assert np.allclose(vm.base_color, [1.0, 0.0, 0.0, 1.0])
        assert vm.ior == pytest.approx(1.8)
        apply_variant(r2, "Blue")
        vm = r2.get(e2, VisualMaterial)
        assert np.allclose(vm.base_color, [0.0, 0.0, 1.0, 1.0])

    def test_document_declares_variants(self, tmp_path):
        r, e = _scene_with_material()
        r.emplace(e, MaterialVariants(
            names=["A"], mappings=[{"variants": [0], "material": {}}]))
        path = tmp_path / "v.gltf"
        export_gltf(r, path)
        doc = json.loads(path.read_text())
        assert doc["extensions"]["KHR_materials_variants"]["variants"] == [
            {"name": "A"}]
        assert "KHR_materials_variants" in doc["extensionsUsed"]


class TestImageBasedLights:
    def test_ibl_roundtrip_and_render(self, tmp_path):
        """EXT_lights_image_based: equirect -> cubemap+SH9 wire format -> equirect;
        the imported environment drives the renderer (reference imports it as Scene
        IBL, README.md:93-119)."""
        from mesheditor_tpu.render.scene_render import RenderSettings, render_scene
        from mesheditor_tpu.scene.components import ImageBasedLightComponent

        env = np.zeros((32, 64, 3), np.float32)
        env[:16] = (0.8, 0.5, 0.2)   # warm sky
        env[16:] = (0.05, 0.1, 0.2)  # cool ground
        r, e = _scene_with_material(metallic=0.9, roughness=0.15)
        r.emplace(e, ImageBasedLightComponent(equirect=env, intensity=2.0))
        path = tmp_path / "ibl.glb"
        export_gltf(r, path)
        doc_r = import_gltf(path)
        comps = list(doc_r.view(ImageBasedLightComponent))
        assert len(comps) == 1
        got = comps[0][1]
        assert got.intensity == pytest.approx(2.0)
        assert got.equirect.size > 0
        # Hemisphere means survive the 8-bit cube round trip.
        h = got.equirect.shape[0]
        top = got.equirect[: h // 3].mean(axis=(0, 1))
        bot = got.equirect[-h // 3:].mean(axis=(0, 1))
        assert top[0] > bot[0] and bot[2] > top[2] * 0.2
        # The environment lights the render without explicit settings.
        s = RenderSettings(width=64, height=48)
        lit = render_scene(doc_r, settings=s).image()
        doc_r.remove(comps[0][0], ImageBasedLightComponent)
        unlit = render_scene(doc_r, settings=s).image()
        assert np.abs(lit - unlit).max() > 0.02

    def test_sh9_fallback(self, tmp_path):
        """A document with irradianceCoefficients but no specular images still
        produces a usable low-frequency environment."""
        from mesheditor_tpu.render.environment import (
            equirect_from_sh9, sh9_irradiance_coefficients,
        )

        env = np.zeros((16, 32, 3), np.float32)
        env[:8] = (1.0, 1.0, 1.0)
        coeffs = sh9_irradiance_coefficients(env)
        rec = equirect_from_sh9(coeffs, height=16)
        assert rec[:4].mean() > rec[-4:].mean()  # bright top survives


class TestMeshQuantization:
    """KHR_mesh_quantization ingestion (reference table: README.md:95): quantized
    int16 POSITION with node-scale dequantization and normalized uint16 TEXCOORD
    load to within quantization error of the float original."""

    def _quantize_glb(self, tmp_path):
        import json as _json
        import struct as _struct

        r, _ = _scene_with_material()
        src = tmp_path / "plain.gltf"
        export_gltf(r, src)
        gltf = _json.loads(src.read_text())
        import base64 as _b64

        # Decode the original float positions.
        from mesheditor_tpu.io.gltf import _read_buffer as _rb
        buffers = _rb(gltf, src, None)
        acc = gltf["accessors"][gltf["meshes"][0]["primitives"][0]["attributes"]["POSITION"]]
        bv = gltf["bufferViews"][acc["bufferView"]]
        raw = buffers[bv.get("buffer", 0)][bv.get("byteOffset", 0):][: bv["byteLength"]]
        pos = np.frombuffer(raw, np.float32).reshape(-1, 3)
        lo, hi = pos.min(0), pos.max(0)
        scale = np.maximum((hi - lo) / 2.0, 1e-12)
        ctr = (hi + lo) / 2.0
        q = np.round((pos - ctr) / scale * 32767.0).astype(np.int16)
        # New quantized buffer: int16 positions appended as a fresh buffer.
        qbytes = q.tobytes()
        gltf["buffers"].append({
            "uri": "data:application/octet-stream;base64," + _b64.b64encode(qbytes).decode(),
            "byteLength": len(qbytes)})
        gltf["bufferViews"].append({"buffer": len(gltf["buffers"]) - 1,
                                    "byteOffset": 0, "byteLength": len(qbytes)})
        gltf["accessors"].append({
            "bufferView": len(gltf["bufferViews"]) - 1, "componentType": 5122,
            "count": int(q.shape[0]), "type": "VEC3",
            "min": q.min(0).tolist(), "max": q.max(0).tolist()})
        prim = gltf["meshes"][0]["primitives"][0]
        prim["attributes"]["POSITION"] = len(gltf["accessors"]) - 1
        # Dequantization rides the node transform (the spec's pattern).
        node = gltf["nodes"][0]
        node["scale"] = (np.asarray(node.get("scale", [1, 1, 1])) * scale / 32767.0).tolist()
        node["translation"] = (np.asarray(node.get("translation", [0, 0, 0])) + ctr).tolist()
        for key in ("extensionsUsed", "extensionsRequired"):
            gltf.setdefault(key, [])
            if "KHR_mesh_quantization" not in gltf[key]:
                gltf[key].append("KHR_mesh_quantization")
        out = tmp_path / "quant.gltf"
        out.write_text(_json.dumps(gltf))
        return src, out, pos, scale

    def test_quantized_positions_load_within_tolerance(self, tmp_path):
        src, out, pos, scale = self._quantize_glb(tmp_path)
        r2 = import_gltf(out)
        (e2, surf), = list(r2.view(MeshSurface))
        got = np.asarray(surf.positions, np.float64)
        tr = r2.get(e2, Transform)
        world = got * np.asarray(tr.scale) + np.asarray(tr.translation)
        tol = np.abs(scale).max() / 32767.0 * 1.5
        assert np.abs(world - pos).max() <= tol


class TestMeshoptCompression:
    """EXT_meshopt_compression ingestion via the spec's fallback-buffer pattern
    (reference table: README.md:118): a view with fallback bytes loads normally; a
    view whose only payload is the compressed stream is rejected with a clear
    message (the codec itself is out of scope)."""

    def _tagged(self, tmp_path, keep_fallback):
        import json as _json

        r, _ = _scene_with_material()
        src = tmp_path / "plain.gltf"
        export_gltf(r, src)
        gltf = _json.loads(src.read_text())
        prim = gltf["meshes"][0]["primitives"][0]
        acc = gltf["accessors"][prim["attributes"]["POSITION"]]
        bv = gltf["bufferViews"][acc["bufferView"]]
        bv.setdefault("extensions", {})["EXT_meshopt_compression"] = {
            "buffer": 0, "byteOffset": 0, "byteLength": 4,
            "byteStride": 12, "count": acc["count"], "mode": "ATTRIBUTES"}
        if not keep_fallback:
            # Empty out the fallback buffer (undefined content per spec).
            gltf["buffers"][bv.get("buffer", 0)] = {"byteLength": 0}
        gltf.setdefault("extensionsUsed", []).append("EXT_meshopt_compression")
        out = tmp_path / "mo.gltf"
        out.write_text(_json.dumps(gltf))
        return out

    def test_fallback_buffer_loads(self, tmp_path):
        out = self._tagged(tmp_path, keep_fallback=True)
        r2 = import_gltf(out)
        assert len(list(r2.view(MeshSurface))) == 1

    def test_no_fallback_rejected_with_clear_error(self, tmp_path):
        import pytest

        out = self._tagged(tmp_path, keep_fallback=False)
        with pytest.raises(ValueError, match="meshopt"):
            import_gltf(out)
