"""glTF texture breadth: full pbr texture-set roundtrip, KHR_texture_transform,
KTX2 container decode, and third-party-shaped ingestion (interleaved / sparse /
normalized accessors) — the surface foreign exporters produce that this one never
writes (reference ingests via fastgltf; RoundtripTest.cpp exercises the sample-asset
corpus)."""

import json
import struct

import numpy as np

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu.io.gltf import export_gltf, import_gltf
from mesheditor_tpu.mesh import cuboid_surface
from mesheditor_tpu.scene.components import MeshSurface, Name, Transform, VisualMaterial
from mesheditor_tpu.scene.registry import Registry


def _checker(val_a, val_b, n=16):
    yy, xx = np.mgrid[0:n, 0:n]
    m = ((xx // 4 + yy // 4) % 2).astype(np.uint8)
    tex = np.zeros((n, n, 4), np.uint8)
    tex[..., :3] = np.where(m[..., None] > 0, val_a, val_b)
    tex[..., 3] = 255
    return tex


def _textured_registry():
    r = Registry()
    e = r.create()
    r.emplace(e, Name("crate"))
    r.emplace(e, Transform())
    pts, tris = cuboid_surface((0.5, 0.5, 0.5))
    p = np.asarray(pts)
    uv = (p[:, :2] - p[:, :2].min(0)) / np.ptp(p[:, :2], axis=0)
    r.emplace(e, MeshSurface(positions=p, triangles=np.asarray(tris, np.uint32), uvs=uv))
    r.emplace(e, VisualMaterial(
        base_color=np.array([1.0, 0.9, 0.8, 1.0]),
        emissive=np.array([1.0, 1.0, 1.0]),
        texture=_checker((200, 60, 40), (40, 60, 200)),
        mr_texture=_checker((0, 255, 0), (0, 40, 255)),
        emissive_texture=_checker((255, 120, 0), (0, 0, 0)),
        normal_texture=_checker((128, 128, 255), (180, 128, 230)),
        occlusion_texture=_checker((255, 255, 255), (60, 60, 60)),
        uv_transform=np.array([0.25, 0.1, 0.3, 2.0, 3.0]),
    ))
    return r, e


class TestTextureSetRoundtrip:
    def test_all_texture_kinds_roundtrip(self, tmp_path):
        r, e = _textured_registry()
        path = tmp_path / "tex.gltf"
        export_gltf(r, path)
        doc = json.loads(path.read_text())
        m = doc["materials"][0]
        assert "metallicRoughnessTexture" in m["pbrMetallicRoughness"]
        assert "emissiveTexture" in m and "normalTexture" in m and "occlusionTexture" in m
        assert "KHR_texture_transform" in doc.get("extensionsUsed", [])

        r2 = import_gltf(path)
        (e2, vm2), = r2.view(VisualMaterial)
        vm1 = r.get(e, VisualMaterial)
        for f in ("texture", "mr_texture", "emissive_texture", "normal_texture",
                  "occlusion_texture"):
            np.testing.assert_array_equal(getattr(vm1, f), getattr(vm2, f), err_msg=f)
        np.testing.assert_allclose(vm2.uv_transform, vm1.uv_transform, atol=1e-12)

    def test_textures_change_the_render(self, tmp_path):
        from mesheditor_tpu.render import RenderSettings, render_scene
        from mesheditor_tpu.scene.derive import install_default_pipeline

        r, e = _textured_registry()
        install_default_pipeline(r)
        settings = RenderSettings(width=96, height=64)
        full = np.asarray(render_scene(r, settings=settings).image())
        vm = r.get(e, VisualMaterial)
        vm.normal_texture = np.zeros((0, 0, 4), np.uint8)
        vm.emissive_texture = np.zeros((0, 0, 4), np.uint8)
        plain = np.asarray(render_scene(r, settings=settings).image())
        assert np.abs(full - plain).max() > 0.02, \
            "normal/emissive textures must change shading"


def _ktx2_bytes(w, h, rgba, scheme=0):
    level = rgba.tobytes()
    comp = level
    if scheme == 2:
        import zstandard

        comp = zstandard.ZstdCompressor().compress(level)
    header = b"\xabKTX 20\xbb\r\n\x1a\n" + struct.pack(
        "<IIIIIIIII", 43, 1, w, h, 0, 0, 1, 1, scheme)
    # dfd/kvd (u32 x4) + sgd (u64 x2) offsets+lengths, zeroed: decoder ignores them.
    header += struct.pack("<IIIIQQ", 0, 0, 0, 0, 0, 0)
    # level index (one level) then payload.
    off = len(header) + 24
    header += struct.pack("<QQQ", off, len(comp), len(level))
    return header + comp


class TestKtx2:
    def test_uncompressed_and_zstd(self, tmp_path):
        rgba = _checker((10, 200, 30), (200, 10, 30), n=8)
        for scheme in (0, 2):
            blob = _ktx2_bytes(8, 8, rgba, scheme)
            from mesheditor_tpu.io.gltf import _decode_ktx2

            out = _decode_ktx2(blob)
            np.testing.assert_array_equal(out, rgba)

    def test_ktx2_through_gltf_basisu_texture(self, tmp_path):
        import base64

        rgba = _checker((9, 9, 9), (250, 250, 250), n=8)
        blob = _ktx2_bytes(8, 8, rgba, scheme=2)
        doc = {
            "asset": {"version": "2.0"},
            "scenes": [{"nodes": [0]}],
            "nodes": [{"mesh": 0}],
            "meshes": [{"primitives": [{
                "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
                "indices": 2, "material": 0}]}],
            "materials": [{"pbrMetallicRoughness": {"baseColorTexture": {"index": 0}}}],
            "textures": [{"extensions": {"KHR_texture_basisu": {"source": 0}}}],
            "images": [{"uri": "data:application/ktx2;base64,"
                               + base64.b64encode(blob).decode()}],
            "accessors": [
                {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3",
                 "min": [0, 0, 0], "max": [1, 1, 0]},
                {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC2"},
                {"bufferView": 2, "componentType": 5123, "count": 3, "type": "SCALAR"},
            ],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": 36},
                {"buffer": 0, "byteOffset": 36, "byteLength": 24},
                {"buffer": 0, "byteOffset": 60, "byteLength": 6},
            ],
            "buffers": [{"byteLength": 68, "uri": None}],
        }
        pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        uv = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
        idx = np.array([0, 1, 2], np.uint16)
        blob0 = pos.tobytes() + uv.tobytes() + idx.tobytes() + b"\x00\x00"
        doc["buffers"][0] = {
            "byteLength": len(blob0),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob0).decode()}
        p = tmp_path / "basisu.gltf"
        p.write_text(json.dumps(doc))
        r = import_gltf(p)
        (_, vm), = r.view(VisualMaterial)
        np.testing.assert_array_equal(vm.texture, rgba)


class TestForeignIngestion:
    """Accessor layouts this framework's exporter never writes."""

    def _base_doc(self):
        return {
            "asset": {"version": "2.0", "generator": "ThirdPartyDCC 1.2"},
            "scenes": [{"nodes": [0]}], "scene": 0,
            "nodes": [{"mesh": 0, "name": "foreign"}],
        }

    def test_interleaved_vertex_buffer(self, tmp_path):
        import base64

        # P0 uv0 P1 uv1 P2 uv2 interleaved, stride 20.
        pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        uv = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
        inter = np.concatenate([pos, uv], axis=1).astype(np.float32)  # (3, 5)
        idx = np.array([0, 1, 2], np.uint8)
        blob = inter.tobytes() + idx.tobytes() + b"\x00"
        doc = self._base_doc()
        doc.update({
            "meshes": [{"primitives": [{
                "attributes": {"POSITION": 0, "TEXCOORD_0": 1}, "indices": 2}]}],
            "accessors": [
                {"bufferView": 0, "byteOffset": 0, "componentType": 5126,
                 "count": 3, "type": "VEC3", "min": [0, 0, 0], "max": [1, 1, 0]},
                {"bufferView": 0, "byteOffset": 12, "componentType": 5126,
                 "count": 3, "type": "VEC2"},
                {"bufferView": 1, "componentType": 5121, "count": 3, "type": "SCALAR"},
            ],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": 60, "byteStride": 20},
                {"buffer": 0, "byteOffset": 60, "byteLength": 3},
            ],
            "buffers": [{"byteLength": len(blob),
                         "uri": "data:application/octet-stream;base64,"
                                + base64.b64encode(blob).decode()}],
        })
        p = tmp_path / "interleaved.gltf"
        p.write_text(json.dumps(doc))
        r = import_gltf(p)
        (_, ms), = r.view(MeshSurface)
        np.testing.assert_allclose(ms.positions, pos)
        np.testing.assert_allclose(ms.uvs, uv)
        np.testing.assert_array_equal(ms.triangles.reshape(-1), [0, 1, 2])

    def test_sparse_accessor(self, tmp_path):
        import base64

        base = np.zeros((4, 3), np.float32)
        repl = np.array([[9, 9, 9], [7, 7, 7]], np.float32)
        rows = np.array([1, 3], np.uint16)
        idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
        blob = base.tobytes() + rows.tobytes() + repl.tobytes() + idx.tobytes()
        doc = self._base_doc()
        doc.update({
            "meshes": [{"primitives": [{"attributes": {"POSITION": 0}, "indices": 1}]}],
            "accessors": [
                {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3",
                 "sparse": {"count": 2,
                            "indices": {"bufferView": 1, "componentType": 5123},
                            "values": {"bufferView": 2}}},
                {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
            ],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": 48},
                {"buffer": 0, "byteOffset": 48, "byteLength": 4},
                {"buffer": 0, "byteOffset": 52, "byteLength": 24},
                {"buffer": 0, "byteOffset": 76, "byteLength": 12},
            ],
            "buffers": [{"byteLength": len(blob),
                         "uri": "data:application/octet-stream;base64,"
                                + base64.b64encode(blob).decode()}],
        })
        p = tmp_path / "sparse.gltf"
        p.write_text(json.dumps(doc))
        r = import_gltf(p)
        (_, ms), = r.view(MeshSurface)
        expect = base.copy()
        expect[[1, 3]] = repl
        np.testing.assert_allclose(ms.positions, expect)

    def test_normalized_u16_uvs(self, tmp_path):
        import base64

        pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        uv16 = np.array([[0, 0], [65535, 0], [0, 32768]], np.uint16)
        idx = np.array([0, 1, 2], np.uint16)
        blob = pos.tobytes() + uv16.tobytes() + idx.tobytes() + b"\x00\x00"
        doc = self._base_doc()
        doc.update({
            "meshes": [{"primitives": [{
                "attributes": {"POSITION": 0, "TEXCOORD_0": 1}, "indices": 2}]}],
            "accessors": [
                {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
                {"bufferView": 1, "componentType": 5123, "count": 3, "type": "VEC2",
                 "normalized": True},
                {"bufferView": 2, "componentType": 5123, "count": 3, "type": "SCALAR"},
            ],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": 36},
                {"buffer": 0, "byteOffset": 36, "byteLength": 12},
                {"buffer": 0, "byteOffset": 48, "byteLength": 6},
            ],
            "buffers": [{"byteLength": len(blob),
                         "uri": "data:application/octet-stream;base64,"
                                + base64.b64encode(blob).decode()}],
        })
        p = tmp_path / "norm.gltf"
        p.write_text(json.dumps(doc))
        r = import_gltf(p)
        (_, ms), = r.view(MeshSurface)
        np.testing.assert_allclose(ms.uvs, [[0, 0], [1, 0], [0, 32768 / 65535]],
                                   atol=1e-6)
