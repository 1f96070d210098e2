"""glTF roundtrip of the rendering-side surface: pbrMetallicRoughness factors and
KHR_lights_punctual (reference imports ~20 KHR/EXT extensions, README.md:93-119), plus
an end-to-end check that an imported scene renders through the TPU rasterizer."""

import json

import numpy as np

from mesheditor_tpu.io.gltf import export_gltf, import_gltf
from mesheditor_tpu.mesh import cuboid_surface
from mesheditor_tpu.scene.components import (
    LightComponent, MeshSurface, Transform, VisualMaterial,
)
from mesheditor_tpu.scene.derive import install_default_pipeline
from mesheditor_tpu.scene.registry import Registry


def _scene():
    r = Registry()
    install_default_pipeline(r)
    e = r.create()
    pos, tris = cuboid_surface((0.5, 0.5, 0.5))
    r.emplace(e, MeshSurface(positions=pos, triangles=np.asarray(tris, np.uint32)))
    r.emplace(e, VisualMaterial(
        base_color=np.array([0.8, 0.1, 0.2, 1.0]), metallic=0.65, roughness=0.3,
        emissive=np.array([0.1, 0.0, 0.05]), double_sided=False))
    light = r.create()
    r.emplace(light, Transform(translation=np.array([0.0, 3.0, 0.0])))
    r.emplace(light, LightComponent(kind="spot", color=np.array([1.0, 0.9, 0.8]),
                                    intensity=40.0, range=12.0,
                                    inner_cone_angle=0.2, outer_cone_angle=0.5))
    sun = r.create()
    r.emplace(sun, LightComponent(kind="directional", intensity=2.5))
    return r, e, light, sun


class TestVisualRoundtrip:
    def test_material_factors_roundtrip(self, tmp_path):
        r, e, *_ = _scene()
        p = tmp_path / "scene.gltf"
        export_gltf(r, p)
        r2 = import_gltf(p)
        mats = [(ent, m) for ent, m in r2.view(VisualMaterial)]
        assert len(mats) == 1
        m = mats[0][1]
        assert np.allclose(m.base_color, [0.8, 0.1, 0.2, 1.0])
        assert abs(m.metallic - 0.65) < 1e-12
        assert abs(m.roughness - 0.3) < 1e-12
        assert np.allclose(m.emissive, [0.1, 0.0, 0.05])
        assert m.double_sided is False

    def test_lights_roundtrip(self, tmp_path):
        r, *_ = _scene()
        p = tmp_path / "scene.gltf"
        export_gltf(r, p)
        doc = json.loads(p.read_text())
        assert "KHR_lights_punctual" in doc["extensionsUsed"]
        assert len(doc["extensions"]["KHR_lights_punctual"]["lights"]) == 2
        r2 = import_gltf(p)
        lights = sorted((ent, l) for ent, l in r2.view(LightComponent))
        assert len(lights) == 2
        spot = next(l for _, l in lights if l.kind == "spot")
        assert abs(spot.intensity - 40.0) < 1e-12
        assert abs(spot.range - 12.0) < 1e-12
        assert abs(spot.inner_cone_angle - 0.2) < 1e-12
        assert abs(spot.outer_cone_angle - 0.5) < 1e-12
        sun = next(l for _, l in lights if l.kind == "directional")
        assert abs(sun.intensity - 2.5) < 1e-12

    def test_glb_roundtrip(self, tmp_path):
        r, *_ = _scene()
        p = tmp_path / "scene.glb"
        export_gltf(r, p)
        r2 = import_gltf(p)
        assert len(list(r2.view(VisualMaterial))) == 1
        assert len(list(r2.view(LightComponent))) == 2

    def test_imported_scene_renders(self, tmp_path):
        from mesheditor_tpu.render import RenderSettings, render_scene

        r, *_ = _scene()
        p = tmp_path / "scene.gltf"
        export_gltf(r, p)
        r2 = import_gltf(p)
        view = render_scene(r2, settings=RenderSettings(width=48, height=32))
        img = view.image()
        assert np.isfinite(img).all()
        # The imported material is red-dominant where the cube is visible.
        tri_img = np.asarray(view.gbuf.tri)
        ys, xs = np.nonzero(tri_img >= 0)
        assert ys.size > 0
        px = img[ys, xs]
        assert px[:, 0].mean() > px[:, 2].mean()


class TestTextures:
    """TEXCOORD_0 + baseColorTexture roundtrip and rasterizer sampling (reference:
    texture pipeline, src/render/Textures.*; glTF import GltfScene.cpp)."""

    def _textured_scene(self):
        r = Registry()
        install_default_pipeline(r)
        e = r.create()
        # A quad with UVs spanning the texture.
        pos = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float64)
        tris = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
        uvs = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float64)
        r.emplace(e, MeshSurface(positions=pos, triangles=tris, uvs=uvs))
        # Left half red, right half blue.
        tex = np.zeros((8, 8, 4), np.uint8)
        tex[..., 3] = 255
        tex[:, :4, 0] = 255
        tex[:, 4:, 2] = 255
        r.emplace(e, VisualMaterial(base_color=np.ones(4), metallic=0.0,
                                    roughness=1.0, texture=tex))
        return r, e

    def test_texture_roundtrip_gltf_and_glb(self, tmp_path):
        for name in ("scene.gltf", "scene.glb"):
            r, e = self._textured_scene()
            p = tmp_path / name
            export_gltf(r, p)
            r2 = import_gltf(p)
            (_, m), = r2.view(VisualMaterial)
            assert m.texture.shape == (8, 8, 4)
            assert m.texture[0, 0, 0] == 255 and m.texture[0, 7, 2] == 255
            (_, surf), = r2.view(MeshSurface)
            assert surf.uvs.shape == (4, 2)

    def test_textured_render_shows_texture_colors(self, tmp_path):
        from mesheditor_tpu.render import Camera, RenderSettings, render_scene

        r, e = self._textured_scene()
        p = tmp_path / "scene.gltf"
        export_gltf(r, p)
        r2 = import_gltf(p)
        cam = Camera(eye=np.array([0.0, 0.0, 3.0]), near=0.1, far=20.0)
        view = render_scene(r2, camera=cam, settings=RenderSettings(64, 64))
        img = view.image()
        left = img[32, 16]
        right = img[32, 48]
        assert left[0] > left[2]    # red half
        assert right[2] > right[0]  # blue half


class TestAnimationRoundtrip:
    """Clips travel as document animations (channels/samplers with the spec's xyzw
    rotation order and CUBICSPLINE row layout)."""

    def _scene(self):
        from mesheditor_tpu.scene.animation import (
            AnimationChannel, AnimationClip, AnimationClipComponent, Interpolation,
            TargetPath,
        )

        r = Registry()
        install_default_pipeline(r)
        e = r.create()
        pos, tris = cuboid_surface((0.5, 0.5, 0.5))
        r.emplace(e, MeshSurface(positions=pos, triangles=np.asarray(tris, np.uint32)))
        r.emplace(e, Transform())
        rot = np.array([[1.0, 0, 0, 0],
                        [np.cos(0.5), 0, np.sin(0.5), 0]])  # wxyz about y
        clip = AnimationClip("spin", [
            AnimationChannel(entity=e, path=TargetPath.TRANSLATION,
                             times=np.array([0.0, 1.0]),
                             values=np.array([[0.0, 0, 0], [2.0, 1.0, 0]]),
                             interpolation=Interpolation.LINEAR),
            AnimationChannel(entity=e, path=TargetPath.ROTATION,
                             times=np.array([0.0, 1.0]), values=rot,
                             interpolation=Interpolation.LINEAR),
        ])
        holder = r.create()
        r.emplace(holder, AnimationClipComponent(clip=clip))
        return r, e

    def test_roundtrip_and_playback(self, tmp_path):
        from mesheditor_tpu.scene.animation import (
            AnimationClipComponent, TargetPath, evaluate_clip,
        )
        from mesheditor_tpu.scene.components import Transform as TransformC

        r, e = self._scene()
        p = tmp_path / "anim.gltf"
        export_gltf(r, p)
        r2 = import_gltf(p)
        clips = [c.clip for _, c in r2.view(AnimationClipComponent)]
        assert len(clips) == 1
        clip = clips[0]
        assert clip.name == "spin"
        paths = {c.path for c in clip.channels}
        assert paths == {TargetPath.TRANSLATION, TargetPath.ROTATION}
        # Play at t=0.5: translation midway, rotation normalized and about y.
        evaluate_clip(r2, clip, 0.5)
        target = clip.channels[0].entity
        t = r2.get(target, TransformC)
        assert np.allclose(t.translation, [1.0, 0.5, 0.0], atol=1e-6)
        w, x, y, z = t.rotation
        assert abs(x) < 1e-6 and abs(z) < 1e-6 and y > 0.01

    def test_cubicspline_and_weights_roundtrip(self, tmp_path):
        from mesheditor_tpu.scene.animation import (
            AnimationChannel, AnimationClip, AnimationClipComponent, Interpolation,
            TargetPath,
        )

        r = Registry()
        e = r.create()
        pos, tris = cuboid_surface((0.5, 0.5, 0.5))
        targets = np.zeros((2, pos.shape[0], 3))
        targets[0, :, 1] = 0.1
        r.emplace(e, MeshSurface(positions=pos, triangles=np.asarray(tris, np.uint32),
                                 morph_targets=targets,
                                 morph_weights=np.zeros(2)))
        k = 3
        cubic = np.zeros((k, 3, 3))
        cubic[:, 1] = np.linspace(0, 1, k)[:, None] * np.array([1.0, 0, 0])
        weights_vals = np.array([[0.0, 0.0], [1.0, 0.5], [0.0, 1.0]])
        clip = AnimationClip("c", [
            AnimationChannel(entity=e, path=TargetPath.SCALE,
                             times=np.linspace(0, 1, k), values=cubic,
                             interpolation=Interpolation.CUBICSPLINE),
            AnimationChannel(entity=e, path=TargetPath.WEIGHTS,
                             times=np.linspace(0, 1, k), values=weights_vals,
                             interpolation=Interpolation.LINEAR),
        ])
        h = r.create()
        r.emplace(h, AnimationClipComponent(clip=clip))
        p = tmp_path / "anim2.glb"
        export_gltf(r, p)
        r2 = import_gltf(p)
        (_, comp), = r2.view(AnimationClipComponent)
        by_path = {c.path: c for c in comp.clip.channels}
        sc = by_path[TargetPath.SCALE]
        assert sc.interpolation == Interpolation.CUBICSPLINE
        assert sc.values.shape == (k, 3, 3)
        assert np.allclose(sc.values, cubic, atol=1e-6)
        wc = by_path[TargetPath.WEIGHTS]
        assert wc.values.shape == (k, 2)
        assert np.allclose(wc.values, weights_vals, atol=1e-6)
