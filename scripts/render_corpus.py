"""Deterministic render corpus: golden screenshots as the diff oracle.

The reference renders every scene headless and commits the output, so `git status` is
the regression oracle (/root/reference/script/Render:1-40, README.md:184-197). Same
discipline here: `python scripts/render_corpus.py` renders each corpus scene on the CPU
backend at a fixed small size and rewrites tests/fixtures/render_corpus/<name>.png plus
a sha256 manifest. tests/test_render_corpus.py re-renders and compares against the
committed goldens (quantized-pixel tolerance, the COMPARE_VIDEOS noise-filter analog).

Scenes exercise every shading path: modes (smooth/flat/wireframe), punctual light kinds,
metallic/roughness sweep, emissive, textures+UVs, morph targets, hemisphere environment,
scene-graph parenting, and the supersampled path.
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import mesheditor_tpu  # noqa: F401, E402
from mesheditor_tpu.mesh import (  # noqa: E402
    cone_surface, cuboid_surface, cylinder_surface, icosphere_surface, plane_surface,
    torus_surface, uv_sphere_surface,
)
from mesheditor_tpu.render import RenderSettings, render_scene, save_png  # noqa: E402
from mesheditor_tpu.render.camera import frame_points, orbit_camera  # noqa: E402
from mesheditor_tpu.scene.components import (  # noqa: E402
    LightComponent, MeshSurface, Name, SceneNode, Transform, VisualMaterial,
)
from mesheditor_tpu.scene.derive import install_default_pipeline  # noqa: E402
from mesheditor_tpu.scene.registry import Registry  # noqa: E402


def _registry() -> Registry:
    r = Registry()
    install_default_pipeline(r)
    return r

SIZE = (240, 160)
FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "tests", "fixtures", "render_corpus")


def _add(r, pts, tris, pos=(0, 0, 0), mat=None, name="obj", scale=1.0, parent=0):
    e = r.create()
    r.emplace(e, Name(name))
    t = Transform(translation=np.asarray(pos, np.float64))
    t.scale = np.full(3, float(scale))
    r.emplace(e, t)
    if parent:
        r.emplace(e, SceneNode(parent=parent))
    r.emplace(e, MeshSurface(positions=np.asarray(pts, np.float64),
                             triangles=np.asarray(tris, np.uint32)))
    r.emplace(e, mat or VisualMaterial())
    return e


def _sun(r, color=(1, 1, 1), intensity=1.0):
    e = r.create()
    r.emplace(e, Transform())
    r.emplace(e, LightComponent(kind="directional", color=np.asarray(color, float),
                                intensity=intensity))
    return e


def scene_primitives_line():
    r = _registry()
    gens = [
        icosphere_surface(2), cuboid_surface((0.8, 0.8, 0.8)),
        torus_surface(0.45, 0.18, 24, 12), cylinder_surface(0.4, 0.9, 16),
        cone_surface(0.45, 0.9, 16),
    ]
    for i, (pts, tris) in enumerate(gens):
        hue = np.array([0.3 + 0.15 * i, 0.8 - 0.12 * i, 0.5, 1.0])
        _add(r, np.asarray(pts) * (0.5 if i == 0 else 1.0), tris, pos=(2.0 * i, 0, 0),
             mat=VisualMaterial(base_color=hue, roughness=0.5), name=f"p{i}")
    _sun(r, intensity=1.8)
    return r, None, RenderSettings(*SIZE)


def scene_torus_wireframe():
    r = _registry()
    pts, tris = torus_surface(0.5, 0.2, 28, 14)
    _add(r, pts, tris)
    _sun(r)
    return r, None, RenderSettings(*SIZE, mode="wireframe")


def scene_cuboid_flat_pointlight():
    r = _registry()
    pts, tris = cuboid_surface((1, 1, 1))
    _add(r, pts, tris, mat=VisualMaterial(base_color=np.array([0.8, 0.4, 0.3, 1.0])))
    e = r.create()
    r.emplace(e, Transform(translation=np.array([1.5, 2.0, 1.5])))
    r.emplace(e, LightComponent(kind="point", intensity=40.0))
    return r, None, RenderSettings(*SIZE, mode="flat")


def scene_spotlight_floor():
    r = _registry()
    pts, tris = plane_surface((4.0, 4.0))
    floor = np.asarray(pts)[:, [0, 2, 1]]  # XY plane -> XZ floor (normal +Y)
    _add(r, floor, tris, mat=VisualMaterial(base_color=np.array([0.7, 0.7, 0.72, 1.0])))
    spts, stris = icosphere_surface(2)
    _add(r, np.asarray(spts) * 0.3, stris, pos=(0, 0.3, 0),
         mat=VisualMaterial(base_color=np.array([0.35, 0.5, 0.8, 1.0])))
    e = r.create()
    # Spot at +y looking down: rotate -Z onto -Y = -90 deg about X.
    tr = Transform(translation=np.array([0.0, 2.5, 0.0]))
    tr.rotation = np.array([np.cos(np.pi / 4), -np.sin(np.pi / 4), 0.0, 0.0])
    r.emplace(e, tr)
    r.emplace(e, LightComponent(kind="spot", intensity=60.0,
                                inner_cone_angle=0.3, outer_cone_angle=0.6))
    cam = orbit_camera(np.zeros(3), 5.0, azimuth_deg=30, elevation_deg=35)
    return r, cam, RenderSettings(*SIZE)


def scene_pbr_grid():
    r = _registry()
    pts, tris = icosphere_surface(2)
    for i in range(4):  # metallic sweep
        for j in range(3):  # roughness sweep
            m = VisualMaterial(base_color=np.array([0.8, 0.76, 0.3, 1.0]),
                               metallic=i / 3.0, roughness=0.15 + 0.35 * j)
            _add(r, np.asarray(pts) * 0.4, tris, pos=(i * 1.0, j * 1.0, 0), mat=m,
                 name=f"m{i}{j}")
    _sun(r, intensity=1.4)
    return r, None, RenderSettings(*SIZE)


def scene_emissive_dark():
    r = _registry()
    pts, tris = torus_surface(0.5, 0.16, 24, 12)
    _add(r, pts, tris, mat=VisualMaterial(base_color=np.array([0.1, 0.1, 0.1, 1.0]),
                                          emissive=np.array([0.9, 0.25, 0.05])))
    return r, None, RenderSettings(*SIZE, ambient=(0.01, 0.01, 0.01),
                                   background=(0.02, 0.02, 0.03))


def scene_textured_quad():
    r = _registry()
    pts, tris = plane_surface((2.0, 2.0))
    # Planar UVs over the quad footprint (plane lies in XY).
    p = np.asarray(pts)
    uv = np.stack([(p[:, 0] + 1.0) * 0.5, (p[:, 1] + 1.0) * 0.5], 1)
    yy, xx = np.mgrid[0:64, 0:64]
    checker = ((xx // 8 + yy // 8) % 2).astype(np.uint8)
    tex = np.zeros((64, 64, 4), np.uint8)
    tex[..., 0] = 40 + 200 * checker
    tex[..., 1] = 60 + 140 * (1 - checker)
    tex[..., 2] = 160
    tex[..., 3] = 255
    e = _add(r, pts, tris, mat=VisualMaterial(texture=tex))
    r.get(e, MeshSurface).uvs = uv
    _sun(r)
    return r, None, RenderSettings(*SIZE)


def scene_morph_blend():
    r = _registry()
    pts, tris = icosphere_surface(2)
    pts = np.asarray(pts)
    bulge = pts * np.array([0.8, 0.1, -0.2])  # anisotropic morph delta
    e = _add(r, pts, tris)
    ms = r.get(e, MeshSurface)
    ms.morph_targets = bulge[None]
    ms.morph_weights = np.array([0.6])
    _sun(r)
    return r, None, RenderSettings(*SIZE)


def scene_hemisphere_env():
    r = _registry()
    pts, tris = uv_sphere_surface(0.5, 12, 24)
    _add(r, pts, tris, mat=VisualMaterial(base_color=np.array([0.75, 0.75, 0.78, 1.0]),
                                          metallic=0.8, roughness=0.25))
    return r, None, RenderSettings(*SIZE, sky=(0.5, 0.62, 0.8), ground=(0.25, 0.2, 0.15))


def scene_parented_transforms():
    r = _registry()
    pts, tris = cuboid_surface((0.5, 0.5, 0.5))
    root = _add(r, pts, tris, pos=(0, 0, 0), name="root")
    child = _add(r, pts, tris, pos=(1.6, 0.9, 0), name="child", scale=0.6, parent=root)
    _add(r, pts, tris, pos=(1.6, 0.9, 0), name="grandchild", scale=0.6, parent=child)
    tr = r.get(root, Transform)
    tr.rotation = np.array([np.cos(np.pi / 8), 0.0, np.sin(np.pi / 8), 0.0])
    _sun(r)
    return r, None, RenderSettings(*SIZE)


def scene_supersampled():
    r = _registry()
    pts, tris = torus_surface(0.5, 0.2, 20, 10)
    _add(r, pts, tris, mat=VisualMaterial(base_color=np.array([0.3, 0.7, 0.45, 1.0])))
    _sun(r)
    return r, None, RenderSettings(*SIZE, supersample=2)


def scene_ibl_spheres():
    r = _registry()
    pts, tris = icosphere_surface(2)
    for i, rough in enumerate((0.1, 0.4, 0.8)):
        _add(r, np.asarray(pts) * 0.45, tris, pos=(i * 1.1, 0, 0),
             mat=VisualMaterial(base_color=np.array([0.95, 0.95, 0.95, 1.0]),
                                metallic=1.0, roughness=rough))
    env = np.zeros((32, 64, 3), np.float32)
    env[:16] = (0.3, 0.5, 1.2)
    env[16:] = (0.5, 0.35, 0.2)
    env[4:8, 10:14] = (40.0, 38.0, 30.0)  # sun blob
    return r, None, RenderSettings(*SIZE, ambient=(0.0, 0.0, 0.0), environment=env)


SCENES = {
    "ibl_spheres": scene_ibl_spheres,
    "primitives_line": scene_primitives_line,
    "torus_wireframe": scene_torus_wireframe,
    "cuboid_flat_pointlight": scene_cuboid_flat_pointlight,
    "spotlight_floor": scene_spotlight_floor,
    "pbr_grid": scene_pbr_grid,
    "emissive_dark": scene_emissive_dark,
    "textured_quad": scene_textured_quad,
    "morph_blend": scene_morph_blend,
    "hemisphere_env": scene_hemisphere_env,
    "parented_transforms": scene_parented_transforms,
    "supersampled": scene_supersampled,
}


def render_case(name) -> np.ndarray:
    """Render one corpus scene to a quantized uint8 RGB image."""
    r, cam, settings = SCENES[name]()
    view = render_scene(r, camera=cam, settings=settings)
    img = np.asarray(view.image())
    return np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)


def main():
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    lines = []
    for name in SCENES:
        img = render_case(name)
        path = os.path.join(FIXTURE_DIR, f"{name}.png")
        save_png(path, img.astype(np.float64) / 255.0)
        digest = hashlib.sha256(img.tobytes()).hexdigest()[:16]
        lines.append(f"{name} {img.shape[1]}x{img.shape[0]} {digest}")
        print(lines[-1])
    with open(os.path.join(FIXTURE_DIR, "MANIFEST.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
