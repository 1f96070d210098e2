"""Deferred shading: G-buffer -> lit RGB image, one jitted pass.

Metallic-roughness PBR (the reference's glTF-aligned material model,
src/shaders + README.md:85-88 dynamic PBR feature set) with punctual lights
(KHR_lights_punctual semantics: directional / point / spot with smooth cone falloff).
Flat, smooth, and wireframe-overlay modes mirror the reference's mesh render modes
(README.md:22 "flat/smooth shading, wireframe").
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

LIGHT_DIRECTIONAL = 0
LIGHT_POINT = 1
LIGHT_SPOT = 2


class MaterialTable(NamedTuple):
    """Per-object material factors (glTF pbrMetallicRoughness).

    The optional extension rows carry the shaded KHR_materials_* subset (the
    reference shades the full set through its glTF-Sample-Renderer-derived BRDF,
    /root/reference/README.md:85-119). All-None extension rows keep the legacy
    shader path byte-identical (the committed render-corpus goldens)."""

    base_color: jax.Array  # (O, 4) linear rgba
    metallic: jax.Array    # (O,)
    roughness: jax.Array   # (O,)
    emissive: jax.Array    # (O, 3) — emissive_strength pre-multiplied at build
    # KHR_texture_transform rows [off_u, off_v, rot, scale_u, scale_v]; identity rows
    # leave UVs untouched, so untransformed materials cost nothing extra.
    uv_transform: jax.Array = None  # (O, 5) or None
    # Dielectric F0 rgb = ((ior-1)/(ior+1))^2 * specularColor * specular, clipped to
    # [0, 1] (KHR_materials_ior + KHR_materials_specular). None = the 0.04 default.
    f0_color: jax.Array = None  # (O, 3) or None
    # [unlit, clearcoat, clearcoat_roughness, sheen_roughness, transmission, specular]
    ext: jax.Array = None  # (O, 6) or None
    sheen_color: jax.Array = None  # (O, 3) or None

    @staticmethod
    def default(n: int, base_color=(0.48, 0.65, 0.76, 1.0), metallic=0.2, roughness=0.7):
        return MaterialTable(
            base_color=jnp.tile(jnp.asarray(base_color, jnp.float32), (max(n, 1), 1)),
            metallic=jnp.full(max(n, 1), metallic, jnp.float32),
            roughness=jnp.full(max(n, 1), roughness, jnp.float32),
            emissive=jnp.zeros((max(n, 1), 3), jnp.float32),
        )


class TextureAtlas(NamedTuple):
    """All scene baseColor textures packed into one device array (the reference's
    bindless texture table, src/render/Textures.*): per-object rows give the
    sub-rectangle; shading samples bilinearly with REPEAT wrap inside it."""

    atlas: jax.Array  # (AH, AW, 3) f32, linear color
    rect: jax.Array   # (O, 4) f32: y0, height_px, width_px, has_texture flag


def srgb_to_linear(c: np.ndarray) -> np.ndarray:
    c = np.asarray(c, np.float32)
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def build_atlas(textures: list, srgb: bool = True) -> TextureAtlas | None:
    """Pack per-object (h, w, 4) uint8 textures (or None/empty) vertically into one
    atlas. `srgb` decodes color textures to linear; normal/ORM/occlusion data stays
    raw [0, 1]. Returns None when nothing is textured."""
    sizes = [(t.shape[0], t.shape[1]) for t in textures
             if t is not None and t.size > 0]
    if not sizes:
        return None
    aw = max(w for _, w in sizes)
    ah = sum(h for h, _ in sizes)
    atlas = np.zeros((ah, aw, 3), np.float32)
    rect = np.zeros((len(textures), 4), np.float32)
    y = 0
    for i, t in enumerate(textures):
        if t is None or t.size == 0:
            continue
        h, w = t.shape[0], t.shape[1]
        raw = np.asarray(t[..., :3], np.float32) / 255.0
        atlas[y:y + h, :w] = srgb_to_linear(raw) if srgb else raw
        rect[i] = (y, h, w, 1.0)
        y += h
    return TextureAtlas(jnp.asarray(atlas), jnp.asarray(rect))


class LightBank(NamedTuple):
    """Punctual lights, padded; zero-color entries contribute nothing."""

    kind: jax.Array       # (L,) int32
    position: jax.Array   # (L, 3) point/spot position
    direction: jax.Array  # (L, 3) directional/spot direction (pointing from the light)
    color: jax.Array      # (L, 3) color * intensity, linear
    cone_cos: jax.Array   # (L, 2) [outer, inner] cos cutoffs for spots

    @staticmethod
    def default():
        """Key + fill directional pair — the headless default rig."""
        return LightBank(
            kind=jnp.zeros(2, jnp.int32),
            position=jnp.zeros((2, 3), jnp.float32),
            direction=jnp.asarray(
                [[-0.5, -0.8, -0.6], [0.7, -0.2, 0.5]], jnp.float32
            ),
            color=jnp.asarray([[2.6, 2.55, 2.5], [0.7, 0.75, 0.8]], jnp.float32),
            cone_cos=jnp.zeros((2, 2), jnp.float32),
        )

    @staticmethod
    def from_lists(kinds, positions, directions, colors, cones=None):
        n = max(len(kinds), 1)
        if not len(kinds):
            return LightBank(jnp.zeros(1, jnp.int32), jnp.zeros((1, 3), jnp.float32),
                             jnp.asarray([[0, -1, 0]], jnp.float32),
                             jnp.zeros((1, 3), jnp.float32),
                             jnp.zeros((1, 2), jnp.float32))
        cones = cones if cones is not None else [(0.0, 0.0)] * n
        return LightBank(
            kind=jnp.asarray(np.asarray(kinds, np.int32)),
            position=jnp.asarray(np.asarray(positions, np.float32).reshape(n, 3)),
            direction=jnp.asarray(np.asarray(directions, np.float32).reshape(n, 3)),
            color=jnp.asarray(np.asarray(colors, np.float32).reshape(n, 3)),
            cone_cos=jnp.asarray(np.asarray(cones, np.float32).reshape(n, 2)),
        )


def _normalize(v, axis=-1):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), 1e-12)


def _ggx_brdf(n, v, l, albedo, metallic, roughness, f0_diel=None, f90=None,
              cc=None, cc_rough=None, sheen_col=None, sheen_rough=None,
              diffuse_scale=None):
    """Cook-Torrance GGX specular + Lambert diffuse, Smith height-correlated.

    Extension lobes (all optional, traced away when None — the reference's
    specialization-constant feature mask, README.md:87): dielectric F0 override
    (ior/specular), clearcoat second GGX lobe at fixed 0.04 F0, Charlie sheen,
    and a diffuse attenuation (transmission removes diffuse energy)."""
    h = _normalize(v + l)
    ndl = jnp.maximum(jnp.sum(n * l, -1), 0.0)
    ndv = jnp.maximum(jnp.sum(n * v, -1), 1e-4)
    ndh = jnp.maximum(jnp.sum(n * h, -1), 0.0)
    vdh = jnp.maximum(jnp.sum(v * h, -1), 0.0)
    a = jnp.maximum(roughness * roughness, 1e-3)
    a2 = a * a
    d = a2 / jnp.maximum(jnp.pi * ((ndh * ndh) * (a2 - 1.0) + 1.0) ** 2, 1e-9)
    k = (roughness + 1.0) ** 2 / 8.0
    g = (ndv / (ndv * (1 - k) + k)) * (ndl / jnp.maximum(ndl * (1 - k) + k, 1e-9))
    diel = 0.04 if f0_diel is None else f0_diel
    f0 = diel * (1.0 - metallic[..., None]) + albedo * metallic[..., None]
    f90v = 1.0 if f90 is None else f90[..., None]
    f = f0 + (f90v - f0) * (1.0 - vdh[..., None]) ** 5
    spec = d[..., None] * g[..., None] * f / jnp.maximum(4.0 * ndv * ndl, 1e-9)[..., None]
    kd = (1.0 - f) * (1.0 - metallic[..., None])
    if diffuse_scale is not None:
        kd = kd * diffuse_scale[..., None]
    out = (kd * albedo / jnp.pi + spec) * ndl[..., None]
    if sheen_col is not None:
        # Charlie NDF (glTF sheen), Ashikhmin visibility approximation.
        sa = jnp.maximum(sheen_rough * sheen_rough, 1e-3)
        inv_a = 1.0 / sa
        sin2h = jnp.maximum(1.0 - ndh * ndh, 1e-6)
        d_ch = (2.0 + inv_a) * jnp.power(sin2h, inv_a * 0.5) / (2.0 * jnp.pi)
        vis = 1.0 / jnp.maximum(4.0 * (ndl + ndv - ndl * ndv), 1e-6)
        out = out + sheen_col * (d_ch * vis * ndl)[..., None]
    if cc is not None:
        # Clearcoat: second GGX lobe, fixed 1.5-ior (0.04) F0, its own roughness;
        # base layer attenuated by the coat's Fresnel (glTF layering rule).
        ca = jnp.maximum(cc_rough * cc_rough, 1e-3)
        ca2 = ca * ca
        d_c = ca2 / jnp.maximum(jnp.pi * ((ndh * ndh) * (ca2 - 1.0) + 1.0) ** 2, 1e-9)
        kc = (cc_rough + 1.0) ** 2 / 8.0
        g_c = (ndv / (ndv * (1 - kc) + kc)) * (ndl / jnp.maximum(ndl * (1 - kc) + kc, 1e-9))
        f_c = 0.04 + 0.96 * (1.0 - vdh) ** 5
        spec_c = d_c * g_c * f_c / jnp.maximum(4.0 * ndv * ndl, 1e-9)
        out = out * (1.0 - (cc * f_c)[..., None]) + (cc * spec_c * ndl)[..., None]
    return out


def _sample_atlas(atlas, rect, obj, uv):
    """Bilinear REPEAT-wrapped sample of each pixel's object texture sub-rect.
    uv: (H, W, 2); obj: (H, W) int; returns ((H, W, 3) color, (H, W) flag)."""
    r = rect[obj]  # (H, W, 4)
    y0, th, tw, flag = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    fx = jnp.clip(u * tw - 0.5, 0.0, jnp.maximum(tw - 1.0, 0.0))
    fy = jnp.clip(v * th - 0.5, 0.0, jnp.maximum(th - 1.0, 0.0))
    x0 = jnp.floor(fx)
    y0f = jnp.floor(fy)
    ax = (fx - x0)[..., None]
    ay = (fy - y0f)[..., None]
    ah, aw = atlas.shape[0], atlas.shape[1]

    def tex(ix, iy):
        ix = jnp.clip(ix, 0, aw - 1).astype(jnp.int32)
        iy = jnp.clip(iy, 0, ah - 1).astype(jnp.int32)
        return atlas[iy, ix]

    gx0 = x0
    gy0 = y0 + y0f
    c = ((1 - ax) * (1 - ay) * tex(gx0, gy0)
         + ax * (1 - ay) * tex(gx0 + 1, gy0)
         + (1 - ax) * ay * tex(gx0, gy0 + 1)
         + ax * ay * tex(gx0 + 1, gy0 + 1))
    return c, flag


@partial(jax.jit, static_argnums=(8, 9, 10))
def _shade_impl(gbuf, positions, normals, tris, tri_obj, materials, lights, extras,
                flat, wireframe, wire_only, uvs=None, tex=None, mr_tex=None,
                em_tex=None, nrm_tex=None, occ_tex=None, tangents=None, env=None):
    depth, tri, bary = gbuf
    eye, ambient, background, wire_color, wire_eps = extras[:5]
    valid = tri >= 0
    t = jnp.maximum(tri, 0)
    vid = tris[t]                      # (H, W, 3)
    p3 = positions[vid]                # (H, W, 3, 3)
    pos = jnp.einsum("hwk,hwkc->hwc", bary, p3)
    n_flat = _normalize(jnp.cross(p3[..., 1, :] - p3[..., 0, :],
                                  p3[..., 2, :] - p3[..., 0, :]))
    if flat:
        n = n_flat
    else:
        n = _normalize(jnp.einsum("hwk,hwkc->hwc", bary, normals[vid]))
    view = _normalize(eye[None, None, :] - pos)
    # Double-sided: face the viewer (the reference renders mesh interiors too).
    n = jnp.where(jnp.sum(n * view, -1, keepdims=True) < 0, -n, n)

    obj = tri_obj[t]
    uv = None
    if uvs is not None:
        uv = jnp.einsum("hwk,hwkc->hwc", bary, uvs[vid])
        if materials.uv_transform is not None:
            # KHR_texture_transform: UV' = Translate * Rotate * Scale * UV.
            tr = materials.uv_transform[obj]  # (H, W, 5)
            su, sv = uv[..., 0] * tr[..., 3], uv[..., 1] * tr[..., 4]
            cr, sr = jnp.cos(tr[..., 2]), jnp.sin(tr[..., 2])
            uv = jnp.stack([cr * su + sr * sv + tr[..., 0],
                            -sr * su + cr * sv + tr[..., 1]], -1)

    # Tangent-space normal mapping (glTF normalTexture, +Z out): interpolated
    # tangent Gram-Schmidt-orthogonalized against the shading normal.
    if nrm_tex is not None and uv is not None and tangents is not None:
        ts, ts_flag = _sample_atlas(nrm_tex.atlas, nrm_tex.rect, obj, uv)
        tan = jnp.einsum("hwk,hwkc->hwc", bary, tangents[vid])
        tan = _normalize(tan - n * jnp.sum(tan * n, -1, keepdims=True))
        bit = jnp.cross(n, tan)
        nm = ts * 2.0 - 1.0
        n_mapped = _normalize(nm[..., 0:1] * tan + nm[..., 1:2] * bit
                              + nm[..., 2:3] * n)
        n = jnp.where(ts_flag[..., None] > 0, n_mapped, n)

    albedo = materials.base_color[obj][..., :3]
    if tex is not None and uv is not None:
        tex_c, tex_flag = _sample_atlas(tex.atlas, tex.rect, obj, uv)
        albedo = albedo * jnp.where(tex_flag[..., None] > 0, tex_c, 1.0)
    metallic = materials.metallic[obj]
    roughness = materials.roughness[obj]
    emissive = materials.emissive[obj]
    if mr_tex is not None and uv is not None:
        # glTF ORM channels: G = roughness, B = metallic; factors multiply.
        mr_c, mr_flag = _sample_atlas(mr_tex.atlas, mr_tex.rect, obj, uv)
        roughness = roughness * jnp.where(mr_flag > 0, mr_c[..., 1], 1.0)
        metallic = metallic * jnp.where(mr_flag > 0, mr_c[..., 2], 1.0)
    if em_tex is not None and uv is not None:
        em_c, em_flag = _sample_atlas(em_tex.atlas, em_tex.rect, obj, uv)
        emissive = emissive * jnp.where(em_flag[..., None] > 0, em_c, 1.0)
    occlusion = 1.0
    if occ_tex is not None and uv is not None:
        oc_c, oc_flag = _sample_atlas(occ_tex.atlas, occ_tex.rect, obj, uv)
        occlusion = jnp.where(oc_flag > 0, oc_c[..., 0], 1.0)[..., None]

    # KHR_materials_* per-pixel rows (None when every material is default — the
    # legacy path stays byte-identical for the committed corpus goldens).
    f0_diel = f90 = cc = cc_rough = sheen_col = sheen_rough = None
    transmission = unlit_mask = diffuse_scale = None
    if materials.ext is not None:
        extm = materials.ext[obj]  # (H, W, 6)
        unlit_mask = extm[..., 0]
        cc = extm[..., 1]
        cc_rough = extm[..., 2]
        sheen_rough = extm[..., 3]
        transmission = extm[..., 4]
        f90 = extm[..., 5]  # specularFactor scales the grazing reflectance too
        diffuse_scale = 1.0 - transmission
        if materials.f0_color is not None:
            f0_diel = materials.f0_color[obj]
        if materials.sheen_color is not None:
            sheen_col = materials.sheen_color[obj]

    # Hemisphere environment term (the IBL-lite analog of the reference's prefiltered
    # environment lighting, src/render/IblPrefilterPipelines.h): sky/ground colors
    # blended by the normal's up-ness, replacing the flat ambient when enabled.
    sky, ground = extras[5], extras[6]
    upness = 0.5 * (n[..., 1] + 1.0)
    hemi = sky[None, None, :] * upness[..., None] \
        + ground[None, None, :] * (1.0 - upness[..., None])

    def add_light(color, i):
        kind = lights.kind[i]
        lpos = lights.position[i]
        ldir = _normalize(lights.direction[i])
        lcol = lights.color[i]
        to_light = lpos[None, None, :] - pos
        dist2 = jnp.maximum(jnp.sum(to_light * to_light, -1), 1e-9)
        l_point = to_light / jnp.sqrt(dist2)[..., None]
        l = jnp.where(kind == LIGHT_DIRECTIONAL, -ldir[None, None, :], l_point)
        atten = jnp.where(kind == LIGHT_DIRECTIONAL, 1.0, 1.0 / dist2)
        cd = jnp.sum(-l * ldir[None, None, :], -1)
        outer, inner = lights.cone_cos[i, 0], lights.cone_cos[i, 1]
        spot = jnp.clip((cd - outer) / jnp.maximum(inner - outer, 1e-6), 0.0, 1.0)
        atten = jnp.where(kind == LIGHT_SPOT, atten * spot * spot, atten)
        contrib = _ggx_brdf(n, view, l, albedo, metallic, roughness,
                            f0_diel=f0_diel, f90=f90, cc=cc, cc_rough=cc_rough,
                            sheen_col=sheen_col, sheen_rough=sheen_rough,
                            diffuse_scale=diffuse_scale)
        return color + contrib * (lcol[None, None, :] * atten[..., None]), None

    # Occlusion (glTF occlusionTexture R) darkens only the indirect terms.
    indirect_diffuse = (ambient[None, None, :] + hemi) * albedo * occlusion
    if diffuse_scale is not None:
        indirect_diffuse = indirect_diffuse * diffuse_scale[..., None]
    color = emissive + indirect_diffuse
    if env is not None:
        from .environment import shade_ibl

        color = color + shade_ibl(env, n, view, albedo, metallic, roughness) * occlusion
    color, _ = jax.lax.scan(add_light, color, jnp.arange(lights.kind.shape[0]))

    if transmission is not None:
        # KHR_materials_transmission, IBL/background form (the reference's "real
        # transmission off" mode samples the environment, README.md:93-119): the
        # transmitted fraction tints what lies behind by baseColor. Refraction and
        # volume absorption are not modeled.
        if env is not None:
            from .environment import sample_equirect

            behind = sample_equirect(env.specular[0], -view)  # sharpest level
        else:
            behind = background[None, None, :] * jnp.ones_like(albedo)
        color = color + (transmission[..., None]) * albedo * behind

    # Reinhard tone map + gamma 2.2 (deterministic, no exposure adaptation).
    color = color / (1.0 + color)
    color = jnp.power(jnp.maximum(color, 0.0), 1.0 / 2.2)
    if unlit_mask is not None:
        # KHR_materials_unlit: baseColor shown as authored — no lighting, no tone map
        # (only the display gamma).
        flat_col = jnp.power(jnp.maximum(albedo, 0.0), 1.0 / 2.2)
        color = jnp.where(unlit_mask[..., None] > 0.5, flat_col, color)

    if wireframe or wire_only:
        edge = jnp.min(bary, axis=-1) < wire_eps
        if wire_only:
            color = jnp.where((valid & edge)[..., None], wire_color[None, None, :],
                              background[None, None, :])
            return jnp.clip(color, 0.0, 1.0)
        color = jnp.where(edge[..., None], wire_color[None, None, :], color)

    color = jnp.where(valid[..., None], color, background[None, None, :])
    return jnp.clip(color, 0.0, 1.0)


def shade(gbuf, positions, normals, tris, tri_obj, materials: MaterialTable,
          lights: LightBank, eye, ambient=(0.06, 0.06, 0.07),
          background=(0.125, 0.133, 0.153), flat=False, wireframe=False,
          wire_only=False, wire_color=(0.9, 0.65, 0.1), wire_eps=0.02,
          uvs=None, atlas: TextureAtlas | None = None,
          sky=(0.0, 0.0, 0.0), ground=(0.0, 0.0, 0.0),
          mr_atlas: TextureAtlas | None = None,
          emissive_atlas: TextureAtlas | None = None,
          normal_atlas: TextureAtlas | None = None,
          occlusion_atlas: TextureAtlas | None = None,
          tangents=None, environment=None):
    """Light the G-buffer. positions/normals are world-space per-vertex arrays;
    tri_obj maps each triangle to its object row in `materials`. With `uvs` (N, 2)
    and TextureAtlases, the full glTF texture set modulates the factors: baseColor
    (sRGB), metallicRoughness (linear ORM G/B), emissive (sRGB), occlusion (linear R,
    indirect light only) and tangent-space normals (`tangents` (N, 3) required).
    Nonzero sky/ground add a hemisphere environment term on top of the flat ambient."""
    tris = jnp.asarray(np.asarray(tris, np.int32).reshape(-1, 3))
    extras = (
        jnp.asarray(eye, jnp.float32),
        jnp.asarray(ambient, jnp.float32),
        jnp.asarray(background, jnp.float32),
        jnp.asarray(wire_color, jnp.float32),
        jnp.float32(wire_eps),
        jnp.asarray(sky, jnp.float32),
        jnp.asarray(ground, jnp.float32),
    )
    uv_arr = None
    any_tex = any(a is not None for a in (atlas, mr_atlas, emissive_atlas,
                                          normal_atlas, occlusion_atlas))
    if any_tex and uvs is not None:
        uv_arr = jnp.asarray(np.asarray(uvs, np.float32).reshape(-1, 2))
    tan_arr = None
    if tangents is not None and normal_atlas is not None:
        tan_arr = jnp.asarray(np.asarray(tangents, np.float32).reshape(-1, 3))
    off = uv_arr is None
    return _shade_impl(
        gbuf, jnp.asarray(positions, jnp.float32), jnp.asarray(normals, jnp.float32),
        tris, jnp.asarray(np.asarray(tri_obj, np.int32)), materials, lights, extras,
        bool(flat), bool(wireframe), bool(wire_only),
        uvs=uv_arr, tex=None if off else atlas,
        mr_tex=None if off else mr_atlas,
        em_tex=None if off else emissive_atlas,
        nrm_tex=None if off or tan_arr is None else normal_atlas,
        occ_tex=None if off else occlusion_atlas,
        tangents=tan_arr,
        env=environment,
    )


def vertex_tangents(positions, tris, uvs) -> np.ndarray:
    """Per-vertex tangents from UV-space triangle derivatives (host-side): the
    standard accumulate-and-normalize used to light glTF normalTexture payloads.
    Degenerate-UV triangles contribute nothing; zero rows fall back to +X."""
    positions = np.asarray(positions, np.float64)
    uvs = np.asarray(uvs, np.float64)
    tris = np.asarray(tris, np.int64).reshape(-1, 3)
    e1 = positions[tris[:, 1]] - positions[tris[:, 0]]
    e2 = positions[tris[:, 2]] - positions[tris[:, 0]]
    d1 = uvs[tris[:, 1]] - uvs[tris[:, 0]]
    d2 = uvs[tris[:, 2]] - uvs[tris[:, 0]]
    det = d1[:, 0] * d2[:, 1] - d2[:, 0] * d1[:, 1]
    ok = np.abs(det) > 1e-20
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tan = (e1 * d2[:, 1:2] - e2 * d1[:, 1:2]) * inv[:, None]
    out = np.zeros_like(positions)
    for k in range(3):
        np.add.at(out, tris[:, k], tan)
    norm = np.linalg.norm(out, axis=1, keepdims=True)
    out = np.divide(out, norm, out=np.zeros_like(out), where=norm > 1e-20)
    out[np.all(out == 0, axis=1)] = (1.0, 0.0, 0.0)
    return out.astype(np.float32)


def vertex_normals(positions, tris) -> np.ndarray:
    """Area-weighted smooth vertex normals (host-side, reused by exports)."""
    positions = np.asarray(positions, np.float64)
    tris = np.asarray(tris, np.int64).reshape(-1, 3)
    fn = np.cross(positions[tris[:, 1]] - positions[tris[:, 0]],
                  positions[tris[:, 2]] - positions[tris[:, 0]])
    out = np.zeros_like(positions)
    for k in range(3):
        np.add.at(out, tris[:, k], fn)
    norm = np.linalg.norm(out, axis=1, keepdims=True)
    out = np.divide(out, norm, out=np.zeros_like(out), where=norm > 1e-20)
    return out.astype(np.float32)
