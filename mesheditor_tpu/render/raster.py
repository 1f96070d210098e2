"""Z-buffered triangle rasterizer as one XLA program.

The reference records multi-draw-indirect Vulkan passes with GPU culling
(src/viewport/ViewportRenderGpu.h:14-43); the TPU-native equivalent is a single jitted
scan over triangle chunks: each step evaluates edge functions for a chunk of triangles
against every pixel center (VPU-friendly dense broadcast work, static shapes) and
z-merges into the carried G-buffer. Output is a deferred-shading G-buffer — depth,
triangle id, perspective-correct barycentrics — the same buffers the reference's
selection compute passes consume (src/selection/SelectionGpu.h:75-81).

Near-plane handling: `clip_near` replaces plane-crossing triangles with their clipped
fans on host (a handful per frame), so the jitted rasterizer stays static-shaped and
never sees a w <= eps vertex; fully-behind triangles drop.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class GBuffer(NamedTuple):
    depth: jax.Array  # (H, W) ndc z in [-1, 1]; +inf where empty
    tri: jax.Array    # (H, W) int32 triangle index; -1 where empty
    bary: jax.Array   # (H, W, 3) perspective-correct barycentrics


def _edge(ax, ay, bx, by, px, py):
    """Signed area of (a, b, p) parallelogram — the rasterizer edge function."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _rasterize_impl(clip, tris, width, height, chunk, cull_back):
    n_chunks = tris.shape[0] // chunk
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    px = xs[None, :]  # (1, W)
    py = ys[:, None]  # (H, 1)

    depth0 = jnp.full((height, width), jnp.inf, jnp.float32)
    tri0 = jnp.full((height, width), -1, jnp.int32)
    bary0 = jnp.zeros((height, width, 3), jnp.float32)

    tris_c = tris.reshape(n_chunks, chunk, 3)
    base_ids = jnp.arange(n_chunks, dtype=jnp.int32)[:, None] * chunk + jnp.arange(
        chunk, dtype=jnp.int32
    )

    def step(carry, inputs):
        depth, tri, bary = carry
        idx, tid = inputs  # (C, 3), (C,)
        v = clip[idx]  # (C, 3, 4)
        w = v[..., 3]
        valid = jnp.all(w > 1e-6, axis=1)  # reject near-plane crossers
        w = jnp.where(w == 0, 1.0, w)
        ndc = v[..., :3] / w[..., None]
        sx = (ndc[..., 0] + 1.0) * (0.5 * width)   # (C, 3)
        sy = (1.0 - ndc[..., 1]) * (0.5 * height)
        nz = ndc[..., 2]

        area = _edge(sx[:, 0], sy[:, 0], sx[:, 1], sy[:, 1], sx[:, 2], sy[:, 2])  # (C,)
        valid &= area != 0.0
        if cull_back:
            # GL CCW front faces flip to clockwise under the screen y-flip.
            valid &= area < 0.0

        # Edge functions at every pixel center: (H, W, C).
        e0 = _edge(sx[:, 1], sy[:, 1], sx[:, 2], sy[:, 2], px[..., None], py[..., None])
        e1 = _edge(sx[:, 2], sy[:, 2], sx[:, 0], sy[:, 0], px[..., None], py[..., None])
        e2 = _edge(sx[:, 0], sy[:, 0], sx[:, 1], sy[:, 1], px[..., None], py[..., None])
        inv_area = 1.0 / area
        b0 = e0 * inv_area
        b1 = e1 * inv_area
        b2 = e2 * inv_area
        cover = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & valid

        z = b0 * nz[:, 0] + b1 * nz[:, 1] + b2 * nz[:, 2]  # (H, W, C)
        cover &= (z >= -1.0) & (z <= 1.0)
        z = jnp.where(cover, z, jnp.inf)

        # Chunk-internal z-resolve, then merge into the carry. Strict less-than keeps
        # the earliest triangle on exact ties — deterministic under the fixed scan order.
        k = jnp.argmin(z, axis=-1)  # (H, W)
        zk = jnp.take_along_axis(z, k[..., None], axis=-1)[..., 0]
        better = zk < depth

        def take(a):  # (H, W, C) -> (H, W) at k
            return jnp.take_along_axis(a, k[..., None], axis=-1)[..., 0]

        # Perspective-correct barycentrics for attribute interpolation.
        iw = 1.0 / w  # (C, 3)
        p0 = b0 * iw[:, 0]
        p1 = b1 * iw[:, 1]
        p2 = b2 * iw[:, 2]
        psum = p0 + p1 + p2
        psum = jnp.where(psum == 0, 1.0, psum)
        new_bary = jnp.stack(
            [take(p0 / psum), take(p1 / psum), take(p2 / psum)], axis=-1
        )

        depth = jnp.where(better, zk, depth)
        tri = jnp.where(better, tid[k], tri)
        bary = jnp.where(better[..., None], new_bary, bary)
        return (depth, tri, bary), None

    (depth, tri, bary), _ = jax.lax.scan(step, (depth0, tri0, bary0), (tris_c, base_ids))
    return GBuffer(depth, tri, bary)


def rasterize(clip, tris, width: int, height: int, chunk: int = 8,
              cull_back: bool = False) -> GBuffer:
    """Rasterize clip-space triangles into a (height, width) G-buffer.

    clip: (N, 4) float clip-space positions (view_projection @ [pos, 1]).
    tris: (T, 3) int vertex indices. Padded internally to a chunk multiple with
    degenerate (0,0,0) triangles, which are zero-area and self-reject.
    """
    clip = jnp.asarray(clip, jnp.float32)
    tris = np.asarray(tris, np.int32).reshape(-1, 3)
    t = tris.shape[0]
    if t == 0:
        tris = np.zeros((chunk, 3), np.int32)
        if clip.shape[0] == 0:
            clip = jnp.zeros((1, 4), jnp.float32)
    elif t % chunk:
        tris = np.concatenate([tris, np.zeros((chunk - t % chunk, 3), np.int32)])
    gbuf = _rasterize_impl(clip, jnp.asarray(tris), int(width), int(height), int(chunk),
                           bool(cull_back))
    # Padding triangles are zero-area and never shade; ids past the real count can't
    # appear, so tri is already a faithful pick buffer.
    return gbuf


def clip_near(clip, tris, eps: float = 1e-4):
    """Host-side near-plane clipping (Sutherland-Hodgman against w = eps in clip
    space): triangles crossing the plane are replaced by their clipped fan; fully
    behind ones drop. Keeps the DEVICE program static-shaped — crossers are a handful
    per frame, so the host pass is cheap, and the rasterizer itself never branches.

    Returns (tris_out, tri_src, new_verts) where `tri_src` maps every output triangle
    to its source triangle id (picking stays in source-triangle space) and `new_verts`
    is a (K, 3) array of (parent_a, parent_b, t) lerp recipes for the K vertices
    appended past the original count — clip space is linear in world space, so the
    same t interpolates world attributes."""
    clip = np.asarray(clip, np.float64)
    tris = np.asarray(tris, np.int64).reshape(-1, 3)
    if tris.shape[0] == 0:
        return tris.astype(np.int32), np.arange(0, dtype=np.int32), np.zeros((0, 3))
    w = clip[:, 3]
    inside = w[tris] > eps  # (T, 3)
    n_in = inside.sum(axis=1)
    keep = n_in == 3
    crossing = np.flatnonzero((n_in > 0) & (n_in < 3))
    if crossing.size == 0:
        kept = np.flatnonzero(keep)
        return tris[kept].astype(np.int32), kept.astype(np.int32), np.zeros((0, 3))

    out_tris = [tris[keep]]
    out_src = [np.flatnonzero(keep)]
    new_verts = []
    next_id = clip.shape[0]

    def cut(a, b):
        # Intersection of edge (a, b) with w = eps; t from linearity of w in clip space.
        nonlocal next_id
        t = (eps - w[a]) / (w[b] - w[a])
        new_verts.append((a, b, float(t)))
        next_id += 1
        return next_id - 1

    for ti in crossing:
        poly = []
        ids = tris[ti]
        ins = inside[ti]
        for k in range(3):
            a, b = ids[k], ids[(k + 1) % 3]
            if ins[k]:
                poly.append(int(a))
            if ins[k] != ins[(k + 1) % 3]:
                poly.append(cut(int(a), int(b)))
        for k in range(1, len(poly) - 1):  # fan
            out_tris.append(np.array([[poly[0], poly[k], poly[k + 1]]]))
            out_src.append(np.array([ti]))
    return (np.concatenate(out_tris).astype(np.int32),
            np.concatenate(out_src).astype(np.int32),
            np.asarray(new_verts, np.float64).reshape(-1, 3))


def project_points(mvp, positions) -> jnp.ndarray:
    """(N, 3) world points -> (N, 4) clip space under a 4x4 MVP."""
    positions = jnp.asarray(positions, jnp.float32)
    mvp = jnp.asarray(mvp, jnp.float32)
    hom = jnp.concatenate([positions, jnp.ones((positions.shape[0], 1), jnp.float32)], 1)
    return hom @ mvp.T


def screen_coords(clip, width: int, height: int) -> np.ndarray:
    """Clip -> pixel coordinates (x right, y down), for host-side selection math."""
    clip = np.asarray(clip, np.float64)
    w = np.where(clip[:, 3] == 0, 1.0, clip[:, 3])
    ndc = clip[:, :3] / w[:, None]
    return np.stack([(ndc[:, 0] + 1) * 0.5 * width, (1 - ndc[:, 1]) * 0.5 * height], 1)
