"""Quadric edge-collapse simplification (reference: SimplifySurface, Tets.cpp:249-261)."""

import numpy as np

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu.mesh import cuboid_surface, icosphere_surface, torus_surface
from mesheditor_tpu.mesh.simplify import simplify_surface


def signed_volume(pts, tris):
    tris = tris.astype(int)
    v0, v1, v2 = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
    return float(np.einsum("ij,ij->", v0, np.cross(v1, v2)) / 6.0)


def edge_counts(tris):
    e = np.sort(np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]]), axis=1)
    return np.unique(e, axis=0, return_counts=True)


class TestSimplify:
    def test_reaches_target_and_stays_manifold(self):
        pts, tris = icosphere_surface(3)
        for ratio in (0.5, 0.25, 0.1):
            p2, t2 = simplify_surface(pts, tris, ratio)
            assert t2.shape[0] <= int(tris.shape[0] * ratio) * 1.2 + 8
            _, counts = edge_counts(t2)
            assert (counts == 2).all()  # closed surface stays watertight

    def test_preserves_volume(self):
        pts, tris = icosphere_surface(3)
        v_in = signed_volume(pts, tris.astype(int))
        p2, t2 = simplify_surface(pts, tris, 0.25)
        assert abs(signed_volume(p2, t2) / v_in - 1.0) < 0.03
        pts, tris = torus_surface(0.06, 0.025, 32, 16)
        v_in = signed_volume(pts, tris.astype(int))
        p2, t2 = simplify_surface(pts, tris, 0.25)
        assert abs(signed_volume(p2, t2) / v_in - 1.0) < 0.03

    def test_error_bound_protects_coarse_features(self):
        # A 12-triangle cube cannot lose triangles without moving the surface beyond
        # the 5% error bound — error-bounded collapse stops short (reference contract:
        # meshopt target_error, Tets.cpp:258).
        pts, tris = cuboid_surface((0.1, 0.1, 0.1))
        p2, t2 = simplify_surface(pts, tris, 0.5)
        assert t2.shape[0] == tris.shape[0]
        assert abs(signed_volume(p2, t2) / signed_volume(pts, tris.astype(int)) - 1.0) < 1e-9

    def test_open_boundary_preserved(self):
        n = 17
        x, y = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
        pts = np.stack([x.ravel(), y.ravel(), np.zeros(n * n)], 1)
        idx = np.arange(n * n).reshape(n, n)
        t1 = np.stack([idx[:-1, :-1], idx[1:, :-1], idx[1:, 1:]], -1).reshape(-1, 3)
        t2_ = np.stack([idx[:-1, :-1], idx[1:, 1:], idx[:-1, 1:]], -1).reshape(-1, 3)
        tris = np.concatenate([t1, t2_])
        p2, t2 = simplify_surface(pts, tris, 0.2)
        assert t2.shape[0] < tris.shape[0] // 3
        eu, counts = edge_counts(t2)
        bverts = np.unique(eu[counts == 1].ravel())
        bp = p2[bverts]
        border_dist = np.minimum.reduce(
            [np.abs(bp[:, 0]), np.abs(bp[:, 0] - 1), np.abs(bp[:, 1]), np.abs(bp[:, 1] - 1)]
        )
        assert border_dist.max() < 1e-6  # flat patch: border vertices stay on the border
        for corner in ((0, 0), (0, 1), (1, 0), (1, 1)):
            assert np.linalg.norm(bp[:, :2] - corner, axis=1).min() < 0.08

    def test_ratio_one_is_identity(self):
        pts, tris = icosphere_surface(2)
        p2, t2 = simplify_surface(pts, tris, 1.0)
        assert np.array_equal(p2, pts)
        assert np.array_equal(t2, tris.astype(np.uint32))
