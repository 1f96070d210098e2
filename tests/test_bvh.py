"""BVH queries vs closed forms: sphere closest point, curvature 1/R, cube volume
(the reference's MeshBvhTest discipline)."""

import numpy as np

from mesheditor_tpu.mesh import cuboid_surface, icosphere_surface
from mesheditor_tpu.mesh.bvh import (
    build_bvh,
    closest_point,
    enclosed_volume,
    vertex_mean_curvature,
)


class TestClosestPoint:
    def test_sphere_closest_point(self):
        pts, tris = icosphere_surface(3)
        bvh = build_bvh(pts, tris)
        for q in ([2.0, 0.0, 0.0], [0.0, -3.0, 0.5], [0.1, 0.1, 0.1]):
            cp, tri, dist = closest_point(bvh, np.asarray(q))
            # Closest point lies on the unit-ish sphere; distance ~ | |q| - 1 |.
            r = np.linalg.norm(q)
            assert abs(np.linalg.norm(cp) - 1.0) < 0.01
            assert abs(dist - abs(r - 1.0)) < 0.02
            assert 0 <= tri < tris.shape[0]

    def test_matches_bruteforce(self):
        pts, tris = cuboid_surface((0.3, 0.2, 0.1))
        bvh = build_bvh(pts, tris)
        rng = np.random.default_rng(0)
        from mesheditor_tpu.mesh.bvh import _closest_on_triangles

        for q in rng.standard_normal((10, 3)):
            cp, _, dist = closest_point(bvh, q)
            _, d2 = _closest_on_triangles(q, pts[tris.astype(int)])
            assert abs(dist - np.sqrt(d2.min())) < 1e-9


class TestVolume:
    def test_cube_volume(self):
        pts, tris = cuboid_surface((0.5, 0.5, 0.5))
        assert abs(enclosed_volume(pts, tris) - 1.0) < 1e-12

    def test_sphere_volume(self):
        pts, tris = icosphere_surface(3)
        v = enclosed_volume(pts, tris)
        assert abs(v - 4 / 3 * np.pi) < 0.05 * 4 / 3 * np.pi


class TestCurvature:
    def test_sphere_curvature_is_inverse_radius(self):
        for radius in (1.0, 2.0):
            pts, tris = icosphere_surface(3)
            pts = pts * radius
            h = vertex_mean_curvature(pts, tris)
            assert abs(np.median(h) - 1.0 / radius) < 0.1 / radius
            assert (h > 0).mean() > 0.95  # convex everywhere
