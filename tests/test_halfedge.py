"""Half-edge mesh topology queries vs combinatorial facts."""

import numpy as np

from mesheditor_tpu.mesh import cuboid_surface, icosphere_surface, plane_surface
from mesheditor_tpu.mesh.halfedge import build_halfedge


class TestHalfEdge:
    def test_closed_sphere(self):
        pts, tris = icosphere_surface(2)
        m = build_halfedge(pts, tris)
        assert m.is_closed()
        # Euler: V - E + F = 2 for a sphere.
        assert pts.shape[0] - m.edges().shape[0] + tris.shape[0] == 2
        # Icosphere valence: 12 original vertices have 5 neighbors, the rest 6.
        valences = np.array([m.vertex_neighbors(v).size for v in range(pts.shape[0])])
        assert (valences == 5).sum() == 12
        assert ((valences == 5) | (valences == 6)).all()

    def test_open_plane_boundary(self):
        pts, tris = plane_surface((1, 1), (2, 2))
        m = build_halfedge(pts, tris)
        assert not m.is_closed()
        # A 2x2 quad plane has 8 boundary half-edges.
        assert m.boundary_halfedges().size == 8

    def test_twins_consistent(self):
        pts, tris = cuboid_surface((0.5, 0.5, 0.5))
        m = build_halfedge(pts, tris)
        tw = m.twin
        live = tw >= 0
        h = np.flatnonzero(live)
        assert np.array_equal(tw[tw[h]], h)  # twin is an involution
        # twin reverses direction
        for hh in h[:20]:
            assert m.origin(int(hh)) == int(m.dest[tw[hh]])
            assert int(m.dest[hh]) == m.origin(int(tw[hh]))

    def test_face_adjacency(self):
        pts, tris = icosphere_surface(1)
        m = build_halfedge(pts, tris)
        for f in range(0, tris.shape[0], 17):
            nbrs = m.face_neighbors(f)
            assert nbrs.size == 3  # closed triangle mesh: every face has 3 neighbors
            for nf in nbrs:
                shared = set(tris[f]) & set(tris[nf])
                assert len(shared) == 2

    def test_normals_outward_on_sphere(self):
        pts, tris = icosphere_surface(2)
        m = build_halfedge(pts, tris)
        vn = m.vertex_normals()
        # Outward: normal aligned with position on a centered sphere.
        align = (vn * pts / np.linalg.norm(pts, axis=1, keepdims=True)).sum(1)
        assert (align > 0.9).all()
