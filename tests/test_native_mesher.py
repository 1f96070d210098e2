"""Native Delaunay tet mesher: structural validity, volume fidelity, solve integration."""

import numpy as np
import pytest

from mesheditor_tpu.mesh import cuboid_surface, icosphere_surface
from mesheditor_tpu.mesh.cdt import generate_tets_delaunay, native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="native tetmesher not built")


def tet_volumes(tm):
    v = tm.points[tm.tets.astype(int)]
    r = v[:, 1:] - v[:, :1]
    return np.einsum("ei,ei->e", r[:, 0], np.cross(r[:, 1], r[:, 2])) / 6


class TestDelaunayMesher:
    def test_cube_volume_exact(self):
        pts, tris = cuboid_surface((0.05, 0.05, 0.05))
        tm = generate_tets_delaunay(pts, tris, lattice_h=0.02)
        vols = tet_volumes(tm)
        assert (vols >= 0).all()  # positively oriented
        assert abs(vols.sum() - 0.001) < 1e-9  # partitions the cube exactly

    def test_surface_vertices_preserved(self):
        pts, tris = icosphere_surface(1)
        tm = generate_tets_delaunay(pts, tris)
        assert np.allclose(tm.points[: pts.shape[0]], pts)

    def test_sphere_volume(self):
        pts, tris = icosphere_surface(2)
        tm = generate_tets_delaunay(pts, tris)
        v = tet_volumes(tm).sum()
        # Faceted icosphere volume is slightly under the smooth ball.
        assert 0.95 * 4.0 < v < 4.2

    def test_deterministic(self):
        pts, tris = icosphere_surface(1)
        a = generate_tets_delaunay(pts, tris)
        b = generate_tets_delaunay(pts, tris)
        assert np.array_equal(a.tets, b.tets)
        assert np.array_equal(a.points, b.points)

    def test_through_solve(self):
        from mesheditor_tpu import SolverConfig, mesh2modes
        from mesheditor_tpu.materials import CERAMIC

        pts, tris = cuboid_surface((0.04, 0.04, 0.04))
        tm = generate_tets_delaunay(pts, tris, lattice_h=0.02)
        cfg = SolverConfig(num_modes=8, num_fem_modes=14, max_mode_freq=48000.0)
        res = mesh2modes(tm, CERAMIC.properties, pts[:4], config=cfg)
        assert res.modes.num_modes >= 4
        assert 1000 < res.modes.freqs[0] < 48000


class TestBoundaryRecovery:
    def test_tetmesh_fills_polyhedron_exactly(self):
        # Conforming-Delaunay boundary recovery: the tet mesh must fill the input
        # polyhedron exactly (boundary faces = the input surface, possibly subdivided)
        # — no carved-away skin. Torus: curved + genus 1; grid box: degeneracy-heavy.
        from mesheditor_tpu.mesh import grid_box_surface, torus_surface
        from mesheditor_tpu.mesh.bvh import enclosed_volume
        from mesheditor_tpu.mesh.cdt import generate_tets_delaunay, native_available

        if not native_available():
            pytest.skip("native mesher not built")
        for pts, tris, h in [
            (*torus_surface(0.06, 0.025, 24, 12), 0.012),
            (*grid_box_surface(4), 0.25),
        ]:
            poly = enclosed_volume(pts, tris.astype(np.int64))
            tm = generate_tets_delaunay(pts, tris, lattice_h=h)
            v0, v1, v2, v3 = (tm.points[tm.tets[:, i]] for i in range(4))
            vol = np.abs(np.einsum("ij,ij->i", v1 - v0,
                                   np.cross(v2 - v0, v3 - v0))).sum() / 6
            assert abs(vol / poly - 1.0) < 1e-9, (vol, poly)
