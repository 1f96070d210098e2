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


class TestQualityRefinement:
    """The optional -q mode (reference: circumradius/edge <= 2 refinement,
    Tetrahedralize.h:18-21): quality must improve on curved skins, the surface must
    stay exactly preserved, and the result must remain deterministic."""

    def _ratios(self, tm):
        p, t = tm.points, tm.tets.astype(np.int64)
        v = p[t]
        ab, ac, ad = v[:, 1] - v[:, 0], v[:, 2] - v[:, 0], v[:, 3] - v[:, 0]
        det = 2 * np.einsum("ij,ij->i", ab, np.cross(ac, ad))
        ok = np.abs(det) > 1e-30
        rb = (ab ** 2).sum(1)
        rc = (ac ** 2).sum(1)
        rd = (ad ** 2).sum(1)
        num = (np.cross(ac, ad) * rb[:, None] + np.cross(ad, ab) * rc[:, None]
               + np.cross(ab, ac) * rd[:, None])
        cc = v[ok, 0] + num[ok] / det[ok, None]
        radius = np.linalg.norm(cc - v[ok, 0], axis=1)
        vo = v[ok]
        lmin = np.full(int(ok.sum()), np.inf)
        for i in range(4):
            for j in range(i + 1, 4):
                lmin = np.minimum(lmin, np.linalg.norm(vo[:, i] - vo[:, j], axis=1))
        good = lmin > 0
        return radius[good] / lmin[good]

    def test_quality_improves_on_curved_surface(self):
        from mesheditor_tpu.mesh import icosphere_surface
        from mesheditor_tpu.mesh.cdt import generate_tets_delaunay

        pos, tris = icosphere_surface(2)
        base = self._ratios(generate_tets_delaunay(pos, tris))
        refined = self._ratios(generate_tets_delaunay(pos, tris, quality_bound=2.0))
        assert (refined > 2.0).mean() < 0.5 * max((base > 2.0).mean(), 1e-9)

    def test_surface_vertices_preserved_under_quality(self):
        from mesheditor_tpu.mesh import icosphere_surface
        from mesheditor_tpu.mesh.cdt import generate_tets_delaunay

        pos, tris = icosphere_surface(1)
        tm = generate_tets_delaunay(pos, tris, quality_bound=2.0)
        assert np.allclose(tm.points[: pos.shape[0]], pos)

    def test_quality_deterministic(self):
        from mesheditor_tpu.mesh import icosphere_surface
        from mesheditor_tpu.mesh.cdt import generate_tets_delaunay

        pos, tris = icosphere_surface(1)
        a = generate_tets_delaunay(pos, tris, quality_bound=2.0)
        b = generate_tets_delaunay(pos, tris, quality_bound=2.0)
        assert np.array_equal(a.tets, b.tets) and np.array_equal(a.points, b.points)

    def test_boundary_still_filled_under_quality(self):
        """Refinement must not break the conforming skin: total tet volume still
        matches the enclosed surface volume."""
        from mesheditor_tpu.mesh import icosphere_surface
        from mesheditor_tpu.mesh.cdt import generate_tets_delaunay

        pos, tris = icosphere_surface(2)
        tm = generate_tets_delaunay(pos, tris, quality_bound=2.0)
        v = tm.points[tm.tets.astype(np.int64)]
        vol6 = np.einsum("ij,ij->i", v[:, 1] - v[:, 0],
                         np.cross(v[:, 2] - v[:, 0], v[:, 3] - v[:, 0]))
        tet_vol = np.abs(vol6).sum() / 6.0
        # Surface volume by divergence theorem.
        s = pos[tris.astype(np.int64)]
        surf_vol = np.einsum("ij,ij->i", s[:, 0],
                             np.cross(s[:, 1], s[:, 2])).sum() / 6.0
        assert abs(tet_vol - abs(surf_vol)) < 2e-3 * abs(surf_vol)


class TestCorpusSnapshot:
    """Structural regression snapshot (reference: ModalSolverBench --snapshot vs
    tests/fixtures/TetCorpusSnapshot.txt) — catches 'tetrahedralizes validly but
    differently'. Regenerate with scripts/tet_corpus_snapshot.py after intentional
    mesher changes."""

    def test_counts_and_hashes_match_fixture(self):
        import pathlib
        import sys

        sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "scripts"))
        from tet_corpus_snapshot import snapshot_lines

        fixture = (pathlib.Path(__file__).parent / "fixtures"
                   / "tet_corpus_snapshot.txt").read_text().strip().splitlines()
        current = list(snapshot_lines())
        assert current == fixture


class TestSoupCleanup:
    """Adversarial triangle-soup tolerance (reference accepts closed, possibly
    non-manifold, self-intersecting soup — src/mesh/Tetrahedralize.h:44-60).
    Self-intersecting/sliver-rich survival rows live in the corpus snapshot
    (adv_* in tests/fixtures/tet_corpus_snapshot.txt)."""

    def _cuboid(self):
        return cuboid_surface((0.1, 0.1, 0.1))

    def test_clean_surface_passes_unchanged(self):
        from mesheditor_tpu.mesh.cdt import clean_surface_soup

        _, tris = self._cuboid()
        tt, rep = clean_surface_soup(tris)
        assert tt.shape[0] == tris.shape[0]
        assert rep == {"degenerate": 0, "duplicates": 0, "peeled": 0,
                       "kept": tris.shape[0], "input": tris.shape[0]}

    def test_degenerate_and_duplicate_faces_dropped(self):
        from mesheditor_tpu.mesh.cdt import clean_surface_soup

        pts, tris = self._cuboid()
        degen = np.array([[0, 1, 1], [2, 2, 3]], np.uint32)
        soup = np.vstack([tris, tris[:4], degen])
        tt, rep = clean_surface_soup(soup)
        assert rep["degenerate"] == 2 and rep["duplicates"] == 4
        assert tt.shape[0] == tris.shape[0]
        tm = generate_tets_delaunay(pts, soup)
        assert tet_volumes(tm).min() > 0

    def test_interior_fin_peeled(self):
        from mesheditor_tpu.mesh.cdt import clean_surface_soup

        pts, tris = self._cuboid()
        n = pts.shape[0]
        pf = np.vstack([pts, pts[:2] + np.array([0.0, 0.0, 0.02])])
        fin = np.array([[0, 1, n], [1, n + 1, n]], np.uint32)
        soup = np.vstack([tris, fin])
        tt, rep = clean_surface_soup(soup)
        assert rep["peeled"] == 2
        assert tt.shape[0] == tris.shape[0]
        tm = generate_tets_delaunay(pf, soup)
        assert tet_volumes(tm).min() > 0
        assert np.allclose(tm.points[:pf.shape[0]], pf)

    def test_open_surface_rejected_with_report(self):
        pts, tris = self._cuboid()
        with pytest.raises(ValueError, match="not a closed surface|not watertight"):
            generate_tets_delaunay(pts, tris[:-2])

    def test_self_intersecting_union_meshes(self):
        p1, t1 = icosphere_surface(2)
        p1 = p1 * 0.05
        pts = np.vstack([p1, p1 + np.array([0.04, 0.0, 0.0])])
        tris = np.vstack([t1, t1 + p1.shape[0]])
        tm = generate_tets_delaunay(pts, tris)
        vols = tet_volumes(tm)
        assert vols.min() > 0
        # The union domain is smaller than two disjoint balls but bigger than one.
        ball = tet_volumes(generate_tets_delaunay(p1, t1)).sum()
        assert ball < vols.sum() < 2 * ball
