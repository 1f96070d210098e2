"""Corpus batch solving: bucketed padding preserves modes exactly; store streaming."""

import numpy as np

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu import SolverConfig, mesh2modes
from mesheditor_tpu.materials import CERAMIC, GLASS
from mesheditor_tpu.mesh import bar_tets
from mesheditor_tpu.solve.batch import CorpusItem, batch_solve, pad_tetmesh


class TestPadding:
    def test_padded_solve_matches_unpadded(self):
        mesh = bar_tets(0.2, 0.04, 0.04, 4, 2, 2)
        cfg = SolverConfig(num_modes=8, num_fem_modes=12)
        base = mesh2modes(mesh, CERAMIC.properties, mesh.points[:3], config=cfg)
        padded = pad_tetmesh(mesh, mesh.points.shape[0] + 37, mesh.tets.shape[0] + 101)
        alt = mesh2modes(padded, CERAMIC.properties, mesh.points[:3], config=cfg)
        assert alt.modes.num_modes == base.modes.num_modes
        assert np.allclose(alt.modes.freqs, base.modes.freqs, rtol=1e-6)
        # Shapes are f32-grade (the subspace stage runs float32); near-zero entries
        # carry ~eps32 * ||shape|| absolute noise, so the floor is 1e-5, not 1e-6.
        assert np.allclose(np.abs(alt.modes.shapes), np.abs(base.modes.shapes),
                           rtol=1e-3, atol=1e-5)

    def test_mass_props_unaffected_by_padding(self):
        mesh = bar_tets(0.2, 0.04, 0.04, 3, 2, 2)
        padded = pad_tetmesh(mesh, mesh.points.shape[0] + 10, mesh.tets.shape[0] + 20)
        from mesheditor_tpu.fem import compute_mass_properties, filter_degenerate

        kept = filter_degenerate(padded.points, padded.tets)
        mp = compute_mass_properties(padded.points, kept, 1000.0)
        assert abs(mp.mass - 1000 * 0.2 * 0.04 * 0.04) < 1e-6


class TestBatchSolve:
    def test_corpus_to_store(self, tmp_path):
        items = [
            CorpusItem("bar_ceramic", bar_tets(0.2, 0.04, 0.04, 3, 2, 2),
                       CERAMIC.properties, bar_tets(0.2, 0.04, 0.04, 3, 2, 2).points[:2]),
            CorpusItem("bar_glass", bar_tets(0.22, 0.04, 0.04, 3, 2, 2),
                       GLASS.properties, bar_tets(0.22, 0.04, 0.04, 3, 2, 2).points[:2]),
        ]
        cfg = SolverConfig(num_modes=6, num_fem_modes=10)
        results = batch_solve(items, tmp_path, cfg, point_bucket=128, tet_bucket=256)
        assert len(results) == 2
        for r in results:
            assert r.num_modes > 0
            assert r.path is not None and r.path.exists()
        # Different objects -> different content hashes.
        assert results[0].path != results[1].path
