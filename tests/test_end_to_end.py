"""End-to-end slices: primitive surface -> tets -> modal model -> strike -> waveform
(BASELINE configs 1-2), plus the voxel mesher's structural validity."""

import numpy as np
import pytest

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu import SolverConfig, mesh2modes
from mesheditor_tpu.api import make_synth, solve_surface, strike
from mesheditor_tpu.io import write_wav
from mesheditor_tpu.materials import CERAMIC, WOOD
from mesheditor_tpu.mesh import cuboid_surface, icosphere_surface
from mesheditor_tpu.mesh.voxel_tets import generate_tets
from mesheditor_tpu.types import ModalSolveSettings


class TestVoxelTets:
    def test_cube_fills_volume(self):
        pts, tris = cuboid_surface((0.05, 0.05, 0.05))
        tets = generate_tets(pts, tris, resolution=10, snap=False)
        v = tets.points[tets.tets.astype(int)]
        r = v[:, 1:] - v[:, :1]
        vols = np.abs(np.einsum("ei,ei->e", r[:, 0], np.cross(r[:, 1], r[:, 2]))) / 6
        assert (vols > 0).all()
        total = vols.sum()
        assert abs(total - 0.1**3) < 0.35 * 0.1**3  # staircase underfill, bounded

    def test_sphere_fills_volume(self):
        pts, tris = icosphere_surface(2)
        tets = generate_tets(pts, tris, resolution=16, snap=True)
        v = tets.points[tets.tets.astype(int)]
        r = v[:, 1:] - v[:, :1]
        vols = np.abs(np.einsum("ei,ei->e", r[:, 0], np.cross(r[:, 1], r[:, 2]))) / 6
        sphere = 4 / 3 * np.pi
        assert 0.5 * sphere < vols.sum() < 1.1 * sphere

    def test_all_vertices_used(self):
        pts, tris = cuboid_surface((0.5, 0.5, 0.5))
        tets = generate_tets(pts, tris, resolution=6, snap=False)
        assert np.unique(tets.tets).size == tets.points.shape[0]

    def test_thin_shell_raises(self):
        # A plane has no interior; the mesher must refuse rather than return garbage.
        pts, tris = cuboid_surface((0.5, 0.5, 0.001))
        with pytest.raises(ValueError):
            generate_tets(pts, tris, resolution=8)


class TestEndToEnd:
    def test_cube_strike_renders_audio(self, tmp_path):
        """BASELINE config 1: cube primitive -> modal model -> strike render @48 kHz."""
        pts, tris = cuboid_surface((0.04, 0.04, 0.04))
        settings = ModalSolveSettings(num_modes=24, num_vertices=6, max_mode_freq=48000.0)
        result = solve_surface(pts, tris, CERAMIC.properties, settings=settings,
                               tet_resolution=7)
        assert result.modes.num_modes >= 8
        assert result.modes.freqs[0] > 20.0
        assert result.mass_props.mass > 0
        # Ceramic 8cm cube: fundamental should be in the kHz range.
        assert 2000 < result.modes.freqs[0] < 48000

        synth = make_synth([result])
        tau = strike(synth, 0, 0, result, direction=(0.5, 1.0, 0.2), impulse_mag=0.05,
                     material=CERAMIC.properties)
        assert 2e-5 <= tau <= 5e-2
        audio = synth.render_seconds(0.25)
        assert np.isfinite(audio).all()
        assert np.abs(audio).max() > 0
        # Decays: last 10th quieter than global peak.
        n = audio.size
        assert np.abs(audio[-n // 10 :]).max() < np.abs(audio).max()
        write_wav(tmp_path / "cube.wav", audio / max(np.abs(audio).max(), 1e-9))
        assert (tmp_path / "cube.wav").stat().st_size > 1000

    def test_material_sweep_shifts_spectrum(self):
        """BASELINE config 2 (reduced): the same geometry in wood vs ceramic — frequency
        scales like sqrt(E/rho) between isotropic materials at nu held per-material."""
        pts, tris = cuboid_surface((0.04, 0.04, 0.04))
        tets = generate_tets(pts, tris, resolution=6, snap=False)
        cfg = SolverConfig(num_modes=10, num_fem_modes=16, max_mode_freq=48000.0)
        ceramic = mesh2modes(tets, CERAMIC.properties, pts[:4], config=cfg)
        wood = mesh2modes(tets, WOOD.properties, pts[:4], config=cfg)
        assert ceramic.modes.num_modes and wood.modes.num_modes
        expected = np.sqrt(
            (CERAMIC.properties.young_modulus / CERAMIC.properties.density)
            / (WOOD.properties.young_modulus / WOOD.properties.density)
        )
        got = ceramic.modes.original_fundamental_freq / wood.modes.original_fundamental_freq
        # nu differs (0.19 vs 0.25), so allow a loose band around the sqrt(E/rho) ratio.
        assert 0.7 * expected < got < 1.4 * expected
        # Wood rings longer at low modes? (alpha smaller for ceramic actually) — just
        # check damping produced finite positive T60s.
        assert (ceramic.modes.t60s > 0).all() and (wood.modes.t60s > 0).all()
