"""Modal solver oracles: closed-form bar physics + scipy shift-invert parity + warm start.

The free-free rectangular prism has closed forms for its mode families (Poisson's ratio 0):
  Longitudinal: f_n = n*sqrt(E/rho)/(2L)
  Torsional (square section): f_n = n*sqrt(G*J/(rho*Ip))/(2L), G = E/2, J = 0.140577 a^4,
    Ip = a^4/6
  Bending (Euler-Bernoulli): f_i = (bL)_i^2/(2*pi) * sqrt(E/rho)*r_g/L^2,
    (bL) = {4.73004, 7.85320, 10.99561}, r_g = thickness/sqrt(12)
These are the reference's solver oracles (tests/ModalSolverTest.cpp:22-33); the default-run
sizes here are reduced for the 1-core CI substrate, and the reference-resolution cases are
marked slow.
"""

import numpy as np
import pytest

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu import SolverConfig, mesh2modes
from mesheditor_tpu.mesh import bar_tets
from mesheditor_tpu.solve.mesh2modes import SolveReuse
from mesheditor_tpu.types import AcousticMaterialProperties

BENDING_BL = (4.73004074, 7.85320462, 10.9956078)


def classify(modes, bar_dims, nx):
    """Bucket modes by kinetic-energy family: axial, per-slice fitted rigid rotation
    (torsion), or lateral translation (bending)."""
    length, width, thickness = bar_dims
    pos = np.asarray(modes.positions, dtype=np.float64)
    shapes = np.asarray(modes.shapes, dtype=np.float64)  # (points, modes, 3)
    ry = pos[:, 1] - width / 2
    rz = pos[:, 2] - thickness / 2
    slice_id = np.rint(pos[:, 0] * nx / length).astype(int)
    families = {}
    for k in range(modes.num_modes):
        u = shapes[:, k, :]
        total = (u**2).sum()
        if total <= 0:
            families.setdefault("other", []).append(modes.freqs[k])
            continue
        axial = (u[:, 0] ** 2).sum()
        lateral_y = (u[:, 1] ** 2).sum()
        lateral_z = (u[:, 2] ** 2).sum()
        rotation = 0.0
        for s in np.unique(slice_id):
            m = slice_id == s
            circ = (ry[m] * u[m, 2] - rz[m] * u[m, 1]).sum()
            r2 = (ry[m] ** 2 + rz[m] ** 2).sum()
            if r2 > 0:
                rotation += circ**2 / r2
        if axial / total > 0.85:
            fam = "longitudinal"
        elif rotation / total > 0.85:
            fam = "torsional"
        elif (lateral := lateral_y + lateral_z) / total > 0.6 and rotation / total < 0.5:
            if lateral_y / lateral > 0.8:
                fam = "bending_y"
            elif lateral_z / lateral > 0.8:
                fam = "bending_z"
            else:
                fam = "bending"
        else:
            fam = "other"
        families.setdefault(fam, []).append(float(modes.freqs[k]))
    return families


def solve_bar(dims, res, material, num_fem_modes=30, num_modes=25):
    mesh = bar_tets(*dims, *res)
    cfg = SolverConfig(num_modes=num_modes, num_fem_modes=num_fem_modes, max_mode_freq=48000.0)
    result = mesh2modes(mesh, material, mesh.points, config=cfg)
    assert result.modes.num_modes > 0, "solve produced no modes"
    return result


def check_family(fem, theory, tol, min_count=1):
    count = min(len(fem), len(theory))
    assert count >= min_count, f"only {count} modes found"
    for i in range(count):
        ratio = fem[i] / theory[i]
        assert abs(ratio - 1.0) < tol, f"mode {i}: fem {fem[i]:.1f} vs theory {theory[i]:.1f}"


class TestBarOracles:
    MATERIAL = AcousticMaterialProperties(1000, 1e7, 0.0)

    def test_square_bar_families_small(self):
        # Reduced-resolution square bar: longitudinal validates E/rho/assembly/eigensolve
        # end to end; torsion validates shear. Coarse mesh -> looser tolerances than the
        # reference's 20x4x4 run (the slow test below matches those).
        dims = (0.3, 0.05, 0.05)
        res = (10, 2, 2)
        result = solve_bar(dims, res, self.MATERIAL)
        fam = classify(result.modes, dims, res[0])
        speed = np.sqrt(self.MATERIAL.young_modulus / self.MATERIAL.density)
        f1_long = speed / (2 * dims[0])
        check_family(sorted(fam.get("longitudinal", [])), [f1_long, 2 * f1_long], 0.02)
        torsion_over_polar = 0.140577 * 6
        f1_tor = np.sqrt(self.MATERIAL.lame_mu() / self.MATERIAL.density * torsion_over_polar) / (2 * dims[0])
        check_family(sorted(fam.get("torsional", [])), [f1_tor], 0.08)
        bending = sorted(fam.get("bending", []) + fam.get("bending_y", []) + fam.get("bending_z", []))
        r_g = dims[2] / np.sqrt(12)
        base = speed * r_g / (2 * np.pi * dims[0] ** 2)
        theory = [BENDING_BL[0] ** 2 * base] * 2  # degenerate pair
        check_family(bending, theory, 0.12, min_count=2)

    @pytest.mark.slow
    def test_square_bar_reference_resolution(self):
        # The reference's exact case: 20x4x4, longitudinal 1%, torsional 5%, bending 10%
        # (tests/ModalSolverTest.cpp:227-243).
        dims = (0.3, 0.05, 0.05)
        res = (20, 4, 4)
        result = solve_bar(dims, res, self.MATERIAL, num_fem_modes=45, num_modes=30)
        fam = classify(result.modes, dims, res[0])
        speed = np.sqrt(self.MATERIAL.young_modulus / self.MATERIAL.density)
        f1 = speed / (2 * dims[0])
        check_family(sorted(fam.get("longitudinal", [])), [f1, 2 * f1, 3 * f1], 0.01, 2)
        torsion_over_polar = 0.140577 * 6
        f1_tor = np.sqrt(self.MATERIAL.lame_mu() / self.MATERIAL.density * torsion_over_polar) / (2 * dims[0])
        check_family(sorted(fam.get("torsional", [])), [f1_tor, 2 * f1_tor], 0.05, 2)
        bending = sorted(fam.get("bending", []) + fam.get("bending_y", []) + fam.get("bending_z", []))[:2]
        r_g = dims[2] / np.sqrt(12)
        base = speed * r_g / (2 * np.pi * dims[0] ** 2)
        check_family(bending, [BENDING_BL[0] ** 2 * base] * 2, 0.10, 2)

    @pytest.mark.slow
    def test_thin_bar_bending(self):
        # Thin section, one element through the thickness: quadratic elements capture the
        # bending strain (reference: tests/ModalSolverTest.cpp:248-259).
        mat = AcousticMaterialProperties(1000, 1e9, 0.0)
        dims = (0.3, 0.05, 0.01)
        res = (30, 5, 1)
        result = solve_bar(dims, res, mat, num_fem_modes=45, num_modes=30)
        fam = classify(result.modes, dims, res[0])
        speed = np.sqrt(mat.young_modulus / mat.density)
        check_family(sorted(fam.get("longitudinal", [])), [speed / 0.6], 0.01)
        r_g = dims[2] / np.sqrt(12)
        base = speed * r_g / (2 * np.pi * dims[0] ** 2)
        check_family(sorted(fam.get("bending_z", [])), [BENDING_BL[0] ** 2 * base], 0.05)


class TestScipyParity:
    def test_frequencies_match_shift_invert(self):
        """The BASELINE parity gate: frequencies within 0.1% of a sparse shift-invert
        solve (scipy eigsh stands in for the reference's Spectra path — same algorithm
        family on the same matrices)."""
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla
        from mesheditor_tpu.fem import (
            assemble_element_matrices, build_quad_mesh, filter_degenerate,
        )

        mat = AcousticMaterialProperties(2700, 7.2e10, 0.19, 6, 1e-7)  # ceramic
        mesh = bar_tets(0.2, 0.04, 0.03, 6, 2, 2)
        cfg = SolverConfig(num_modes=20, num_fem_modes=20)
        result = mesh2modes(mesh, mat, mesh.points[:5], config=cfg)

        kept = filter_degenerate(mesh.points, mesh.tets)
        quad = build_quad_mesh(kept, mesh.points.shape[0])
        ops = assemble_element_matrices(mesh.points, kept, mat, quad)
        n = ops.n_dofs
        dofs = np.asarray(ops.elem_dofs)
        rows = np.repeat(dofs, 30, axis=1).reshape(-1)
        cols = np.tile(dofs, (1, 30)).reshape(-1)
        k_sp = sp.coo_matrix((np.asarray(ops.k_blocks).reshape(-1), (rows, cols)), shape=(n, n)).tocsc()
        m_sp = sp.coo_matrix(
            ((np.asarray(ops.rho_vol)[:, None, None] * np.asarray(ops.m_unit)[None]).reshape(-1),
             (rows, cols)), shape=(n, n)).tocsc()
        sigma = -((2 * np.pi * cfg.min_mode_freq) ** 2)
        evals = np.sort(spla.eigsh(k_sp, k=20, M=m_sp, sigma=sigma, which="LM",
                                   return_eigenvectors=False))
        ref_freqs = np.sqrt(np.maximum(evals, 0)) / (2 * np.pi)
        ref_audible = ref_freqs[(ref_freqs >= cfg.min_mode_freq) & (ref_freqs <= cfg.max_mode_freq)]
        got = result.modes.freqs[: len(ref_audible)]
        # Damping shifts the solved freqs slightly; compare undamped-to-undamped via the
        # raw eigenvalues held in the summary.
        got_undamped = np.sqrt(result.summary.eigenvalues) / (2 * np.pi)
        got_audible = got_undamped[got_undamped >= cfg.min_mode_freq][: len(ref_audible)]
        rel = np.abs(got_audible - ref_audible) / ref_audible
        assert rel.max() < 1e-3, f"parity gate failed: max rel {rel.max():.2e}"
        assert got.size > 0

    def test_warm_start_reconverges_fast(self):
        mat = AcousticMaterialProperties(1000, 1e7, 0.0)
        mesh = bar_tets(0.2, 0.04, 0.04, 5, 2, 2)
        cfg = SolverConfig(num_modes=15, num_fem_modes=15)
        cold = mesh2modes(mesh, mat, mesh.points[:4], config=cfg,
                          reuse=SolveReuse(keep_basis=True))
        assert cold.basis is not None
        # Same mesh, slightly different material (Poisson changed -> no exact rescale).
        mat2 = AcousticMaterialProperties(1000, 1.1e7, 0.02)
        warm = mesh2modes(mesh, mat2, mesh.points[:4], config=cfg,
                          reuse=SolveReuse(seed_basis=cold.basis))
        assert warm.modes.num_modes > 0
        assert warm.profile.restarts < max(cold.profile.restarts, 4)
        # Frequencies shifted by roughly sqrt(E ratio).
        ratio = warm.modes.freqs[0] / cold.modes.freqs[0]
        assert 0.95 < ratio / np.sqrt(1.1) < 1.05
