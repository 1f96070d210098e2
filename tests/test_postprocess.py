"""Mode postprocessing and the exact material-rescale fast path."""

import numpy as np

from mesheditor_tpu.solve.postprocess import ModalEigenSummary, postprocess_modes, rescale_modes
from mesheditor_tpu.types import AcousticMaterialProperties, SolverConfig


def _mat(alpha=0.0, beta=0.0, rho=1000.0, e=1e9, nu=0.3):
    return AcousticMaterialProperties(rho, e, nu, alpha, beta)


def _shapes(n_points, n_modes):
    rng = np.random.default_rng(0)
    return rng.standard_normal((n_points, n_modes, 3)).astype(np.float32)


class TestPostprocess:
    def test_undamped_frequencies(self):
        freqs_hz = np.array([100.0, 440.0, 2000.0])
        evals = (2 * np.pi * freqs_hz) ** 2
        modes = postprocess_modes(evals, _shapes(2, 3), 1.0, _mat(), SolverConfig(), np.zeros((2, 3)))
        assert np.allclose(modes.freqs, freqs_hz, rtol=1e-6)
        assert modes.shapes.shape == (2, 3, 3)

    def test_rigid_modes_filtered(self):
        # Near-zero eigenvalues (rigid body) and sub-audible modes drop; the first valid
        # mode is the first at or above min_mode_freq.
        evals = np.concatenate([np.full(6, 1e-8), [(2 * np.pi * 5.0) ** 2], [(2 * np.pi * 100.0) ** 2]])
        modes = postprocess_modes(evals, _shapes(1, 8), 1.0, _mat(), SolverConfig(), np.zeros((1, 3)))
        assert modes.num_modes == 1
        assert abs(modes.freqs[0] - 100.0) < 1e-3

    def test_rayleigh_damping_t60(self):
        # c = alpha + beta*omega^2; T60 = 2 ln(1000)/c; damped f = sqrt(w^2 - c^2/4)/2pi.
        f0 = 1000.0
        omega = 2 * np.pi * f0
        alpha, beta = 10.0, 1e-6
        evals = np.array([omega**2])
        modes = postprocess_modes(evals, _shapes(1, 1), 1.0, _mat(alpha, beta), SolverConfig(), np.zeros((1, 3)))
        c = alpha + beta * omega**2
        assert abs(modes.t60s[0] - 2 * np.log(1000) / c) < 1e-6
        assert abs(modes.freqs[0] - np.sqrt(omega**2 - c**2 / 4) / (2 * np.pi)) < 1e-3

    def test_band_filter(self):
        freqs_hz = np.array([100.0, 8000.0, 20000.0])
        evals = (2 * np.pi * freqs_hz) ** 2
        modes = postprocess_modes(evals, _shapes(1, 3), 1.0, _mat(), SolverConfig(), np.zeros((1, 3)))
        assert modes.num_modes == 2  # 20 kHz above the default 16 kHz ceiling

    def test_fundamental_scaling_keeps_higher_modes(self):
        # Scaling the fundamental up may push the top mode past max_mode_freq; those modes
        # are kept (the ceiling scales too) so the fundamental can change losslessly.
        freqs_hz = np.array([100.0, 12000.0])
        evals = (2 * np.pi * freqs_hz) ** 2
        cfg = SolverConfig(fundamental_freq=200.0)
        modes = postprocess_modes(evals, _shapes(1, 2), 1.0, _mat(), cfg, np.zeros((1, 3)))
        assert modes.num_modes == 2
        assert abs(modes.freqs[0] - 200.0) < 1e-3
        assert abs(modes.freqs[1] - 24000.0) < 1.0
        assert abs(modes.original_fundamental_freq - 100.0) < 1e-3

    def test_num_modes_cap(self):
        freqs_hz = np.linspace(100, 1000, 50)
        evals = (2 * np.pi * freqs_hz) ** 2
        modes = postprocess_modes(evals, _shapes(1, 50), 1.0, _mat(), SolverConfig(num_modes=30), np.zeros((1, 3)))
        assert modes.num_modes == 30


class TestRescaleModes:
    def _summary(self, mat, freqs_hz):
        evals = (2 * np.pi * np.asarray(freqs_hz)) ** 2
        return ModalEigenSummary(
            eigenvalues=evals, shapes=_shapes(1, len(freqs_hz)), solved_material=mat
        ), evals

    def test_young_modulus_scales_frequencies(self):
        mat = _mat(e=1e9)
        summary, evals = self._summary(mat, [100.0, 250.0])
        current = postprocess_modes(evals, summary.shapes, 1.0, mat, SolverConfig(), np.zeros((1, 3)))
        harder = _mat(e=4e9)
        rescaled = rescale_modes(summary, current, harder)
        # lambda ~ E: frequencies scale by sqrt(4) = 2.
        assert np.allclose(rescaled.freqs, 2 * current.freqs, rtol=1e-6)
        # Shapes unchanged (density unchanged).
        assert np.allclose(rescaled.shapes, current.shapes)

    def test_density_scales_freqs_and_shapes(self):
        mat = _mat(rho=1000.0)
        summary, evals = self._summary(mat, [100.0])
        current = postprocess_modes(evals, summary.shapes, 1.0, mat, SolverConfig(), np.zeros((1, 3)))
        denser = _mat(rho=4000.0)
        rescaled = rescale_modes(summary, current, denser)
        # lambda ~ 1/rho: freq halves; mass-normalized shapes scale by 1/sqrt(rho ratio) = 1/2.
        assert np.allclose(rescaled.freqs, 0.5 * current.freqs, rtol=1e-6)
        assert np.allclose(rescaled.shapes, 0.5 * current.shapes, rtol=1e-6)

    def test_poisson_change_rejected(self):
        mat = _mat(nu=0.3)
        summary, evals = self._summary(mat, [100.0])
        current = postprocess_modes(evals, summary.shapes, 1.0, mat, SolverConfig(), np.zeros((1, 3)))
        assert rescale_modes(summary, current, _mat(nu=0.35)) is None
