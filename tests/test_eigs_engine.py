"""Direct unit tests for the production eigensolver engine (solve/eigs.py) — the
numerics primitives (gram64c, _rr_fold, _chol_qr_m) against dense f64 oracles, and the
driver's exit semantics (settled / certified / handoff / cancel / nan) against stubbed
device stages (VERDICT r3 #5).

Reference contracts: settling criterion src/audio/mesh2modes.cpp:403-410; JobMonitor
cancellation src/audio/mesh2modes.h:75-77; postprocess zero-clamp mesh2modes.cpp:515-588.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from mesheditor_tpu.solve import eigs
from mesheditor_tpu.solve.eigs import _chol_qr_m, _rr_fold, gram64c, ortho_lobpcg
from mesheditor_tpu.solve.lobpcg import _deflate_rigid_panel


class TestGram64c:
    def test_matches_f64_einsum(self):
        rng = np.random.default_rng(7)
        # Deliberately NOT a multiple of GRAM_CHUNK: exercises the pad path.
        n, i, j = 3001, 17, 13
        u = rng.standard_normal((n, i)).astype(np.float32)
        v = rng.standard_normal((n, j)).astype(np.float32)
        got = np.asarray(gram64c(jnp.asarray(u), jnp.asarray(v)))
        want = u.astype(np.float64).T @ v.astype(np.float64)
        # Per-entry noise bound ~ sqrt(chunk)*eps32 relative to the term scale.
        scale = (np.abs(u.astype(np.float64)).T @ np.abs(v.astype(np.float64))).max()
        assert np.abs(got - want).max() < 1e-5 * scale

    def test_exact_on_chunk_multiple(self):
        rng = np.random.default_rng(8)
        n = 2 * eigs.GRAM_CHUNK
        u = rng.standard_normal((n, 5)).astype(np.float32)
        got = np.asarray(gram64c(jnp.asarray(u), jnp.asarray(u)))
        want = u.astype(np.float64).T @ u.astype(np.float64)
        assert np.allclose(got, want, rtol=1e-5)
        # Symmetric input -> near-symmetric output.
        assert np.abs(got - got.T).max() < 1e-6 * np.abs(got).max()


def _random_spd_pencil(rng, n, spread=1e6, b_perturb=1e-6):
    """A pencil (a, b) shaped like the engine's Grams: b ~ I (M-orthonormal basis),
    a symmetric PSD with eigenvalues spanning `spread`."""
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    theta = np.geomspace(1.0, spread, n)
    a = (q * theta[None, :]) @ q.T
    e = rng.standard_normal((n, n)) * b_perturb
    b = np.eye(n) + 0.5 * (e + e.T)
    return 0.5 * (a + a.T), b


class TestRrFold:
    def test_matches_scipy_on_random_pencil(self):
        rng = np.random.default_rng(11)
        n, p_want = 48, 16
        a, b = _random_spd_pencil(rng, n)
        s_hint = jnp.asarray(np.geomspace(1.0, 1e6, n)[p_want - 1])
        theta, c = _rr_fold(jnp.asarray(a), jnp.asarray(b), p_want, s_hint)
        theta = np.asarray(theta)
        c = np.asarray(c)
        want = scipy.linalg.eigh(a, b, eigvals_only=True)[:p_want]
        rel = np.abs(theta - want) / np.abs(want)
        assert rel.max() < 1e-6, f"fold Ritz values off by {rel.max():.2e}"
        # Returned weights are b-orthonormal and ascending.
        g = c.T @ b @ c
        assert np.abs(g - np.eye(p_want)).max() < 1e-6
        assert (np.diff(theta) >= -1e-9 * np.abs(theta[-1])).all()

    def test_dead_columns_parked(self):
        rng = np.random.default_rng(12)
        n, p_want = 32, 8
        a, b = _random_spd_pencil(rng, n, spread=1e4)
        # Kill 6 columns the way _chol_qr_m does: zero rows/cols (b_jj = 0).
        dead = [3, 7, 15, 20, 21, 30]
        a[dead, :] = 0.0
        a[:, dead] = 0.0
        b[dead, :] = 0.0
        b[:, dead] = 0.0
        live = np.setdiff1d(np.arange(n), dead)
        s_hint = jnp.asarray(100.0)
        theta, c = _rr_fold(jnp.asarray(a), jnp.asarray(b), p_want, s_hint)
        theta = np.asarray(theta)
        want = scipy.linalg.eigh(a[np.ix_(live, live)], b[np.ix_(live, live)],
                                 eigvals_only=True)[:p_want]
        rel = np.abs(theta - want) / np.abs(want)
        assert rel.max() < 1e-6, "dead columns leaked into the wanted window"
        # Dead slots carry no weight in the selection.
        assert np.abs(np.asarray(c)[dead, :]).max() < 1e-8

    def test_negative_rigid_noise_floor(self):
        """A near-rigid column reading slightly NEGATIVE (f32-apply noise on a
        true-zero eigenvalue — decoupled from the elastic block) must not break the
        Cholesky fold (the `neg` shift guard) and must come back as the lowest
        Ritz value."""
        rng = np.random.default_rng(13)
        n, p_want = 24, 6
        a, b = _random_spd_pencil(rng, n, spread=1e5)
        # Decouple column 0 and park it at a tiny negative Rayleigh quotient, the
        # shape of rigid-mode noise the guard exists for.
        a[0, :] = 0.0
        a[:, 0] = 0.0
        b[0, :] = 0.0
        b[:, 0] = 0.0
        b[0, 0] = 1.0
        a[0, 0] = -1e-4 * np.abs(np.diagonal(a)).max()
        theta, _c = _rr_fold(jnp.asarray(0.5 * (a + a.T)), jnp.asarray(b), p_want,
                             jnp.asarray(1.0))
        theta = np.asarray(theta)
        assert np.isfinite(theta).all()
        assert theta[0] == theta.min()
        # The decoupled near-rigid value is returned faithfully (the guard only
        # keeps the fold's Cholesky PD; the zero-clamp lives in ModalEigenSummary).
        assert abs(theta[0] - a[0, 0]) < 1e-9 * abs(a[0, 0])


class TestCholQrM:
    def test_m_orthonormalizes_and_transforms_products(self):
        rng = np.random.default_rng(21)
        n, k = 4000, 12
        m_diag = rng.uniform(0.5, 2.0, n)
        k_diag = rng.uniform(1.0, 3.0, n)
        w = rng.standard_normal((n, k)).astype(np.float32)
        mw = (m_diag[:, None] * w).astype(np.float32)
        kw = (k_diag[:, None] * w).astype(np.float32)
        w2, mw2, kw2 = (np.asarray(x) for x in _chol_qr_m(
            jnp.asarray(w), jnp.asarray(mw), jnp.asarray(kw)))
        # M-orthonormal to the documented O(1e-5) ridge slack.
        g = w2.astype(np.float64).T @ (m_diag[:, None] * w2.astype(np.float64))
        assert np.abs(g - np.eye(k)).max() < 1e-3
        # Carried products transformed consistently (column ops are exact).
        assert np.abs(mw2 - m_diag[:, None] * w2).max() < 1e-4 * np.abs(mw2).max()
        assert np.abs(kw2 - k_diag[:, None] * w2).max() < 1e-4 * np.abs(kw2).max()

    def test_collapsed_column_zeroed(self):
        rng = np.random.default_rng(22)
        n, k = 2000, 6
        w = rng.standard_normal((n, k)).astype(np.float32)
        w[:, 3] = w[:, 1]  # exactly dependent
        mw = w.copy()
        kw = 2.0 * w
        w2, mw2, kw2 = (np.asarray(x) for x in _chol_qr_m(
            jnp.asarray(w), jnp.asarray(mw), jnp.asarray(kw)))
        norms = np.linalg.norm(w2, axis=0)
        dead = norms < 1e-3 * norms.max()
        assert dead.sum() == 1, "exactly one of the duplicated columns must be zeroed"
        assert np.abs(mw2[:, dead]).max() == 0.0
        assert np.abs(kw2[:, dead]).max() == 0.0
        live = ~dead
        g = w2[:, live].astype(np.float64).T @ mw2[:, live].astype(np.float64)
        assert np.abs(g - np.eye(int(live.sum()))).max() < 1e-3


class _FakeStages:
    """Stub _init_stage/_iter_stage/_extract so ortho_lobpcg's host driver logic is
    testable without a pencil: `script` yields per-iteration (theta, rel) rows."""

    def __init__(self, monkeypatch, n, p, script):
        self.script = list(script)
        self.i = 0
        s = jnp.zeros((n, 3 * p), jnp.float32)
        self.s = s
        self.c = jnp.zeros((3 * p, p))
        self.a = jnp.zeros((3 * p, 3 * p))
        theta0, _ = self.script[0]
        monkeypatch.setattr(eigs, "_init_stage", lambda ops, x: (
            s, s, s, self.a, self.a, jnp.asarray(theta0), self.c))
        monkeypatch.setattr(eigs, "_iter_stage", self._iter)
        monkeypatch.setattr(eigs, "_extract", lambda s, c: jnp.zeros((n, p), jnp.float32))

    def _iter(self, ops, shifted, precond, s, ks, ms, a, b, c, rigid, m_rigid,
              inner_iters, abs_sigma, refresh=False, lock=0):
        theta, rel = self.script[min(self.i, len(self.script) - 1)]
        self.i += 1
        p = self.c.shape[1]
        return (s, ks, ms, a, b, self.c, jnp.asarray(theta), jnp.asarray(rel),
                jnp.zeros(p))


def _run_driver(monkeypatch, script, nev=4, p=6, tol=1e-6, max_iters=40, callback=None):
    n = 32
    stages = _FakeStages(monkeypatch, n, p, script)
    ops = shifted = precond = object()
    x_seed = jnp.zeros((n, p), jnp.float32)
    return ortho_lobpcg(ops, shifted, precond, x_seed, n, nev, p,
                        sigma=-1.0, tol=tol, max_iters=max_iters,
                        inner_iters=1, callback=callback), stages


class TestDriverExits:
    def test_settled_exit(self, monkeypatch):
        theta = np.arange(1.0, 7.0)
        rel = np.full(6, 0.5)  # residual certificate never fires
        script = [(theta, rel)] * 10  # identical values settle immediately
        (res, status, iters, ops), _ = _run_driver(monkeypatch, script)
        assert status == "done" and res is not None
        lam = res[0]
        assert np.allclose(lam[:4], theta[:4])

    def test_certified_exit(self, monkeypatch):
        # Values drift every iteration (never settle) but the residual certificate
        # is deep: the certified exit must fire.
        script = [(np.arange(1.0, 7.0) * (1 + 0.01 * i), np.full(6, 1e-5))
                  for i in range(20)]
        (res, status, iters, ops), _ = _run_driver(monkeypatch, script)
        assert status == "done" and res is not None
        assert iters <= 4  # certified on the first checked iteration

    def test_handoff_on_stagnation(self, monkeypatch):
        # settled prefix stuck at 2/4 forever, residuals at the f32 floor: after the
        # patience window the driver hands the panel to the f64 polish.
        theta = np.arange(1.0, 7.0)

        def drift(i):
            t = theta.copy()
            t[2:] *= 1 + 0.05 * ((-1) ** i)  # indices >= 2 never settle
            return t

        script = [(drift(i), np.full(6, 0.3)) for i in range(60)]
        (res, status, iters, ops), _ = _run_driver(monkeypatch, script, max_iters=60)
        assert status == "handoff" and res is not None

    def test_nan_exit(self, monkeypatch):
        script = [(np.full(6, np.nan), np.full(6, 0.5))] * 4
        (res, status, iters, ops), _ = _run_driver(monkeypatch, script)
        assert res is None and status == "nan"

    def test_cancel_via_callback(self, monkeypatch):
        script = [(np.arange(1.0, 7.0) * (1 + 0.1 * i), np.full(6, 0.5))
                  for i in range(20)]
        (res, status, iters, ops), _ = _run_driver(
            monkeypatch, script, callback=lambda it, settled: it >= 2)
        assert res is None and status == "cancel"

    def test_noconv_at_budget(self, monkeypatch):
        script = [(np.arange(1.0, 7.0) * (1 + 0.1 * i), np.full(6, 0.5))
                  for i in range(200)]
        (res, status, iters, ops), _ = _run_driver(monkeypatch, script, max_iters=5)
        assert res is None and status == "noconv"


class TestWarmStartDeflation:
    def test_rigid_span_removed(self):
        """ADVICE r3 (lobpcg.py:949): a warm panel whose columns span the rigid space
        must leave _deflate_rigid_panel with ~zero rigid M-components."""
        rng = np.random.default_rng(31)
        n, r_cols = 3000, 6
        m_diag = rng.uniform(0.5, 2.0, n).astype(np.float32)
        raw = rng.standard_normal((n, r_cols)).astype(np.float32)
        # M-orthonormalize the "rigid" basis against diag(m).
        g = raw.astype(np.float64).T @ (m_diag[:, None] * raw).astype(np.float64)
        rigid = (raw @ np.linalg.inv(np.linalg.cholesky(g)).T).astype(np.float32)
        m_rigid = m_diag[:, None] * rigid
        # Warm panel = rigid columns + mixtures.
        panel = np.concatenate(
            [rigid[:, :3], rng.standard_normal((n, 4)).astype(np.float32)
             + rigid @ rng.standard_normal((r_cols, 4)).astype(np.float32)], axis=1)
        out = np.asarray(_deflate_rigid_panel(
            jnp.asarray(panel), jnp.asarray(rigid), jnp.asarray(m_rigid)))
        coef = rigid.astype(np.float64).T @ (m_diag[:, None] * out).astype(np.float64)
        scale = max(np.linalg.norm(out, axis=0).max(), 1e-30)
        assert np.abs(coef).max() < 1e-5 * scale


class TestSolverConfigClamp:
    def test_clamp_bounds(self):
        from mesheditor_tpu.types import SolverConfig

        c = SolverConfig(num_modes=0, inner_iters=10_000, tolerance=1.0,
                         guard=-3).clamp()
        assert c.num_modes == 1
        assert c.inner_iters == 256
        assert c.tolerance == 1e-2
        assert c.guard == 0
        # In-bounds config is returned unchanged (same values).
        d = SolverConfig().clamp()
        assert d == SolverConfig()


class TestSoftLocking:
    def test_locked_solve_matches_unlocked(self, monkeypatch):
        """Soft locking (W/P shrink to the unsettled suffix) must not change the
        answer: eigenvalues match the unlocked solve within the settling tolerance,
        and the lock actually engages under a small bucket size."""
        import mesheditor_tpu.solve.eigs as eigs
        from mesheditor_tpu import SolverConfig, mesh2modes
        from mesheditor_tpu.materials import CERAMIC
        from mesheditor_tpu.mesh import bar_tets

        bar = bar_tets(0.2, 0.06, 0.05, 7, 3, 3)
        cfg = SolverConfig(num_modes=16, num_fem_modes=24, small_n=0,
                          tolerance=1e-8, max_mode_freq=96_000.0)
        ex = bar.points[:: max(bar.points.shape[0] // 6, 1)][:6]

        locks_seen = []
        real_iter = eigs._iter_stage

        def spy(*args, **kw):
            locks_seen.append(kw.get("lock", 0))
            return real_iter(*args, **kw)

        monkeypatch.setattr(eigs, "_LOCK_STEP", 4)
        monkeypatch.setattr(eigs, "_LOCK_MARGIN", 2)
        monkeypatch.setattr(eigs, "_iter_stage", spy)
        r_locked = mesh2modes(bar, CERAMIC.properties, ex, config=cfg)

        monkeypatch.setattr(eigs, "_LOCK_STEP", 10**9)
        locks_unlocked = []

        def spy2(*args, **kw):
            locks_unlocked.append(kw.get("lock", 0))
            return real_iter(*args, **kw)

        monkeypatch.setattr(eigs, "_iter_stage", spy2)
        r_plain = mesh2modes(bar, CERAMIC.properties, ex, config=cfg)

        assert max(locks_seen) > 0, "locking never engaged"
        assert max(locks_unlocked) == 0
        f_l = np.asarray(r_locked.summary.eigenvalues)
        f_p = np.asarray(r_plain.summary.eigenvalues)
        np.testing.assert_allclose(f_l, f_p, rtol=1e-6)
