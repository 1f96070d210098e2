"""Solve orchestration: input hashing, staleness, warm-start memo, fundamental estimation."""

import numpy as np

from mesheditor_tpu.solve.orchestration import (
    ModalWarmStart,
    SolvedFingerprint,
    estimate_fundamental,
    hash_solve_inputs,
    modal_model_stale,
)
from mesheditor_tpu.types import SolverConfig


class TestHashing:
    def test_stable_and_sensitive(self):
        pts = np.arange(12.0).reshape(4, 3)
        tris = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
        ex = pts[:2]
        h = hash_solve_inputs(pts, tris, ex, (1, 1, 1))
        assert h == hash_solve_inputs(pts, tris, ex, (1, 1, 1))
        assert h != hash_solve_inputs(pts * 1.0001, tris, ex, (1, 1, 1))
        assert h != hash_solve_inputs(pts, tris, ex, (2, 1, 1))
        assert h != hash_solve_inputs(pts, tris, ex, (1, 1, 1), quality_tets=True)


class TestStaleness:
    def test_material_scale_is_not_stale_poisson_is(self):
        cfg = SolverConfig(num_modes=30)
        fp = SolvedFingerprint("abc", 30, 20.0, 16000.0, 0.19)
        assert not modal_model_stale(fp, "abc", cfg, 0.19)
        assert modal_model_stale(fp, "abc", cfg, 0.25)  # Poisson edit -> resolve
        assert modal_model_stale(fp, "xyz", cfg, 0.19)  # mesh edit -> resolve
        assert modal_model_stale(fp, "abc", SolverConfig(num_modes=40), 0.19)


class TestWarmStart:
    def test_memo_keyed_by_hash(self):
        memo = ModalWarmStart()
        basis = np.ones((10, 4), np.float32)
        memo.offer("h1", basis)
        assert memo.lookup("h1") is basis
        assert memo.lookup("h2") is None
        memo.offer("h2", basis * 2)
        assert memo.lookup("h1") is None  # single slot, newest wins


class TestFundamental:
    def test_finds_sine(self):
        sr = 48000
        t = np.arange(sr) / sr
        sig = np.sin(2 * np.pi * 440.0 * t) + 0.3 * np.sin(2 * np.pi * 880.0 * t)
        f = estimate_fundamental(sig, sr)
        assert abs(f - 440.0) < 1.0

    def test_damped_partials(self):
        sr = 48000
        t = np.arange(sr // 2) / sr
        sig = sum(
            a * np.exp(-t * d) * np.sin(2 * np.pi * f0 * t)
            for a, d, f0 in [(1.0, 8.0, 523.3), (0.6, 15.0, 1244.0), (0.4, 25.0, 2100.0)]
        )
        f = estimate_fundamental(sig, sr)
        assert abs(f - 523.3) < 3.0

    def test_silence_returns_zero(self):
        assert estimate_fundamental(np.zeros(48000), 48000) == 0.0
