"""IO: wav roundtrip, content-addressed modal model store, obj roundtrip."""

import numpy as np

from mesheditor_tpu.io import (
    load_modal_model,
    modal_model_key,
    read_wav,
    save_modal_model,
    write_wav,
)
from mesheditor_tpu.mesh import icosphere_surface, load_obj, save_obj
from mesheditor_tpu.types import MassProperties, ModalModes


def _model():
    rng = np.random.default_rng(0)
    modes = ModalModes(
        freqs=np.array([100.0, 200.0], np.float32),
        t60s=np.array([1.0, 0.5], np.float32),
        shapes=rng.standard_normal((3, 2, 3)).astype(np.float32),
        positions=rng.standard_normal((3, 3)).astype(np.float32),
    )
    mass = MassProperties(mass=2.5, center_of_mass=np.array([0.1, 0.2, 0.3]))
    return modes, mass


class TestWav:
    def test_roundtrip(self, tmp_path):
        sr = 48_000
        t = np.arange(4800) / sr
        sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        write_wav(tmp_path / "a.wav", sig, sr)
        back, rate = read_wav(tmp_path / "a.wav")
        assert rate == sr
        assert back.shape == (1, 4800)
        assert np.abs(back[0] - sig).max() < 1e-4  # 16-bit quantization


class TestModelStore:
    def test_content_addressed_write_once(self, tmp_path):
        modes, mass = _model()
        p1 = save_modal_model(tmp_path, modes, mass)
        stamp = p1.stat().st_mtime_ns
        p2 = save_modal_model(tmp_path, modes, mass)
        assert p1 == p2
        assert p2.stat().st_mtime_ns == stamp  # never rewritten
        assert p1.stem == modal_model_key(modes, mass)

    def test_roundtrip(self, tmp_path):
        modes, mass = _model()
        path = save_modal_model(tmp_path, modes, mass)
        m2, mp2 = load_modal_model(path)
        assert np.array_equal(m2.freqs, modes.freqs)
        assert np.array_equal(m2.shapes, modes.shapes)
        assert mp2.mass == mass.mass

    def test_different_content_different_path(self, tmp_path):
        modes, mass = _model()
        p1 = save_modal_model(tmp_path, modes, mass)
        modes.freqs = modes.freqs * 1.01
        p2 = save_modal_model(tmp_path, modes, mass)
        assert p1 != p2


class TestObj:
    def test_roundtrip(self, tmp_path):
        pts, tris = icosphere_surface(1)
        save_obj(tmp_path / "s.obj", pts, tris)
        p2, t2 = load_obj(tmp_path / "s.obj")
        assert np.allclose(p2, pts)
        assert np.array_equal(t2, tris)
