"""Retuning laws + animation clip evaluation."""

import numpy as np

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu.scene import AddObject, Registry, apply_action
from mesheditor_tpu.scene.animation import (
    AnimationChannel,
    AnimationClip,
    Interpolation,
    TargetPath,
    evaluate_clip,
)
from mesheditor_tpu.scene.components import Transform
from mesheditor_tpu.synth.tuning import mass_normalized_gain, retuned_modes
from mesheditor_tpu.types import ModalModes, ModalTuning


def _modes():
    return ModalModes(
        freqs=np.array([100.0, 250.0, 600.0]),
        t60s=np.array([1.0, 0.6, 0.3]),
        shapes=np.zeros((1, 3, 3), np.float32),
    )


class TestRetuning:
    def test_scale_shifts_pitch_inversely(self):
        f, t = retuned_modes(_modes(), uniform_scale=2.0)
        assert np.allclose(f, [50.0, 125.0, 300.0])

    def test_fundamental_override(self):
        f, t = retuned_modes(_modes(), ModalTuning(fundamental_freq=200.0))
        assert np.allclose(f, [200.0, 500.0, 1200.0])

    def test_t60_scale(self):
        f, t = retuned_modes(_modes(), ModalTuning(t60_scale=2.0))
        assert np.allclose(t, [2.0, 1.2, 0.6])

    def test_gain_law(self):
        g1 = mass_normalized_gain(0.5, 30, 1.0)
        g2 = mass_normalized_gain(0.5, 30, 4.0)
        assert abs(g2 / g1 - 4.0**-1.5) < 1e-12


class TestAnimation:
    def _scene(self):
        r = Registry()
        apply_action(r, AddObject(name="node"))
        return r, 1

    def test_linear_translation(self):
        r, e = self._scene()
        clip = AnimationClip("move", [AnimationChannel(
            e, TargetPath.TRANSLATION,
            np.array([0.0, 1.0, 2.0]),
            np.array([[0, 0, 0], [1, 0, 0], [1, 2, 0]], np.float64),
        )])
        evaluate_clip(r, clip, 0.5)
        assert np.allclose(r.get(e, Transform).translation, [0.5, 0, 0])
        evaluate_clip(r, clip, 1.5)
        assert np.allclose(r.get(e, Transform).translation, [1, 1, 0])
        evaluate_clip(r, clip, 99.0)  # clamps to the end
        assert np.allclose(r.get(e, Transform).translation, [1, 2, 0])
        assert clip.duration == 2.0

    def test_step_interpolation(self):
        r, e = self._scene()
        clip = AnimationClip("s", [AnimationChannel(
            e, TargetPath.SCALE, np.array([0.0, 1.0]),
            np.array([[1, 1, 1], [2, 2, 2]], np.float64), Interpolation.STEP,
        )])
        evaluate_clip(r, clip, 0.99)
        assert np.allclose(r.get(e, Transform).scale, 1.0)

    def test_rotation_slerp_unit_norm(self):
        r, e = self._scene()
        q0 = np.array([1.0, 0, 0, 0])
        q1 = np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])  # 90 deg about z
        clip = AnimationClip("r", [AnimationChannel(
            e, TargetPath.ROTATION, np.array([0.0, 1.0]), np.stack([q0, q1]),
        )])
        evaluate_clip(r, clip, 0.5)
        q = r.get(e, Transform).rotation
        assert abs(np.linalg.norm(q) - 1) < 1e-12
        # Halfway: 45 degrees about z.
        assert abs(q[0] - np.cos(np.pi / 8)) < 1e-9
        assert abs(q[3] - np.sin(np.pi / 8)) < 1e-9

    def test_cubicspline(self):
        r, e = self._scene()
        vals = np.zeros((2, 3, 3))
        vals[0, 1] = [0, 0, 0]
        vals[1, 1] = [1, 0, 0]
        clip = AnimationClip("c", [AnimationChannel(
            e, TargetPath.TRANSLATION, np.array([0.0, 1.0]), vals, Interpolation.CUBICSPLINE,
        )])
        evaluate_clip(r, clip, 0.5)
        # Zero tangents -> smoothstep: value 0.5 at midpoint.
        assert abs(r.get(e, Transform).translation[0] - 0.5) < 1e-9

    def test_weights_channel(self):
        r, e = self._scene()
        clip = AnimationClip("w", [AnimationChannel(
            e, TargetPath.WEIGHTS, np.array([0.0, 1.0]),
            np.array([[0.0, 1.0], [1.0, 0.0]]),
        )])
        w = evaluate_clip(r, clip, 0.25)
        assert np.allclose(w[e], [0.25, 0.75])
