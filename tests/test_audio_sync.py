"""Scene-reactive audio reconcile (reference: AudioSystem entity loop)."""

import numpy as np
import pytest

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu.mesh import icosphere_surface
from mesheditor_tpu.scene.audio_sync import SceneAudio
from mesheditor_tpu.scene.components import (
    AcousticMaterialRef, ExciteState, MeshSurface, ModalGainComponent, ModalModel,
    ModalTuningComponent, SolveSettingsComponent, Transform,
)
from mesheditor_tpu.scene.registry import Registry


def make_scene():
    reg = Registry()
    e = reg.create()
    pts, tris = icosphere_surface(1)
    reg.emplace(e, MeshSurface(positions=pts * 0.03, triangles=tris))
    reg.emplace(e, AcousticMaterialRef(name="Glass", density=2600.0,
                                       young_modulus=6.2e10, poisson_ratio=0.20,
                                       alpha=1.0, beta=1e-7))
    reg.emplace(e, SolveSettingsComponent(num_modes=6, num_vertices=4,
                                          max_mode_freq=2e5))
    return reg, e


@pytest.mark.slow
class TestSceneAudioSlow:
    pass


class TestSceneAudio:
    def test_solve_rescale_reload_cycle(self, tmp_path):
        reg, e = make_scene()
        sa = SceneAudio(reg, tmp_path / "modal", tet_resolution=6)

        # 1. First reconcile solves and wires the bank.
        r1 = sa.reconcile()
        assert r1.solved == [e] and not r1.rescaled
        comp = reg.get(e, ModalModel)
        assert comp is not None and comp.path and comp.inputs_hash
        assert reg.get(e, ExciteState).bank_slot == 0
        f_base = np.asarray(sa._live[e].modes.freqs).copy()
        assert f_base.size > 0

        # 2. No edits -> nothing happens.
        r2 = sa.reconcile()
        assert not r2.solved and not r2.rescaled and r2.up_to_date == [e]

        # 3. Density x2 is NOT staleness: exact rescale, freqs scale by 1/sqrt(2).
        reg.get(e, AcousticMaterialRef).density = 5200.0
        r3 = sa.reconcile()
        assert r3.rescaled == [e] and not r3.solved
        f_heavy = np.asarray(sa._live[e].modes.freqs)
        # Damped frequencies: the Rayleigh alpha term does not scale with density, so
        # the ratio is 1/sqrt(2) only up to the (small) damping correction.
        np.testing.assert_allclose(f_heavy, f_base / np.sqrt(2.0), rtol=1e-3)

        # 4. Poisson edit IS staleness: re-solve.
        reg.get(e, AcousticMaterialRef).poisson_ratio = 0.30
        r4 = sa.reconcile()
        assert r4.solved == [e]

        # 5. Geometry edit (scale) is staleness too.
        reg.emplace(e, Transform(scale=np.array([2.0, 2.0, 2.0])))
        r5 = sa.reconcile()
        assert r5.solved == [e]

        # 6. A fresh coordinator over the same registry trusts the stored fingerprint:
        #    loads from the content-addressed store, re-solves nothing.
        sb = SceneAudio(reg, tmp_path / "modal", tet_resolution=6)
        r6 = sb.reconcile()
        assert r6.loaded == [e] and not r6.solved
        np.testing.assert_array_equal(np.asarray(sb._live[e].modes.freqs),
                                      np.asarray(sa._live[e].modes.freqs))

    def test_strike_and_tuning(self, tmp_path):
        reg, e = make_scene()
        reg.emplace(e, ModalGainComponent(value=2.0))
        # The 3 cm glass shell rings above 30 kHz: render at 96 kHz so the modes
        # clear the Nyquist mute in tune_coeffs.
        sa = SceneAudio(reg, tmp_path / "modal", sample_rate=96_000.0, tet_resolution=6)
        sa.reconcile()

        sa.strike(e, 0, (0.02, 0.05, 0.01))
        out = np.asarray(sa.synth.render(1024))
        assert np.isfinite(out).all() and np.abs(out).max() > 0

        # Tuning shifts the fundamental without a re-solve.
        f1 = float(sa._live[e].modes.freqs[0])
        reg.emplace(e, ModalTuningComponent(fundamental_freq=f1 / 2, t60_scale=1.0))
        r = sa.reconcile()
        assert not r.solved and not r.rescaled

    def test_entity_removal_shrinks_bank(self, tmp_path):
        reg, e = make_scene()
        sa = SceneAudio(reg, tmp_path / "modal", tet_resolution=6)
        sa.reconcile()
        assert sa.synth is not None
        reg.remove(e, MeshSurface)
        r = sa.reconcile()
        assert r.removed == [e]
        assert sa.synth is None


class TestSimulateScene:
    def test_drop_rings_and_rests(self, tmp_path):
        from mesheditor_tpu.scene.audio_sync import simulate_scene

        reg, e = make_scene()
        reg.emplace(e, Transform(translation=np.array([0.0, 0.2, 0.0])))
        # Heavy enough that the landing impulse (~m*v*(1+e)) clears the reference's
        # 0.2 kg*m/s min_contact_impulse threshold.
        reg.emplace(e, __import__("mesheditor_tpu.scene.components", fromlist=["RigidBodyComponent"])
                    .RigidBodyComponent(shape_kind="sphere", radius=0.03, is_dynamic=True,
                                        mass=0.3))
        floor = reg.create()
        reg.emplace(floor, __import__("mesheditor_tpu.scene.components", fromlist=["RigidBodyComponent"])
                    .RigidBodyComponent(shape_kind="plane"))
        audio = simulate_scene(reg, tmp_path / "modal", seconds=0.6,
                               sample_rate=96_000.0, tet_resolution=6)
        assert np.isfinite(audio).all()
        assert np.abs(audio).max() > 0  # the fall produced sound
        # The impact happens after the free-fall time, not at t=0.
        first = int(np.flatnonzero(np.abs(audio) > 0)[0])
        assert first > 0.1 * 96_000
        t = reg.get(e, Transform)
        assert abs(t.translation[1] - 0.03) < 0.01  # rests at its radius
