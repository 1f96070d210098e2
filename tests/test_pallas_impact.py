"""Pallas impact kernel vs the lax.scan reference path: same scene, same samples."""

import numpy as np
import pytest

import mesheditor_tpu  # noqa: F401
import jax.numpy as jnp
from mesheditor_tpu.synth.bank import BankParams, BankState, ImpactTable, TrackPool, VoiceTable
from mesheditor_tpu.synth.pallas_impact import CHUNK, render_block_impacts_pallas
from mesheditor_tpu.synth.render import render_block_impl


def make_scene(n_obj=4, k=32, n_imp=8, impacts_per_obj=2):
    rng = np.random.default_rng(3)
    freqs = np.linspace(80, 4000, k)
    decay = np.power(1e-3, 1.0 / (0.4 * 48000.0))
    omega = 2 * np.pi * freqs / 48000.0
    params = BankParams(
        coeff_re=jnp.asarray(np.tile(decay * np.cos(omega), (n_obj, 1)), jnp.float32),
        coeff_im=jnp.asarray(np.tile(decay * np.sin(omega), (n_obj, 1)), jnp.float32),
        disp_scale=jnp.asarray(np.tile(1 / (2 * np.pi * freqs), (n_obj, 1)), jnp.float32),
        shapes=jnp.asarray(rng.standard_normal((n_obj, 2, k, 3)) * 0.01, jnp.float32),
        out_gain=jnp.asarray(rng.uniform(0.5, 1.5, n_obj), jnp.float32),
        sample_rate=48000.0,
    )
    state = BankState(
        z_re=jnp.asarray(rng.standard_normal((n_obj, k)) * 1e-3, jnp.float32),
        z_im=jnp.asarray(rng.standard_normal((n_obj, k)) * 1e-3, jnp.float32),
    )
    act = np.zeros(n_imp, bool)
    obj = np.zeros(n_imp, np.int32)
    count = 0
    for o in range(n_obj):
        for r in range(impacts_per_obj):
            if count < n_imp:
                act[count] = True
                obj[count] = o
                count += 1
    imp = ImpactTable(
        active=jnp.asarray(act),
        obj=jnp.asarray(obj),
        expos=jnp.asarray(np.arange(n_imp, dtype=np.int32) % 2),
        j=jnp.asarray(rng.standard_normal((n_imp, 3)) * 0.05, jnp.float32),
        pulse_step=jnp.full(n_imp, 1 / 180.0, jnp.float32),
        gamma=jnp.full(n_imp, np.pi / 2 / 180.0, jnp.float32),
        accel_amp=jnp.asarray(rng.uniform(0, 0.01, n_imp), jnp.float32),
        age=jnp.asarray(np.arange(n_imp, dtype=np.int32) * 3),
        total=jnp.full(n_imp, 180, jnp.int32),
    )
    return params, state, imp


class TestPallasImpactKernel:
    def test_matches_scan_path(self):
        params, state, imp = make_scene()
        voices = VoiceTable.empty(2)
        pool = TrackPool.empty(2, 128)
        s_scan, i_scan, _, out_scan = render_block_impl(
            params, state, imp, voices, pool, CHUNK, click_gain=1.0
        )
        s_pal, i_pal, out_pal = render_block_impacts_pallas(
            params, state, imp, CHUNK, click_gain=1.0
        )
        out_scan = np.asarray(out_scan)
        out_pal = np.asarray(out_pal)
        peak = max(np.abs(out_scan).max(), 1e-12)
        assert np.abs(out_pal - out_scan).max() < 2e-5 * peak
        assert np.allclose(np.asarray(s_pal.z_re), np.asarray(s_scan.z_re),
                           rtol=1e-4, atol=1e-9)
        assert np.array_equal(np.asarray(i_pal.active), np.asarray(i_scan.active))
        assert np.array_equal(np.asarray(i_pal.age), np.asarray(i_scan.age))

    def test_multi_chunk_continuity(self):
        params, state, imp = make_scene()
        # Two single chunks == one double chunk (block-boundary invariance on this path).
        s1, i1, o1 = render_block_impacts_pallas(params, state, imp, CHUNK)
        s2, i2, o2 = render_block_impacts_pallas(params, s1, i1, CHUNK)
        s12, i12, o12 = render_block_impacts_pallas(params, state, imp, 2 * CHUNK)
        assert np.array_equal(np.asarray(o12), np.concatenate([np.asarray(o1), np.asarray(o2)]))
        assert np.array_equal(np.asarray(s12.z_im), np.asarray(s2.z_im))

    def test_engine_auto_path(self):
        from mesheditor_tpu.synth import ModalSynth, ModalEvent
        from mesheditor_tpu.types import ModalModes

        m = ModalModes(freqs=np.linspace(100, 3000, 16), t60s=np.full(16, 0.3),
                       shapes=np.full((2, 16, 3), 0.01, np.float32))
        s = ModalSynth([m], gains=[1.0], max_impacts=8, max_voices=2)
        s.enqueue(ModalEvent("impact", obj=0, j=(1, 0, 0), pulse_step=1 / 100,
                             pulse_gamma=1.0))
        out = np.asarray(s.render(CHUNK))
        assert np.isfinite(out).all() and np.abs(out).max() > 0
        # Off-chunk sizes route through the scan path and stay consistent.
        out2 = np.asarray(s.render(100))
        assert np.isfinite(out2).all()
