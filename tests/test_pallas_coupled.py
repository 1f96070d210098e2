"""Coupled Pallas kernel vs the lax.scan reference path (interpreter on CPU)."""

import numpy as np
import pytest

import mesheditor_tpu  # noqa: F401
import jax.numpy as jnp
from mesheditor_tpu.synth.bank import (
    BankParams, BankState, ImpactTable, TrackPool, VoiceTable, apply_voice_state,
    VOICE_F32_COLS, VOICE_I32_COLS,
)
from mesheditor_tpu.synth.pallas_coupled import CHUNK, render_block_coupled_pallas
from mesheditor_tpu.synth.render import render_block_impl
from tests.test_pallas_impact import make_scene


def add_voices(n_obj, n_voice, pool_slots=2, pool_len=512):
    rng = np.random.default_rng(11)
    voices = VoiceTable.empty(n_voice)
    f32 = np.zeros((n_voice, VOICE_F32_COLS), np.float32)
    i32 = np.zeros((n_voice, VOICE_I32_COLS), np.int32)
    for v in range(max(n_voice - 1, 1)):  # leave the last row inactive
        f32[v, 0:3] = [0.5, 0.3, 0.2]
        f32[v, 3:6] = [0, 1, 0]
        f32[v, 6:9] = [1, 0, 0]
        f32[v, 9:15] = [1, 0, 0, 0, 0, -1]
        f32[v, 15] = 4.0  # normal force
        f32[v, 16] = 0.4  # friction
        f32[v, 17] = 2.0**28
        f32[v, 18] = 2.0**-20
        f32[v, 19] = 0.3
        f32[v, 20:24] = 0.4  # rate
        f32[v, 24:28] = 2e-7  # sigma
        f32[v, 28:32] = 6.0  # window
        f32[v, 32:36] = 4e-7  # step
        i32[v, 0] = v % n_obj
        i32[v, 1:4] = [0, 1, 2]
        i32[v, 4:8] = 0  # pool slot 0
        i32[v, 8] = 1
        i32[v, 9] = 1  # reset carries
    voices = apply_voice_state(voices, jnp.asarray(f32), jnp.asarray(i32))
    h = rng.standard_normal(pool_len).astype(np.float32)
    sums = np.zeros(pool_len + 1, np.float32)
    np.cumsum(h, out=sums[1:])
    pool = TrackPool(
        heights=jnp.zeros((pool_slots, pool_len), jnp.float32).at[0].set(jnp.asarray(h)),
        sums=jnp.zeros((pool_slots, pool_len + 1), jnp.float32).at[0].set(jnp.asarray(sums)),
    )
    return voices, pool


class TestCoupledPallas:
    def test_matches_scan_path(self):
        params, state, imp = make_scene(n_obj=4, k=32, n_imp=8, impacts_per_obj=1)
        voices, pool = add_voices(4, 4)
        s_scan, i_scan, v_scan, out_scan = render_block_impl(
            params, state, imp, voices, pool, CHUNK,
            click_gain=1.0, sustain_level=1.0, coupling=1.0,
        )
        s_pal, i_pal, v_pal, out_pal = render_block_coupled_pallas(
            params, state, imp, voices, pool, CHUNK,
            click_gain=1.0, sustain_level=1.0, coupling=1.0,
        )
        out_scan = np.asarray(out_scan)
        out_pal = np.asarray(out_pal)
        peak = max(np.abs(out_scan).max(), 1e-12)
        assert np.abs(out_pal - out_scan).max() < 5e-5 * peak
        assert np.allclose(np.asarray(s_pal.z_im), np.asarray(s_scan.z_im),
                           rtol=1e-3, atol=peak * 1e-6)
        assert np.allclose(np.asarray(v_pal.relief_mean), np.asarray(v_scan.relief_mean),
                           rtol=1e-5, atol=1e-12)
        assert np.allclose(np.asarray(v_pal.penetration), np.asarray(v_scan.penetration),
                           rtol=1e-4, atol=1e-12)
        assert np.array_equal(np.asarray(v_pal.age), np.asarray(v_scan.age))

    def test_multi_chunk_continuity(self):
        params, state, imp = make_scene(n_obj=4, k=32, n_imp=8, impacts_per_obj=1)
        voices, pool = add_voices(4, 4)
        s1, i1, v1, o1 = render_block_coupled_pallas(params, state, imp, voices, pool, CHUNK)
        s2, i2, v2, o2 = render_block_coupled_pallas(params, s1, i1, v1, pool, CHUNK)
        s12, i12, v12, o12 = render_block_coupled_pallas(params, state, imp, voices, pool,
                                                         2 * CHUNK)
        assert np.array_equal(np.asarray(o12),
                              np.concatenate([np.asarray(o1), np.asarray(o2)]))
        assert np.array_equal(np.asarray(s12.z_im), np.asarray(s2.z_im))
        assert np.array_equal(np.asarray(v12.penetration), np.asarray(v2.penetration))
