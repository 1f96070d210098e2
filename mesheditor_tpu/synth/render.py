"""The fused modal render kernel: one block of 48 kHz audio for the whole scene.

TPU-first restructuring of the reference's render path (RenderModal + RenderObjectFast +
RenderObjectCoupled, src/audio/ModalAudio.cpp:155-451, 769-838):

- The reference deals objects across worker threads; here the whole (objects, modes) grid
  advances in ONE `lax.scan` over samples — batching replaces the thread pool.
- Everything with no feedback dependence is hoisted out of the sample loop and vectorized
  over the block: impact half-sine force curves, per-impact gain rows, per-voice surface
  track reads (positions are exact functions of an integer sample age, so reads vectorize
  as block gathers), slopes, and all drive/read gain rows.
- What remains in the scan is only the true recurrence: the contact force fed by the
  object's own deflection (the one-sample-delay coupling), the relief-mean and penetration
  carries, and the resonator update itself. Voice->object scatter runs as one-hot matmuls
  (MXU) instead of scatters.

Block-boundary invariance is exact by construction: all precomputed signals depend on
(carried state, integer global sample age) only, and in-scan recurrences are sequential —
the property the reference proves in tests/ModalRenderTest.cpp:260-269.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .bank import BankParams, BankState, ImpactTable, TrackPool, VoiceTable
from .tracks import TRACK_SAMPLES

# An object whose gain-weighted state energy falls below this (with no active excitation)
# is zeroed and skipped (reference: SilentEnergy, ModalAudio.cpp:21).
SILENT_ENERGY = 1e-12
# Distance over which the relief's local mean is removed, m — far longer than any wavelength
# the contact filter passes, so a settled contact is exactly silent (ModalAudio.cpp:23-24).
RELIEF_DC_LENGTH = 1e-2


def _impact_force_curves(impacts: ImpactTable, num_samples: int):
    """Half-sine pulse forces for the block, (I, S), plus the previous-sample force (for the
    acceleration-noise click, which is the force derivative). Exact in the integer age."""
    s_idx = jnp.arange(num_samples, dtype=jnp.int32)
    ages = impacts.age[:, None] + 1 + s_idx[None, :]  # (I, S)
    live = impacts.active[:, None] & (ages <= impacts.total[:, None])
    phase = jnp.pi * impacts.pulse_step[:, None] * ages.astype(jnp.float32)
    force = jnp.where(live, impacts.gamma[:, None] * jnp.sin(phase), 0.0)
    prev_age = impacts.age
    prev_live = impacts.active & (prev_age >= 1) & (prev_age <= impacts.total)
    prev_phase = jnp.pi * impacts.pulse_step * prev_age.astype(jnp.float32)
    prev_force = jnp.where(prev_live, impacts.gamma * jnp.sin(prev_phase), 0.0)
    return force, prev_force


def _read_tracks_block(pool: TrackPool, voices: VoiceTable, num_samples: int):
    """Windowed track heights for every (voice, track, sample): the contact-filter read
    (reference: ReadTrack, SurfaceNoise.h:54-65), vectorized over the whole block."""
    n = pool.heights.shape[1]
    s_idx = jnp.arange(num_samples, dtype=jnp.int32)
    ages = voices.age[:, None, None] + 1 + s_idx[None, None, :]  # (V, 1, S)
    pos = voices.pos_base[:, :, None] + ages.astype(jnp.float64) * voices.track_rate.astype(
        jnp.float64
    )[:, :, None]  # (V, 4, S) f64
    slot = jnp.maximum(voices.track_idx, 0)[:, :, None]  # (V, 4, 1)
    has_track = (voices.track_idx >= 0)[:, :, None]

    def wrap(p):
        wraps = jnp.floor(p / n)
        f = jnp.maximum(p - wraps * n, 0.0)
        i = jnp.minimum(f.astype(jnp.int32), n - 1)
        return i, (f - i).astype(jnp.float32), wraps

    def integral(p):
        i, frac, wraps = wrap(p)
        base = pool.sums[slot, i]  # (V, 4, S) gather
        h = pool.heights[slot, i]
        total = pool.sums[slot, n]
        return base + frac * h + wraps.astype(jnp.float32) * total

    window = voices.track_window[:, :, None]
    half = (0.5 * window).astype(jnp.float64)
    box = (integral(pos + half) - integral(pos - half)) / jnp.maximum(window, 1e-30)

    i, frac, _ = wrap(pos)
    j = jnp.where(i + 1 < n, i + 1, 0)
    h_i = pool.heights[slot, i]
    h_j = pool.heights[slot, j]
    interp = h_i + frac * (h_j - h_i)

    heights = jnp.where(window <= 1.0, interp, box)
    heights = jnp.where(has_track, heights, 0.0)
    return heights * voices.track_sigma[:, :, None]  # (V, 4, S)


def _voice_gain_rows(params: BankParams, voices: VoiceTable, coupling):
    """Drive gain rows (mode shapes blended over the contact triangle, projected onto the
    contact directions) and the deflection read-out row — fixed for the block
    (reference: RenderObjectCoupled prologue, ModalAudio.cpp:388-415)."""
    # shapes: (O, P, K, 3); blend over 3 sample points -> (V, K, 3). Written as broadcast
    # multiply + reduce (not dot_general) to stay at exact f32 precision (see render_block).
    obj = voices.obj
    pts = voices.blend_pts  # (V, 3)
    sh = params.shapes[obj[:, None], pts]  # (V, 3, K, 3)
    blend = (voices.blend_w[:, :, None, None] * sh).sum(axis=1)  # (V, K, 3)
    gain_n = (blend * voices.normal[:, None, :]).sum(-1)
    gain_geo0 = (blend * voices.sweep[:, 0][:, None, :]).sum(-1)
    gain_geo1 = (blend * voices.sweep[:, 1][:, None, :]).sum(-1)
    gain_fric = (blend * voices.slip[:, None, :]).sum(-1)
    # The separation is modulated by the object's own vibration along the same normal.
    read_gain = coupling * gain_n * params.disp_scale[obj]  # (V, K)
    return gain_n, gain_geo0, gain_geo1, gain_fric, read_gain


def render_block_impl(
    params: BankParams,
    state: BankState,
    impacts: ImpactTable,
    voices: VoiceTable,
    pool: TrackPool,
    num_samples: int,
    click_gain: float = 1.0,
    sustain_level: float = 1.0,
    coupling: float = 1.0,
    debug: bool = False,
):
    """Advance the whole scene `num_samples` samples. Returns (state, impacts, voices, out).

    `out` is the mono mix (num_samples,) float32. Impact ages advance and finished pulses
    deactivate; voice carries advance; objects whose gain-weighted energy decays below
    SILENT_ENERGY with no active excitation are zeroed.
    """
    n_obj, n_modes = params.coeff_re.shape
    n_imp = impacts.active.shape[0]
    n_voice = voices.active.shape[0]
    sr = jnp.float32(params.sample_rate)

    # ---- Block precompute (no feedback dependence) ----
    force_imp, prev_force = _impact_force_curves(impacts, num_samples)  # (I, S), (I,)

    # Acceleration-noise click: the force derivative times the click amplitude
    # (reference: ModalAudio.cpp:786-813). Contractions here and below are written as
    # broadcast-multiply + reduce / segment_sum rather than dot_general: XLA's default dot
    # precision is bf16-class on TPU (and on this CPU build), far too coarse for an audio
    # path, while reduces and scatter-adds stay exact f32.
    force_with_prev = jnp.concatenate([prev_force[:, None], force_imp], axis=1)
    click = ((impacts.accel_amp * click_gain)[:, None] * jnp.diff(force_with_prev, axis=1)).sum(0)

    # Per-impact gain rows: impulse projected onto the struck point's mode shapes
    # (reference: ImpactGainRow, ModalAudio.cpp:147-151).
    imp_obj = jnp.where(impacts.active, impacts.obj, 0)
    imp_shapes = params.shapes[imp_obj, jnp.where(impacts.active, impacts.expos, 0)]  # (I, K, 3)
    gain_imp = (imp_shapes * impacts.j[:, None, :]).sum(-1)
    gain_imp = jnp.where(impacts.active[:, None], gain_imp, 0.0)

    v_obj = jnp.where(voices.active, voices.obj, 0)

    # Voice precompute: track heights, relief, per-surface slopes, distances.
    heights = _read_tracks_block(pool, voices, num_samples)  # (V, 4, S)
    relief = heights.sum(axis=1)  # (V, S)
    h_prev = jnp.concatenate([voices.prev_height[:, :, None], heights[:, :, :-1]], axis=2)
    step = voices.track_step[:, :, None]  # (V, 4, 1)
    slope_terms = jnp.where(step > 0, (heights - h_prev) / jnp.where(step > 0, step, 1.0), 0.0)
    # A voice's first-ever sample has no previous height to difference against.
    first_sample_mask = (~voices.primed)[:, None]  # (V, 1) — applies to s == 0 only
    slope_terms = slope_terms.at[:, :, 0].set(
        jnp.where(first_sample_mask, 0.0, slope_terms[:, :, 0])
    )
    # A track's surface is its index's low bit (reference: ModalAudio.cpp:252-263).
    slope0 = slope_terms[:, 0::2, :].sum(axis=1)  # (V, S)
    slope1 = slope_terms[:, 1::2, :].sum(axis=1)
    distance = voices.track_step.max(axis=1)  # (V,)
    alpha = jnp.minimum(distance / RELIEF_DC_LENGTH, 1.0)

    gain_n, gain_geo0, gain_geo1, gain_fric, read_gain = _voice_gain_rows(
        params, voices, coupling
    )
    active_v = voices.active.astype(jnp.float32)

    # Carry initialization incl. priming (reference: StepVoice priming, ModalAudio.cpp:243-271).
    rm0 = jnp.where(voices.primed, voices.relief_mean, relief[:, 0])
    pen0 = jnp.where(voices.primed, voices.penetration, jnp.maximum(voices.static_pen, 0.0))

    sustain_scale = sustain_level / sr

    def scan_step(carry, xs):
        z_re, z_im, rm, pen = carry
        f_imp_s, relief_s, slope0_s, slope1_s = xs

        # Deflection each voice reads off its object's state from the previous sample.
        z_im_v = z_im[v_obj]  # (V, K) gather
        defl = (read_gain * z_im_v).sum(axis=1)

        # Contact force model (Hunt-Crossley with roughness-track excitation,
        # reference: StepVoice, ModalAudio.cpp:238-291).
        rm = rm + (relief_s - rm) * alpha
        # The fluctuation is differenced BEFORE the static penetration enters, so a settled
        # contact (relief == mean exactly) sits at exactly delta0 and excites nothing —
        # exact rest-silence by construction rather than by rounding luck.
        rigid = voices.static_pen + (relief_s - rm)
        sep = jnp.maximum(rigid - defl, 0.0)
        sep_rate = (sep - pen) * sr
        pen = sep
        force = jnp.maximum(
            voices.stiffness * sep * jnp.sqrt(sep) * (1.0 + voices.damping * sep_rate), 0.0
        )
        normal = force - voices.normal_force
        # Soft knee: the upward fluctuation is bounded by the load it rides on; the downward
        # side already bottoms out at exactly minus the load.
        knee = (normal > 0) & (voices.normal_force > 0)
        normal = jnp.where(
            knee,
            voices.normal_force * jnp.tanh(normal / jnp.where(knee, voices.normal_force, 1.0)),
            normal,
        )
        load = voices.normal_force + normal
        f_n = sustain_scale * normal * active_v
        f_g0 = sustain_scale * load * slope0_s * active_v
        f_g1 = sustain_scale * load * slope1_s * active_v
        f_fr = sustain_scale * voices.friction * normal * active_v

        # Excitation of every mode: voices' four drive rows + impacts, scattered to objects
        # with exact segment-sum adds (replaces GatherExcitation + the renderer deal).
        drive_v = (
            f_n[:, None] * gain_n
            + f_g0[:, None] * gain_geo0
            + f_g1[:, None] * gain_geo1
            + f_fr[:, None] * gain_fric
        )  # (V, K)
        drive_i = f_imp_s[:, None] * gain_imp  # (I, K)
        excite = jax.ops.segment_sum(
            jnp.concatenate([drive_v, drive_i], axis=0),
            jnp.concatenate([v_obj, imp_obj], axis=0),
            num_segments=n_obj,
        )  # (O, K)

        # Resonator update: z <- z*c + excite (excitation enters the real part; the output
        # and the deflection read are the imaginary part).
        new_re = z_re * params.coeff_re - z_im * params.coeff_im + excite
        new_im = z_re * params.coeff_im + z_im * params.coeff_re
        out_s = (params.out_gain[:, None] * new_im).sum()
        if debug:
            return (new_re, new_im, rm, pen), (out_s, rm, pen, force, relief_s)
        return (new_re, new_im, rm, pen), out_s

    xs = (force_imp.T, relief.T, slope0.T, slope1.T)  # (S, ...) per-step slices
    (z_re, z_im, rm_out, pen_out), out = jax.lax.scan(
        scan_step, (state.z_re, state.z_im, rm0, pen0), xs
    )
    if debug:
        out, rm_t, pen_t, force_t, relief_t = out
        dbg_scan = {"rm_t": rm_t, "pen_t": pen_t, "force_t": force_t, "relief_t": relief_t}
    out = out + click

    # ---- Post-block bookkeeping ----
    new_age_i = impacts.age + num_samples
    imp_active = impacts.active & (new_age_i < impacts.total)
    impacts = ImpactTable(
        active=imp_active,
        obj=impacts.obj,
        expos=impacts.expos,
        j=impacts.j,
        pulse_step=impacts.pulse_step,
        gamma=impacts.gamma,
        accel_amp=impacts.accel_amp,
        age=new_age_i,
        total=impacts.total,
    )

    voices = VoiceTable(
        active=voices.active,
        obj=voices.obj,
        blend_pts=voices.blend_pts,
        blend_w=voices.blend_w,
        normal=voices.normal,
        slip=voices.slip,
        sweep=voices.sweep,
        normal_force=voices.normal_force,
        friction=voices.friction,
        stiffness=voices.stiffness,
        static_pen=voices.static_pen,
        damping=voices.damping,
        track_idx=voices.track_idx,
        track_rate=voices.track_rate,
        track_sigma=voices.track_sigma,
        track_window=voices.track_window,
        track_step=voices.track_step,
        pos_base=voices.pos_base,
        age=voices.age + num_samples,
        prev_height=jnp.where(voices.active[:, None], heights[:, :, -1], voices.prev_height),
        relief_mean=rm_out,
        penetration=pen_out,
        primed=voices.primed | voices.active,
    )

    # Silence culling: gain-weighted energy below the floor with no excitation -> zero state
    # (reference: SilenceObject via RenderObjectFast, ModalAudio.cpp:206-209).
    energy = jnp.sum(z_re * z_re + z_im * z_im, axis=1)
    has_excite = jax.ops.segment_sum(
        jnp.concatenate([voices.active, imp_active]).astype(jnp.float32),
        jnp.concatenate([v_obj, imp_obj]),
        num_segments=n_obj,
    )
    silent = (energy * params.out_gain**2 < SILENT_ENERGY) & (has_excite == 0)
    keep = (~silent)[:, None].astype(jnp.float32)
    state = BankState(z_re=z_re * keep, z_im=z_im * keep)

    if debug:
        dbg = {"relief": relief, "slope0": slope0, "slope1": slope1, "heights": heights,
               "rm0": rm0, "rm_out": rm_out, "pen_out": pen_out, **dbg_scan}
        return state, impacts, voices, out, dbg
    return state, impacts, voices, out


render_block = partial(jax.jit, static_argnames=("num_samples",),
                       donate_argnames=("state", "voices", "impacts"))(render_block_impl)
