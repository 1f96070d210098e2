"""Pallas TPU kernel for the coupled (sustained-voice + impact) render path.

The hardest kernel of the framework (SURVEY.md §7 hard part 2): a 48 kHz sample-serial
recurrence where each voice reads its object's deflection from the previous sample, steps
a Hunt-Crossley contact force, and drives the same resonators back. Like the scan path
(synth/render.py), everything without feedback dependence is precomputed per block; in
the kernel only the true recurrence remains, with the (O, K) resonator state and (V,)
contact carries resident in VMEM across a sequential sample-chunk grid.

Per sample: V unrolled row gathers pull each voice's object state (the voice objects ride
in scalar-prefetch SMEM), the force model runs vectorized over voices, drive rows
scatter-add back as dynamic row updates, impacts add their factored per-object forces,
and the grid advances. Friction and the sustain level are pre-baked into the gain rows,
so the in-kernel force math is three multipliers per voice.

Semantics match the scan path to f32 rounding; block invariance carries over (integer
sample ages + the same sequential in-kernel recurrences).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .bank import BankParams, BankState, ImpactTable, TrackPool, VoiceTable
from .render import (
    RELIEF_DC_LENGTH,
    SILENT_ENERGY,
    _impact_force_curves,
    _read_tracks_block,
    _voice_gain_rows,
)
from .pallas_impact import MAX_PER_OBJECT, _regroup_impacts

CHUNK = 256  # samples per grid step


def _make_kernel(n_voice: int):
    from jax.experimental import pallas as pl

    def kernel(obj_ref,  # scalar prefetch: (V,) i32 voice objects
               cr_ref, ci_ref, g_ref,          # (O, K)
               gains_ref,                      # (4, V, K): gnf, geo0, geo1, read
               consts_ref,                     # (8, V): sp, stiff, damp, nf, alpha, sr, 0, 0
               vx_ref,                         # (CHUNK, 4, V): relief, slope0, slope1, pad
               force_ref,                      # (CHUNK, R, O) factored impact forces
               imp_gain_ref,                   # (R, O, K)
               zr0_ref, zi0_ref,               # (O, K)
               rm0_ref, pen0_ref,              # (1, V)
               out_ref,                        # (CHUNK, K)
               zr_ref, zi_ref,                 # (O, K)
               rm_ref, pen_ref,                # (1, V)
               zv_scratch):                    # (V, K) VMEM scratch
        @pl.when(pl.program_id(0) == 0)
        def _():
            zr_ref[:] = zr0_ref[:]
            zi_ref[:] = zi0_ref[:]
            rm_ref[:] = rm0_ref[:]
            pen_ref[:] = pen0_ref[:]

        sp = consts_ref[0, :]
        stiff = consts_ref[1, :]
        damp = consts_ref[2, :]
        nf = consts_ref[3, :]
        alpha = consts_ref[4, :]
        sr = consts_ref[5, :]

        def body(s, _):
            # Gather each voice's object state rows (feedback read of the previous sample).
            for v in range(n_voice):
                zv_scratch[pl.ds(v, 1), :] = zi_ref[pl.ds(obj_ref[v], 1), :]
            zv = zv_scratch[:]  # (V, K)
            defl = (gains_ref[3] * zv).sum(axis=1)  # (V,)

            relief_s = vx_ref[s, 0, :]
            slope0_s = vx_ref[s, 1, :]
            slope1_s = vx_ref[s, 2, :]

            rm = rm_ref[0, :] + (relief_s - rm_ref[0, :]) * alpha
            rigid = sp + (relief_s - rm)
            sep = jnp.maximum(rigid - defl, 0.0)
            sep_rate = (sep - pen_ref[0, :]) * sr
            force = jnp.maximum(stiff * sep * jnp.sqrt(sep) * (1.0 + damp * sep_rate), 0.0)
            normal = force - nf
            knee = (normal > 0) & (nf > 0)
            normal = jnp.where(knee, nf * jnp.tanh(normal / jnp.where(knee, nf, 1.0)), normal)
            load = nf + normal
            rm_ref[0, :] = rm
            pen_ref[0, :] = sep

            drive = (
                normal[:, None] * gains_ref[0]
                + (load * slope0_s)[:, None] * gains_ref[1]
                + (load * slope1_s)[:, None] * gains_ref[2]
            )  # (V, K)

            # Impact excitation, factored per object (exact multiply-adds).
            f = force_ref[s]  # (R, O)
            excite = (f[:, :, None] * imp_gain_ref[:]).sum(axis=0)  # (O, K)

            zr = zr_ref[:]
            zi = zi_ref[:]
            new_re = zr * cr_ref[:] - zi * ci_ref[:] + excite
            new_im = zr * ci_ref[:] + zi * cr_ref[:]
            zr_ref[:] = new_re
            zi_ref[:] = new_im
            # Voice drives scatter-add into their object's row (after the shared update,
            # matching z_new = z*c + excite_total since the drive only touches new_re).
            for v in range(n_voice):
                row = pl.ds(obj_ref[v], 1)
                zr_ref[row, :] = zr_ref[row, :] + drive[v : v + 1, :]
            out_ref[s, :] = (g_ref[:] * zi_ref[:]).sum(axis=0)
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(out_ref.shape[0]), body, jnp.int32(0))

    return kernel


@partial(jax.jit, static_argnames=("num_samples",))
def render_block_coupled_pallas(
    params: BankParams,
    state: BankState,
    impacts: ImpactTable,
    voices: VoiceTable,
    pool: TrackPool,
    num_samples: int,
    click_gain: float = 1.0,
    sustain_level: float = 1.0,
    coupling: float = 1.0,
):
    """Coupled block render on the Pallas path. Returns (state, impacts, voices, out)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_obj, n_modes = params.coeff_re.shape
    n_voice = voices.active.shape[0]
    sr = jnp.float32(params.sample_rate)
    assert num_samples % CHUNK == 0

    # ---- shared block precompute (identical to the scan path) ----
    force_imp, prev_force = _impact_force_curves(impacts, num_samples)
    force_with_prev = jnp.concatenate([prev_force[:, None], force_imp], axis=1)
    click = ((impacts.accel_amp * click_gain)[:, None] * jnp.diff(force_with_prev, axis=1)).sum(0)

    imp_obj = jnp.where(impacts.active, impacts.obj, 0)
    imp_shapes = params.shapes[imp_obj, jnp.where(impacts.active, impacts.expos, 0)]
    gain_imp = (imp_shapes * impacts.j[:, None, :]).sum(-1)
    gain_imp = jnp.where(impacts.active[:, None], gain_imp, 0.0)
    order, sorted_obj, rank = _regroup_impacts(impacts, n_obj)
    safe_obj = jnp.minimum(sorted_obj, n_obj - 1)
    keep = (sorted_obj < n_obj) & (rank < MAX_PER_OBJECT)
    safe_rank = jnp.minimum(rank, MAX_PER_OBJECT - 1)
    gain_ork = jnp.zeros((MAX_PER_OBJECT, n_obj, n_modes), jnp.float32)
    gain_ork = gain_ork.at[safe_rank, safe_obj].add(
        jnp.where(keep[:, None], gain_imp[order], 0.0)
    )
    force_sro = jnp.zeros((num_samples, MAX_PER_OBJECT, n_obj), jnp.float32)
    force_sro = force_sro.at[:, safe_rank, safe_obj].add(
        jnp.where(keep[None, :], force_imp[order].T, 0.0)
    )

    heights = _read_tracks_block(pool, voices, num_samples)  # (V, 4, S)
    relief = heights.sum(axis=1)
    h_prev = jnp.concatenate([voices.prev_height[:, :, None], heights[:, :, :-1]], axis=2)
    step = voices.track_step[:, :, None]
    slope_terms = jnp.where(step > 0, (heights - h_prev) / jnp.where(step > 0, step, 1.0), 0.0)
    first_mask = (~voices.primed)[:, None]
    slope_terms = slope_terms.at[:, :, 0].set(jnp.where(first_mask, 0.0, slope_terms[:, :, 0]))
    slope0 = slope_terms[:, 0::2, :].sum(axis=1)
    slope1 = slope_terms[:, 1::2, :].sum(axis=1)
    alpha = jnp.minimum(voices.track_step.max(axis=1) / RELIEF_DC_LENGTH, 1.0)

    gain_n, gain_geo0, gain_geo1, gain_fric, read_gain = _voice_gain_rows(
        params, voices, coupling
    )
    active_v = voices.active.astype(jnp.float32)
    sustain_scale = (sustain_level / sr) * active_v  # (V,)
    # Bake friction + sustain into the rows: drive = normal*gnf + load*slope0*geo0 + ...
    gnf = sustain_scale[:, None] * (gain_n + voices.friction[:, None] * gain_fric)
    geo0 = sustain_scale[:, None] * gain_geo0
    geo1 = sustain_scale[:, None] * gain_geo1
    gains4 = jnp.stack([gnf, geo0, geo1, read_gain], axis=0).astype(jnp.float32)

    consts = jnp.stack(
        [
            voices.static_pen, voices.stiffness, voices.damping, voices.normal_force,
            alpha, jnp.full((n_voice,), sr, jnp.float32),
            jnp.zeros(n_voice, jnp.float32), jnp.zeros(n_voice, jnp.float32),
        ]
    ).astype(jnp.float32)  # (8, V)

    vx = jnp.stack([relief, slope0, slope1, jnp.zeros_like(relief)], axis=1)  # (V, 4, S)
    vx = jnp.transpose(vx, (2, 1, 0)).astype(jnp.float32)  # (S, 4, V)

    rm0 = jnp.where(voices.primed, voices.relief_mean, relief[:, 0])[None, :].astype(jnp.float32)
    pen0 = jnp.where(voices.primed, voices.penetration,
                     jnp.maximum(voices.static_pen, 0.0))[None, :].astype(jnp.float32)
    g2d = params.out_gain[:, None] * jnp.ones((1, n_modes), jnp.float32)
    v_obj = jnp.where(voices.active, voices.obj, 0).astype(jnp.int32)

    n_chunks = num_samples // CHUNK
    kernel = _make_kernel(n_voice)
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((n_obj, n_modes), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_obj, n_modes), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_obj, n_modes), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, n_voice, n_modes), lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, n_voice), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((CHUNK, 4, n_voice), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((CHUNK, MAX_PER_OBJECT, n_obj), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((MAX_PER_OBJECT, n_obj, n_modes), lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_obj, n_modes), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_obj, n_modes), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_voice), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_voice), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((CHUNK, n_modes), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_obj, n_modes), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_obj, n_modes), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_voice), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_voice), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((n_voice, n_modes), jnp.float32)],
        )
        out, z_re, z_im, rm_out, pen_out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((num_samples, n_modes), jnp.float32),
                jax.ShapeDtypeStruct((n_obj, n_modes), jnp.float32),
                jax.ShapeDtypeStruct((n_obj, n_modes), jnp.float32),
                jax.ShapeDtypeStruct((1, n_voice), jnp.float32),
                jax.ShapeDtypeStruct((1, n_voice), jnp.float32),
            ],
            interpret=jax.default_backend() != "tpu",
        )(
            v_obj,
            params.coeff_re, params.coeff_im, g2d, gains4, consts,
            vx, force_sro, gain_ork, state.z_re, state.z_im, rm0, pen0,
        )

    out = out.sum(axis=1) + click

    # ---- post-block bookkeeping (identical to the scan path) ----
    new_age_i = impacts.age + num_samples
    imp_active = impacts.active & (new_age_i < impacts.total)
    impacts = ImpactTable(
        active=imp_active, obj=impacts.obj, expos=impacts.expos, j=impacts.j,
        pulse_step=impacts.pulse_step, gamma=impacts.gamma, accel_amp=impacts.accel_amp,
        age=new_age_i, total=impacts.total,
    )
    voices = VoiceTable(
        active=voices.active, obj=voices.obj, blend_pts=voices.blend_pts,
        blend_w=voices.blend_w, normal=voices.normal, slip=voices.slip, sweep=voices.sweep,
        normal_force=voices.normal_force, friction=voices.friction,
        stiffness=voices.stiffness, static_pen=voices.static_pen, damping=voices.damping,
        track_idx=voices.track_idx, track_rate=voices.track_rate,
        track_sigma=voices.track_sigma, track_window=voices.track_window,
        track_step=voices.track_step,
        pos_base=voices.pos_base,
        age=voices.age + num_samples,
        prev_height=jnp.where(voices.active[:, None], heights[:, :, -1], voices.prev_height),
        relief_mean=rm_out[0].astype(voices.relief_mean.dtype),
        penetration=pen_out[0].astype(voices.penetration.dtype),
        primed=voices.primed | voices.active,
    )
    energy = jnp.sum(z_re * z_re + z_im * z_im, axis=1)
    has_excite = jax.ops.segment_sum(
        jnp.concatenate([voices.active, imp_active]).astype(jnp.float32),
        jnp.concatenate([v_obj, imp_obj]),
        num_segments=n_obj,
    )
    silent = (energy * params.out_gain**2 < SILENT_ENERGY) & (has_excite == 0)
    keep_mask = (~silent)[:, None].astype(jnp.float32)
    state = BankState(z_re=z_re * keep_mask, z_im=z_im * keep_mask)
    return state, impacts, voices, out
