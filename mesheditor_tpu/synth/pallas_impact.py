"""Pallas TPU kernel for the impact-path resonator advance.

The lax.scan render (synth/render.py) pays a fixed per-sample step overhead; this kernel
runs the whole block inside VMEM: resonator state (O, K) stays resident across the
sequential grid over sample-chunks, per-object force rows stream in, and the mix
accumulates per sample on the VPU. Semantics are identical to the scan path for scenes
with no sustained voices (the engine falls back to the scan whenever a voice is live):

    excite[o, k] = sum_r force[o, r, s] * gain[o, r, k]        (exact f32 multiply-adds,
                                                                no dot_general)
    z <- z * c + excite;  out[s] = sum(out_gain * Im(z))

Impacts regroup from the flat table into (object, slot) factored form — at most
MAX_PER_OBJECT simultaneous pulses per object ride the kernel; the engine falls back to
the scan path beyond that. Forces are exact functions of the integer sample age, so block
-boundary invariance carries over unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .bank import BankParams, BankState, ImpactTable
from .render import SILENT_ENERGY, _impact_force_curves

MAX_PER_OBJECT = 4  # factored impact slots per object
CHUNK = 256  # samples per grid step


def _regroup_impacts(impacts: ImpactTable, n_obj: int):
    """(gain (O, R, K) per params caller, slot assignment) — impacts sorted by object,
    ranked within their object. Inactive impacts park in object n_obj (dropped)."""
    i = impacts.active.shape[0]
    obj = jnp.where(impacts.active, impacts.obj, n_obj)
    order = jnp.argsort(obj * (i + 1) + jnp.arange(i, dtype=jnp.int32))
    sorted_obj = obj[order]
    idx = jnp.arange(i, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones(1, bool), sorted_obj[1:] != sorted_obj[:-1]])
    group_start = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, idx, 0))
    rank = idx - group_start  # slot within the object
    return order, sorted_obj, rank


def _kernel(cr_ref, ci_ref, g_ref, gain_ref, force_ref, zr0_ref, zi0_ref,
            out_ref, zr_ref, zi_ref):
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        zr_ref[:] = zr0_ref[:]
        zi_ref[:] = zi0_ref[:]

    def body(s, _):
        zr = zr_ref[:]
        zi = zi_ref[:]
        # excite[o, k] = sum_r force[s, r, o] * gain[r, o, k]
        f = force_ref[s]  # (R, O)
        excite = (f[:, :, None] * gain_ref[:]).sum(axis=0)  # (O, K)
        new_re = zr * cr_ref[:] - zi * ci_ref[:] + excite
        new_im = zr * ci_ref[:] + zi * cr_ref[:]
        zr_ref[:] = new_re
        zi_ref[:] = new_im
        # Mosaic cannot store scalars to VMEM: store the per-mode partial mix row
        # (summed over objects); the final mode-axis reduce happens outside the kernel.
        out_ref[s, :] = (g_ref[:] * new_im).sum(axis=0)
        return jnp.int32(0)

    # Bounds and carry pinned to i32: under jax_enable_x64 the defaults are i64, which
    # Mosaic cannot legalize (the induction variable inherits the bound dtype).
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(out_ref.shape[0]), body, jnp.int32(0))


@partial(jax.jit, static_argnames=("num_samples",))
def render_block_impacts_pallas(
    params: BankParams,
    state: BankState,
    impacts: ImpactTable,
    num_samples: int,
    click_gain: float = 1.0,
):
    """Impact-only block render on the Pallas path. Returns (state, impacts, out)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_obj, n_modes = params.coeff_re.shape
    n_imp = impacts.active.shape[0]
    assert num_samples % CHUNK == 0, "num_samples must be a multiple of the kernel chunk"

    force_imp, prev_force = _impact_force_curves(impacts, num_samples)  # (I, S), (I,)
    force_with_prev = jnp.concatenate([prev_force[:, None], force_imp], axis=1)
    click = ((impacts.accel_amp * click_gain)[:, None] * jnp.diff(force_with_prev, axis=1)).sum(0)

    imp_obj_raw = jnp.where(impacts.active, impacts.obj, 0)
    imp_shapes = params.shapes[imp_obj_raw, jnp.where(impacts.active, impacts.expos, 0)]
    gain_imp = (imp_shapes * impacts.j[:, None, :]).sum(-1)
    gain_imp = jnp.where(impacts.active[:, None], gain_imp, 0.0)  # (I, K)

    order, sorted_obj, rank = _regroup_impacts(impacts, n_obj)
    # Scatter into factored (R, O, .) layout; overflow slots (rank >= R) are dropped —
    # the engine guarantees the cap before choosing this path.
    safe_obj = jnp.minimum(sorted_obj, n_obj - 1)
    keep = (sorted_obj < n_obj) & (rank < MAX_PER_OBJECT)
    safe_rank = jnp.minimum(rank, MAX_PER_OBJECT - 1)
    gain_ork = jnp.zeros((MAX_PER_OBJECT, n_obj, n_modes), jnp.float32)
    gain_sorted = gain_imp[order]
    gain_ork = gain_ork.at[safe_rank, safe_obj].add(
        jnp.where(keep[:, None], gain_sorted, 0.0)
    )
    force_sorted = force_imp[order]  # (I, S)
    force_sro = jnp.zeros((num_samples, MAX_PER_OBJECT, n_obj), jnp.float32)
    force_sro = force_sro.at[:, safe_rank, safe_obj].add(
        jnp.where(keep[None, :], force_sorted.T, 0.0)
    )

    g2d = params.out_gain[:, None] * jnp.ones((1, n_modes), jnp.float32)

    n_chunks = num_samples // CHUNK
    # The framework enables jax_enable_x64 globally (the solve path needs f64), but x64
    # tracing makes BlockSpec index maps emit i64 index arithmetic that Mosaic cannot
    # legalize — trace the kernel call with x64 off (all operands here are f32/i32).
    with jax.enable_x64(False):
        out, z_re, z_im = pl.pallas_call(
            _kernel,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((n_obj, n_modes), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_obj, n_modes), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_obj, n_modes), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (MAX_PER_OBJECT, n_obj, n_modes), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((CHUNK, MAX_PER_OBJECT, n_obj), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_obj, n_modes), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_obj, n_modes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((CHUNK, n_modes), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_obj, n_modes), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_obj, n_modes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((num_samples, n_modes), jnp.float32),
                jax.ShapeDtypeStruct((n_obj, n_modes), jnp.float32),
                jax.ShapeDtypeStruct((n_obj, n_modes), jnp.float32),
            ],
            # On non-TPU backends the kernel runs in the Pallas interpreter, which keeps the
            # CPU test substrate exercising the exact kernel logic.
            interpret=jax.default_backend() != "tpu",
        )(params.coeff_re, params.coeff_im, g2d, gain_ork, force_sro, state.z_re, state.z_im)

    out = out.sum(axis=1) + click

    new_age = impacts.age + num_samples
    imp_active = impacts.active & (new_age < impacts.total)
    impacts = ImpactTable(
        active=imp_active, obj=impacts.obj, expos=impacts.expos, j=impacts.j,
        pulse_step=impacts.pulse_step, gamma=impacts.gamma, accel_amp=impacts.accel_amp,
        age=new_age, total=impacts.total,
    )
    energy = jnp.sum(z_re * z_re + z_im * z_im, axis=1)
    has_excite = jax.ops.segment_sum(
        imp_active.astype(jnp.float32), imp_obj_raw, num_segments=n_obj
    )
    silent = (energy * params.out_gain**2 < SILENT_ENERGY) & (has_excite == 0)
    keep_mask = (~silent)[:, None].astype(jnp.float32)
    state = BankState(z_re=z_re * keep_mask, z_im=z_im * keep_mask)
    return state, impacts, out
