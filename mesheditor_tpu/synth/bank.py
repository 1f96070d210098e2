"""The modal synthesis bank: struct-of-arrays over a padded (objects, modes) grid.

Each mode is a coupled-form (complex one-pole) resonator: z <- z*c + excitation, output
Im(z) (reference: src/audio/ModalAudio.h:82-116). Where the reference packs objects into
flat per-mode vectors with offsets and deals them across worker threads, the TPU bank is a
dense (O, K) grid — the whole scene advances in one fused kernel, and muted/padding modes
carry coefficient 0, which keeps them exactly inert (z_im stays 0, so they radiate and
couple nothing).

Impacts and sustained voices live in fixed-capacity tables (static shapes); inactive rows
are masked. All render-path dtypes are float32, except track positions (float64, as the
reference's SustainedCarry::Pos) and integer sample ages, which make every precomputed
signal an exact function of (carry, global sample index) — the block-boundary-invariance
property (reference test: tests/ModalRenderTest.cpp:260-269) holds by construction.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..types import ModalModes
from .tracks import TRACK_SAMPLES


def _register(cls, data_fields, meta_fields=()):
    jax.tree_util.register_dataclass(cls, data_fields=data_fields, meta_fields=meta_fields)
    return cls


@dataclass
class BankParams:
    """Per-(object, mode) resonator parameters and shapes. K and P are padded maxima."""

    coeff_re: jax.Array  # (O, K) f32; zero mutes the mode
    coeff_im: jax.Array  # (O, K)
    disp_scale: jax.Array  # (O, K) meters of displacement per unit state: 1/(2*pi*f)
    shapes: jax.Array  # (O, P, K, 3) mass-normalized mode shapes per sample point
    out_gain: jax.Array  # (O,)
    sample_rate: float  # static


_register(
    BankParams,
    data_fields=("coeff_re", "coeff_im", "disp_scale", "shapes", "out_gain"),
    meta_fields=("sample_rate",),
)


@dataclass
class BankState:
    z_re: jax.Array  # (O, K) f32
    z_im: jax.Array  # (O, K) f32


_register(BankState, data_fields=("z_re", "z_im"))


@dataclass
class ImpactTable:
    """In-flight contact pulses. Each generates a half-sine force curve
    force(age) = gamma * sin(pi * pulse_step * age) for integer age in [1, total]."""

    active: jax.Array  # (I,) bool
    obj: jax.Array  # (I,) i32
    expos: jax.Array  # (I,) i32 sample-point index
    j: jax.Array  # (I, 3) node-local impulse vector
    pulse_step: jax.Array  # (I,) per-sample phase increment
    gamma: jax.Array  # (I,) pulse amplitude
    accel_amp: jax.Array  # (I,) acceleration-noise click amplitude
    age: jax.Array  # (I,) i32 samples already rendered
    total: jax.Array  # (I,) i32 pulse length = ceil(1/pulse_step)

    @staticmethod
    def empty(capacity: int) -> "ImpactTable":
        z = jnp.zeros
        return ImpactTable(
            active=z(capacity, bool),
            obj=z(capacity, jnp.int32),
            expos=z(capacity, jnp.int32),
            j=z((capacity, 3), jnp.float32),
            pulse_step=z(capacity, jnp.float32),
            gamma=z(capacity, jnp.float32),
            accel_amp=z(capacity, jnp.float32),
            age=z(capacity, jnp.int32),
            total=z(capacity, jnp.int32),
        )


_register(
    ImpactTable,
    data_fields=(
        "active", "obj", "expos", "j", "pulse_step", "gamma", "accel_amp", "age", "total",
    ),
)

# A voice's four drive rows: normal, each surface's geometric tangential, frictional
# (reference: VoiceDrives, src/audio/ModalAudio.cpp:303).
VOICE_DRIVES = 4
VOICE_TRACKS = 4  # two surfaces x (finish, relief)


@dataclass
class VoiceTable:
    """Sustained contacts, each driving one object's modes and reading its deflection back.
    State rows (set on publish) + carry rows (advanced by the render kernel)."""

    active: jax.Array  # (V,) bool
    obj: jax.Array  # (V,) i32
    blend_pts: jax.Array  # (V, 3) i32 sample points the contact reads shapes from
    blend_w: jax.Array  # (V, 3) f32 barycentric weights
    normal: jax.Array  # (V, 3) node-local unit normal, into the object
    slip: jax.Array  # (V, 3) node-local unit slip direction (zero when nothing slides)
    sweep: jax.Array  # (V, 2, 3) per-surface geometric drive directions
    normal_force: jax.Array  # (V,) N, the load the excitation fluctuates about
    friction: jax.Array  # (V,)
    stiffness: jax.Array  # (V,) N/m^(3/2)
    static_pen: jax.Array  # (V,) m
    damping: jax.Array  # (V,) Hunt-Crossley c_d, s/m
    track_idx: jax.Array  # (V, 4) i32 pool slot, -1 for unused
    track_rate: jax.Array  # (V, 4) track samples per output sample
    track_sigma: jax.Array  # (V, 4) height scale, m
    track_window: jax.Array  # (V, 4) contact-filter width, track samples
    track_step: jax.Array  # (V, 4) surface distance per output sample, m
    # Carry (persists across blocks for a live voice id):
    pos_base: jax.Array  # (V, 4) f64 track position at age 0
    age: jax.Array  # (V,) i32 samples rendered since adoption/rebase
    prev_height: jax.Array  # (V, 4) f32
    relief_mean: jax.Array  # (V,) f32
    penetration: jax.Array  # (V,) f32
    primed: jax.Array  # (V,) bool

    @staticmethod
    def empty(capacity: int) -> "VoiceTable":
        z = jnp.zeros
        return VoiceTable(
            active=z(capacity, bool),
            obj=z(capacity, jnp.int32),
            blend_pts=z((capacity, 3), jnp.int32),
            blend_w=z((capacity, 3), jnp.float32),
            normal=z((capacity, 3), jnp.float32),
            slip=z((capacity, 3), jnp.float32),
            sweep=z((capacity, 2, 3), jnp.float32),
            normal_force=z(capacity, jnp.float32),
            friction=z(capacity, jnp.float32),
            stiffness=z(capacity, jnp.float32),
            static_pen=z(capacity, jnp.float32),
            damping=z(capacity, jnp.float32),
            track_idx=jnp.full((capacity, 4), -1, jnp.int32),
            track_rate=z((capacity, 4), jnp.float32),
            track_sigma=z((capacity, 4), jnp.float32),
            track_window=z((capacity, 4), jnp.float32),
            track_step=z((capacity, 4), jnp.float32),
            pos_base=z((capacity, 4), jnp.float64),
            age=z(capacity, jnp.int32),
            prev_height=z((capacity, 4), jnp.float32),
            relief_mean=z(capacity, jnp.float32),
            penetration=z(capacity, jnp.float32),
            primed=z(capacity, bool),
        )


_register(
    VoiceTable,
    data_fields=(
        "active", "obj", "blend_pts", "blend_w", "normal", "slip", "sweep",
        "normal_force", "friction", "stiffness", "static_pen", "damping",
        "track_idx", "track_rate", "track_sigma", "track_window", "track_step",
        "pos_base", "age", "prev_height", "relief_mean", "penetration", "primed",
    ),
)


@dataclass
class TrackPool:
    """Device-resident surface tracks, one row per pool slot (reference keeps 64 slots,
    ModalAudio.h:220-225). Row 0..T-1; a voice's track_idx of -1 reads height 0."""

    heights: jax.Array  # (T, N) f32, zero-mean unit-RMS
    sums: jax.Array  # (T, N + 1) f32 running integrals

    @staticmethod
    def empty(slots: int = 64, samples: int = TRACK_SAMPLES) -> "TrackPool":
        return TrackPool(
            heights=jnp.zeros((slots, samples), jnp.float32),
            sums=jnp.zeros((slots, samples + 1), jnp.float32),
        )


_register(TrackPool, data_fields=("heights", "sums"))


# Packed voice-state upload layout (engine -> device, two buffers per dirty block instead
# of hundreds of per-field row updates, which cost a dispatch round trip each):
# f32 (V, 36): blend_w 0:3 | normal 3:6 | slip 6:9 | sweep 9:15 | normal_force 15 |
#   friction 16 | stiffness 17 | static_pen 18 | damping 19 | track_rate 20:24 |
#   track_sigma 24:28 | track_window 28:32 | track_step 32:36
# i32 (V, 10): obj 0 | blend_pts 1:4 | track_idx 4:8 | active 8 | reset 9
VOICE_F32_COLS = 36
VOICE_I32_COLS = 10


@jax.jit
def apply_voice_state(voices: "VoiceTable", f32buf: jax.Array, i32buf: jax.Array) -> "VoiceTable":
    """Write the published per-voice STATE into the device table and reset the carries of
    freshly opened rows (reset column). Carries of persisting voices are untouched — they
    only ever live on device (the reference's SustainedCarry analog)."""
    f = f32buf.astype(jnp.float32)
    i = i32buf.astype(jnp.int32)
    reset = (i[:, 9] != 0)[:, None]
    n_track = voices.pos_base.shape[1]
    # Fresh tracks of one contact start a quarter-cycle apart (reference: StepVoice
    # priming, ModalAudio.cpp:243-247).
    offsets = jnp.arange(n_track, dtype=jnp.float64)[None, :] * (
        float(TRACK_SAMPLES) / n_track
    )
    return VoiceTable(
        active=i[:, 8] != 0,
        obj=i[:, 0],
        blend_pts=i[:, 1:4],
        blend_w=f[:, 0:3],
        normal=f[:, 3:6],
        slip=f[:, 6:9],
        sweep=f[:, 9:15].reshape(-1, 2, 3),
        normal_force=f[:, 15],
        friction=f[:, 16],
        stiffness=f[:, 17],
        static_pen=f[:, 18],
        damping=f[:, 19],
        track_idx=i[:, 4:8],
        track_rate=f[:, 20:24],
        track_sigma=f[:, 24:28],
        track_window=f[:, 28:32],
        track_step=f[:, 32:36],
        pos_base=jnp.where(reset, offsets, voices.pos_base),
        age=jnp.where(reset[:, 0], 0, voices.age),
        prev_height=jnp.where(reset, 0.0, voices.prev_height),
        relief_mean=jnp.where(reset[:, 0], 0.0, voices.relief_mean),
        penetration=jnp.where(reset[:, 0], 0.0, voices.penetration),
        primed=jnp.where(reset[:, 0], False, voices.primed),
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def tune_coeffs(freqs: np.ndarray, t60s: np.ndarray, sample_rate: float):
    """Resonator coefficients from per-mode frequencies (Hz) and T60s (s). Out-of-range and
    undamped modes are muted (coefficient zero). decay = 0.001^(1/(t60*sr));
    c = decay * exp(i*2*pi*f/sr); displacement scale = 1/(2*pi*f)
    (reference: TuneModalObject, src/audio/ModalAudio.cpp:647-674)."""
    freqs = np.asarray(freqs, dtype=np.float64)
    t60s = np.asarray(t60s, dtype=np.float64)
    ok = (
        np.isfinite(freqs)
        & np.isfinite(t60s)
        & (freqs > 0)
        & (freqs < sample_rate / 2 - 1)
        & (t60s > 0)
    )
    safe_f = np.where(ok, freqs, 1.0)
    safe_t = np.where(ok, t60s, 1.0)
    decay = np.power(1e-3, 1.0 / (safe_t * sample_rate))
    omega = 2 * np.pi * safe_f / sample_rate
    c_re = np.where(ok, decay * np.cos(omega), 0.0).astype(np.float32)
    c_im = np.where(ok, decay * np.sin(omega), 0.0).astype(np.float32)
    disp = np.where(ok, 1.0 / (2 * np.pi * safe_f), 0.0).astype(np.float32)
    return c_re, c_im, disp


def build_bank(
    modes_list: Sequence[ModalModes],
    gains: Sequence[float] | None = None,
    sample_rate: float = 48_000.0,
    mode_pad: int = 8,
    point_pad: int = 1,
) -> tuple[BankParams, BankState]:
    """Pack a list of modal models into the padded (O, K) bank. K pads to a multiple of
    `mode_pad` (lane alignment); P to the max sample-point count."""
    n_obj = len(modes_list)
    max_k = _round_up(max((m.num_modes for m in modes_list), default=1) or 1, mode_pad)
    max_p = _round_up(max((m.shapes.shape[0] for m in modes_list), default=1) or 1, point_pad)

    # Deduplicate identical models (by object identity): scenes routinely instance one
    # solved model across many entities (the reference shares ModalModes components the
    # same way, AddModalObject ModalAudio.cpp:621-645), and the packed host build +
    # host->device upload of the (O, P, K, 3) shapes array is O(n_obj) in both bytes
    # and tunnel latency — the measured wall-clock dominant term of synth construction
    # at 64 instances (~2.4 s vs ~0.3 s for the render itself on a v5e behind the axon
    # tunnel). Unique models upload once; the per-object bank expands by a device-side
    # take along the object axis.
    # Dedup key: a cheap content fingerprint, not id() (ADVICE r4) — equal-content but
    # distinct ModalModes objects (each entity loading its own copy from the
    # content-addressed model store) must still share one upload. Hashing the freqs
    # bytes + array shapes is O(num_modes) per model (cheap next to the packed build)
    # and collision-safe enough: a false merge needs byte-identical frequency arrays
    # AND equal shapes/t60s array dims with different contents — t60s/shapes bytes are
    # folded in too, so merge means full content equality.
    def _fingerprint(m: ModalModes):
        return (
            m.num_modes,
            m.shapes.shape,
            hash(np.ascontiguousarray(m.freqs).tobytes()),
            hash(np.ascontiguousarray(m.t60s).tobytes()),
            hash(np.ascontiguousarray(m.shapes).tobytes()),
        )

    uniq_ids: dict[tuple, int] = {}
    obj_to_uniq = np.zeros(n_obj, np.int32)
    uniq_models = []
    for o, m in enumerate(modes_list):
        key = _fingerprint(m)
        u = uniq_ids.get(key)
        if u is None:
            u = uniq_ids[key] = len(uniq_models)
            uniq_models.append(m)
        obj_to_uniq[o] = u

    n_uniq = len(uniq_models)
    coeff_re = np.zeros((n_uniq, max_k), np.float32)
    coeff_im = np.zeros((n_uniq, max_k), np.float32)
    disp = np.zeros((n_uniq, max_k), np.float32)
    shapes = np.zeros((n_uniq, max_p, max_k, 3), np.float32)
    for u, m in enumerate(uniq_models):
        k = m.num_modes
        if k:
            cr, ci, ds = tune_coeffs(m.freqs, m.t60s, sample_rate)
            coeff_re[u, :k] = cr
            coeff_im[u, :k] = ci
            disp[u, :k] = ds
            p = m.shapes.shape[0]
            shapes[u, :p, :k, :] = m.shapes

    # Unity mix when no gains are given — a zero default renders silence with no
    # hint of why (api.make_synth passes the reference's mass-normalized gains).
    out_gain = np.ones(n_obj, np.float32)
    if gains is not None:
        out_gain[:] = np.asarray(gains, np.float32)

    sel = jnp.asarray(obj_to_uniq)
    params = BankParams(
        coeff_re=jnp.asarray(coeff_re)[sel],
        coeff_im=jnp.asarray(coeff_im)[sel],
        disp_scale=jnp.asarray(disp)[sel],
        shapes=jnp.asarray(shapes)[sel],
        out_gain=jnp.asarray(out_gain),
        sample_rate=float(sample_rate),
    )
    state = BankState(
        z_re=jnp.zeros((n_obj, max_k), jnp.float32),
        z_im=jnp.zeros((n_obj, max_k), jnp.float32),
    )
    return params, state


def tune_object(
    params: BankParams, o: int, freqs: np.ndarray, t60s: np.ndarray
) -> BankParams:
    """Retune one object's coefficients in place (functionally). Out-of-range modes mute."""
    k = min(len(freqs), params.coeff_re.shape[1])
    cr, ci, ds = tune_coeffs(np.asarray(freqs)[:k], np.asarray(t60s)[:k], params.sample_rate)
    pad = params.coeff_re.shape[1] - k
    cr = np.pad(cr, (0, pad))
    ci = np.pad(ci, (0, pad))
    ds = np.pad(ds, (0, pad))
    return BankParams(
        coeff_re=params.coeff_re.at[o].set(jnp.asarray(cr)),
        coeff_im=params.coeff_im.at[o].set(jnp.asarray(ci)),
        disp_scale=params.disp_scale.at[o].set(jnp.asarray(ds)),
        shapes=params.shapes,
        out_gain=params.out_gain,
        sample_rate=params.sample_rate,
    )
