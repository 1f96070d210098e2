"""Host orchestration of the modal synth: events, voices, track pool, block streaming.

This is the TPU-native replacement for the reference's audio-thread machinery
(src/audio/ModalAudio.{h,cpp}): the SPSC event ring, RCU bank publication, triple-buffered
voice sets, and the render worker pool all dissolve into a single device-resident state
advanced block-by-block by `render_block`. What remains host-side is the same *protocol*:

- one-shot events (strike / silence) drain into the impact table between blocks;
- sustained voices are republished whole each frame — a voice missing from the newest set
  has ended; a publish gap past MAX_VOICE_IDLE_SECONDS silences the set (level-triggered
  semantics, reference: AdoptVoices, ModalAudio.cpp:105-144);
- surface tracks live in a content-keyed pool of 64 device rows; a slot is repointed only
  when no live voice reads it (reference: AdoptSurfaceTrack, ModalAudio.h:261-301).

Determinism: given the same sequence of events/publishes and block sizes, the output is
bit-identical; given different block sizes, it is exact for the voice path (see render.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..types import ModalModes
from .bank import (
    BankParams,
    BankState,
    ImpactTable,
    TrackPool,
    VoiceTable,
    apply_voice_state,
    build_bank,
)
from .render import render_block
from .tracks import RoughnessTrack, TRACK_SAMPLES

# A voice this long without a fresh contact report ends itself
# (reference: MaxVoiceIdleSeconds, ModalAudio.cpp:26).
MAX_VOICE_IDLE_SECONDS = 0.1


@dataclass
class ModalEvent:
    """One queued synthesis event (reference: ModalEvent, ModalAudio.h:61-70)."""

    kind: str  # "impact" | "silence"
    obj: int
    expos: int = 0
    j: tuple = (0.0, 0.0, 0.0)  # node-local impulse vector
    pulse_step: float = 0.0  # per-sample phase increment of the contact pulse
    pulse_gamma: float = 0.0  # contact pulse amplitude
    accel_amp: float = 0.0  # acceleration-noise click amplitude


@dataclass
class ContactTrackSpec:
    """One surface track a contact rides over (reference: ContactTrack, ModalAudio.h:33-40)."""

    index: int = -1  # pool slot, -1 unused
    rate: float = 0.0  # track samples advanced per output sample
    sigma: float = 0.0  # height scale, m
    window: float = 0.0  # contact-filter width, track samples
    step: float = 0.0  # surface distance per output sample, m


@dataclass
class SustainedVoice:
    """Published contact state (reference: SustainedState + VoiceSet::Voice,
    ModalAudio.h:42-59,120-129). `voice_id` carries carry-state across frames."""

    voice_id: int
    obj: int
    blend_points: tuple = (0, 0, 0)
    blend_weights: tuple = (1.0, 0.0, 0.0)
    normal: tuple = (0.0, 0.0, 0.0)
    slip_dir: tuple = (0.0, 0.0, 0.0)
    sweep_dir: tuple = ((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    normal_force: float = 0.0
    friction: float = 0.0
    stiffness: float = 0.0
    static_penetration: float = 0.0
    damping_coeff: float = 0.0
    tracks: tuple = ()  # up to 4 ContactTrackSpec


class ModalSynth:
    """All modal synthesis state, device-resident, advanced one block at a time."""

    def __init__(
        self,
        modes_list: Sequence[ModalModes],
        gains: Optional[Sequence[float]] = None,
        sample_rate: float = 48_000.0,
        max_impacts: int = 128,
        max_voices: int = 16,
        track_slots: int = 64,
    ):
        self.params, self.state = build_bank(modes_list, gains, sample_rate)
        self.sample_rate = float(sample_rate)
        self.max_impacts = max_impacts
        self.max_voices = max_voices
        self.impacts = ImpactTable.empty(max_impacts)
        self.voices = VoiceTable.empty(max_voices)
        self.pool = TrackPool.empty(track_slots, TRACK_SAMPLES)
        self._pool_keys: dict[int, int] = {}  # content key -> slot
        self._voice_ids: dict[int, int] = {}  # live voice id -> table row
        self._pending_events: list[ModalEvent] = []
        self._published: Optional[list[SustainedVoice]] = None
        self._publish_fresh = False
        self._idle_samples = 0
        # Live counters (reference: ActiveVoices/ActiveImpacts + drop counters,
        # ModalAudio.h:204-206).
        self.events_dropped = 0
        self.voices_refused = 0
        self.tracks_refused = 0
        self.click_gain = 1.0
        self.sustain_level = 1.0
        self.coupling = 1.0
        # Pallas fast path: "auto" tries the VMEM-resident impact kernel for voice-free
        # blocks and falls back to the scan on any failure; False disables it.
        self.use_pallas = "auto"
        self._pallas_ok: Optional[bool] = None
        self._max_impacts_per_object = 0
        # Host mirror of the voice STATE (packed upload layout, see bank.apply_voice_state);
        # carries live only on device.
        from .bank import VOICE_F32_COLS, VOICE_I32_COLS

        self._voice_f32 = np.zeros((max_voices, VOICE_F32_COLS), np.float32)
        self._voice_i32 = np.zeros((max_voices, VOICE_I32_COLS), np.int32)
        self._voice_i32[:, 4:8] = -1

    # ---- events (the SPSC ring analog) ----

    def enqueue(self, event: ModalEvent) -> None:
        self._pending_events.append(event)

    def strike(self, obj, expos, impulse, contact_time_s, accel_amp=0.0) -> None:
        """Queue a half-sine impact pulse of duration `contact_time_s` carrying `impulse`
        (node-local 3-vector). gamma = pi/2 * step normalizes the pulse to unit integral so
        the impulse magnitude rides in the gain rows (reference: TriggerModalStrike,
        AudioSystem.cpp:753-767)."""
        step = 1.0 / (contact_time_s * self.sample_rate)
        self.enqueue(
            ModalEvent(
                kind="impact",
                obj=obj,
                expos=expos,
                j=tuple(np.asarray(impulse, dtype=np.float64)),
                pulse_step=step,
                pulse_gamma=np.pi / 2 * step,
                accel_amp=accel_amp,
            )
        )

    def silence(self, obj: int) -> None:
        self.enqueue(ModalEvent(kind="silence", obj=obj))

    # ---- surface track pool ----

    def adopt_track(self, key: int, make) -> int:
        """The pool slot holding `key`'s track, or -1 when every slot is live. `make()`
        returns a RoughnessTrack; only unread slots are repointed."""
        if key in self._pool_keys:
            return self._pool_keys[key]
        n_slots = self.pool.heights.shape[0]
        free = [s for s in range(n_slots) if s not in self._pool_keys.values()]
        if free:
            slot = free[0]
        else:
            live = set()
            for v in self._voice_ids.values():
                live.update(int(i) for i in self._voice_i32[v, 4:8] if i >= 0)
            if self._published:
                for voice in self._published:
                    for t in voice.tracks:
                        if t.index >= 0:
                            live.add(t.index)
            reusable = [s for s in range(n_slots) if s not in live]
            if not reusable:
                self.tracks_refused += 1
                return -1
            slot = reusable[0]
            self._pool_keys = {k: s for k, s in self._pool_keys.items() if s != slot}
        track: RoughnessTrack = make()
        n = self.pool.heights.shape[1]
        h = np.zeros(n, np.float32)
        s = np.zeros(n + 1, np.float32)
        m = min(n, track.heights.shape[0])
        h[:m] = track.heights[:m]
        s[: m + 1] = track.sums[: m + 1]
        self.pool = TrackPool(
            heights=self.pool.heights.at[slot].set(jnp.asarray(h)),
            sums=self.pool.sums.at[slot].set(jnp.asarray(s)),
        )
        self._pool_keys[key] = slot
        return slot

    # ---- voices (the triple-buffered voice-set analog) ----

    def publish_voices(self, voices: Sequence[SustainedVoice]) -> None:
        """Publish this frame's whole sustained-contact set. A contact already open keeps
        its carried state; one the set omits ends; a new one opens."""
        self._published = list(voices)
        self._publish_fresh = True

    def _write_voice_row(self, row: int, s: SustainedVoice, reset: bool) -> None:
        """Write one voice's STATE into the host mirror (carries live only on device)."""
        f = self._voice_f32[row]
        i = self._voice_i32[row]
        f[0:3] = s.blend_weights
        f[3:6] = s.normal
        f[6:9] = s.slip_dir
        f[9:15] = np.asarray(s.sweep_dir, np.float32).reshape(6)
        f[15] = s.normal_force
        f[16] = s.friction
        f[17] = s.stiffness
        f[18] = s.static_penetration
        f[19] = s.damping_coeff
        tracks = list(s.tracks)[:4] + [ContactTrackSpec()] * max(0, 4 - len(s.tracks))
        f[20:24] = [t.rate for t in tracks]
        f[24:28] = [t.sigma for t in tracks]
        f[28:32] = [t.window for t in tracks]
        f[32:36] = [t.step for t in tracks]
        i[0] = s.obj
        i[1:4] = s.blend_points
        i[4:8] = [t.index for t in tracks]
        i[8] = 1
        if reset:
            i[9] = 1

    def _adopt_voices(self) -> None:
        """Reconcile the published set into the host voice-state mirror, then apply it to
        the device table with ONE packed upload (apply_voice_state) — per-row device
        updates cost a dispatch round trip each behind a tunnel."""
        published = self._published
        if self._publish_fresh:
            self._idle_samples = 0
            self._publish_fresh = False
        reporting = published is not None and self._idle_samples <= int(
            self.sample_rate * MAX_VOICE_IDLE_SECONDS
        )
        named = {v.voice_id for v in published} if (reporting and published) else set()
        dirty = False
        # End voices the newest set omits.
        for vid in list(self._voice_ids):
            if vid not in named:
                row = self._voice_ids.pop(vid)
                self._voice_f32[row] = 0.0
                self._voice_i32[row] = 0
                self._voice_i32[row, 4:8] = -1
                dirty = True
        if reporting and published:
            for voice in published:
                if voice.obj >= self.params.coeff_re.shape[0]:
                    continue
                if voice.voice_id in self._voice_ids:
                    row = self._voice_ids[voice.voice_id]
                    self._write_voice_row(row, voice, reset=False)
                else:
                    free = np.flatnonzero(self._voice_i32[:, 8] == 0)
                    if free.size == 0:
                        self.voices_refused += 1
                        continue
                    row = int(free[0])
                    self._voice_ids[voice.voice_id] = row
                    self._write_voice_row(row, voice, reset=True)
                dirty = True
        if dirty:
            # Upload COPIES: the transfer of a host buffer is asynchronous, so handing jax
            # the live mirror and then mutating it (the reset-consumed clear below, or the
            # next frame's publish) races the in-flight read and intermittently corrupts
            # the device table (observed: fresh voices opening without their quarter-cycle
            # track offsets whenever the dispatch queue was deep).
            self.voices = apply_voice_state(
                self.voices,
                jnp.asarray(self._voice_f32.copy()),
                jnp.asarray(self._voice_i32.copy()),
            )
            self._voice_i32[:, 9] = 0  # resets consumed

    def _drain_events(self) -> None:
        """Apply queued events to the impact table with ONE host->device transfer per
        field (the table mirrors to numpy, mutates there, re-uploads) — per-event device
        updates would pay a dispatch round trip each when the chip sits behind a tunnel."""
        if not self._pending_events:
            return
        imp = self.impacts
        host = {
            "active": np.asarray(imp.active).copy(),
            "obj": np.asarray(imp.obj).copy(),
            "expos": np.asarray(imp.expos).copy(),
            "j": np.asarray(imp.j).copy(),
            "pulse_step": np.asarray(imp.pulse_step).copy(),
            "gamma": np.asarray(imp.gamma).copy(),
            "accel_amp": np.asarray(imp.accel_amp).copy(),
            "age": np.asarray(imp.age).copy(),
            "total": np.asarray(imp.total).copy(),
        }
        silenced: list[int] = []
        for e in self._pending_events:
            if e.obj >= self.params.coeff_re.shape[0]:
                continue
            if e.kind == "impact" and e.pulse_step > 0:
                free = np.flatnonzero(~host["active"])
                if free.size == 0:
                    self.events_dropped += 1
                    continue
                i = int(free[0])
                host["active"][i] = True
                host["obj"][i] = e.obj
                host["expos"][i] = e.expos
                host["j"][i] = e.j
                host["pulse_step"][i] = e.pulse_step
                host["gamma"][i] = e.pulse_gamma
                host["accel_amp"][i] = e.accel_amp
                host["age"][i] = 0
                host["total"][i] = int(np.ceil(1.0 / e.pulse_step))
            elif e.kind == "silence":
                o = e.obj
                silenced.append(o)
                host["active"] &= host["obj"] != o
                for vid, row in list(self._voice_ids.items()):
                    if int(self._voice_i32[row, 0]) == o and self._voice_i32[row, 8]:
                        self._voice_f32[row] = 0.0
                        self._voice_i32[row] = 0
                        self._voice_i32[row, 4:8] = -1
                        del self._voice_ids[vid]
                        # Copies for the same async-transfer reason as _adopt_voices.
                        self.voices = apply_voice_state(
                            self.voices, jnp.asarray(self._voice_f32.copy()),
                            jnp.asarray(self._voice_i32.copy()))
        self._pending_events.clear()
        live = host["active"]
        self._max_impacts_per_object = int(
            np.bincount(host["obj"][live]).max() if live.any() else 0
        )
        self.impacts = ImpactTable(**{k: jnp.asarray(v) for k, v in host.items()})
        if silenced:
            mask = np.ones(self.params.coeff_re.shape[0], np.float32)
            mask[silenced] = 0.0
            m = jnp.asarray(mask)[:, None]
            self.state = BankState(z_re=self.state.z_re * m, z_im=self.state.z_im * m)

    # ---- block render ----

    def render(self, num_samples: int):
        """One block of mono modal synthesis. Returns the block as a device array — no
        host sync per block, so back-to-back blocks pipeline on the device (the analog of
        the reference's never-blocking audio callback); convert with np.asarray when the
        signal is needed host-side."""
        self._drain_events()
        self._adopt_voices()
        if self._pallas_candidate(num_samples):
            out = self._render_pallas(num_samples)
            if out is not None:
                self._idle_samples += num_samples
                return out
        self.state, self.impacts, self.voices, out = render_block(
            self.params,
            self.state,
            self.impacts,
            self.voices,
            self.pool,
            num_samples,
            self.click_gain,
            self.sustain_level,
            self.coupling,
        )
        self._idle_samples += num_samples
        return out

    def _pallas_candidate(self, num_samples: int) -> bool:
        import os

        import jax

        from .pallas_impact import CHUNK, MAX_PER_OBJECT

        on_tpu = jax.default_backend() == "tpu" or bool(
            os.environ.get("MESHEDITOR_TPU_FORCE_PALLAS")
        )
        return (
            self.use_pallas
            and on_tpu
            and self._pallas_ok is not False
            and self._max_impacts_per_object <= MAX_PER_OBJECT
            and num_samples % CHUNK == 0
        )

    def _render_pallas(self, num_samples: int):
        from .pallas_coupled import render_block_coupled_pallas
        from .pallas_impact import render_block_impacts_pallas

        try:
            if self._voice_ids:
                state, impacts, voices, out = render_block_coupled_pallas(
                    self.params, self.state, self.impacts, self.voices, self.pool,
                    num_samples, self.click_gain, self.sustain_level, self.coupling,
                )
            else:
                voices = None
                state, impacts, out = render_block_impacts_pallas(
                    self.params, self.state, self.impacts, num_samples, self.click_gain
                )
            if self._pallas_ok is None:
                np.asarray(out[:1])  # force compile+run once so failures surface here
                self._pallas_ok = True
        except Exception:  # noqa: BLE001 — any kernel/backend failure -> scan path
            self._pallas_ok = False
            return None
        self.state, self.impacts = state, impacts
        if voices is not None:
            self.voices = voices
        return out

    def render_seconds(self, seconds: float, block_size: int = 512,
                       fuse: bool = True) -> np.ndarray:
        """Render a stretch of audio. With no per-block host interaction (no publishes or
        events between blocks), the whole stretch fuses into large device calls — one
        dispatch instead of one per 512-sample block, which matters when the device sits
        behind a network tunnel. Carried state is identical either way (the exact
        block-boundary-invariance property)."""
        total = int(np.ceil(seconds * self.sample_rate / block_size)) * block_size
        if fuse:
            fused = 16384  # samples per device call
            chunks = []
            done = 0
            while done < total:
                n = min(fused, total - done)
                chunks.append(self.render(n))
                done += n
            return np.concatenate([np.asarray(c) for c in chunks])
        chunks = [self.render(block_size) for _ in range(total // block_size)]
        return np.concatenate([np.asarray(c) for c in chunks])

    @property
    def active_impacts(self) -> int:
        return int(np.asarray(self.impacts.active).sum())

    @property
    def active_voices(self) -> int:
        return len(self._voice_ids)

    def set_gain(self, obj: int, gain: float) -> None:
        self.params = BankParams(
            coeff_re=self.params.coeff_re,
            coeff_im=self.params.coeff_im,
            disp_scale=self.params.disp_scale,
            shapes=self.params.shapes,
            out_gain=self.params.out_gain.at[obj].set(gain),
            sample_rate=self.params.sample_rate,
        )

    def retune(self, obj: int, freqs, t60s) -> None:
        from .bank import tune_object

        self.params = tune_object(self.params, obj, freqs, t60s)

