"""Render benchmark: us/block and realtime-x against the 512-sample @ 48 kHz deadline.

The TPU analog of the reference's ModalRenderBench (tests/ModalRenderBench.cpp:165-205):
cases sweep modes x voices x objects x impacts; each reports steady-state microseconds per
512-sample block and the realtime factor against the 10667 us deadline. A fused variant
(16384-sample calls) shows the streaming-pipeline headroom when no per-block host
interaction is needed.

Usage: python scripts/render_bench.py [--fused] [--blocks N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu.synth import ContactTrackSpec, ModalSynth, ModalEvent, SustainedVoice
from mesheditor_tpu.synth.tracks import synthesize_roughness
from mesheditor_tpu.types import ModalModes

SR = 48_000.0
BLOCK = 512
DEADLINE_US = BLOCK / SR * 1e6


def make_modes(k: int) -> ModalModes:
    rng = np.random.default_rng(7)
    freqs = np.linspace(60, 12000, k)
    return ModalModes(
        freqs=freqs,
        t60s=2.0 / np.arange(1, k + 1) ** 0.5,
        shapes=(rng.standard_normal((4, k, 3)) * 0.01).astype(np.float32),
        positions=np.zeros((4, 3), np.float32),
    )


def case(n_objects, n_modes, n_voices, n_impacts, blocks, fused):
    synth = ModalSynth([make_modes(n_modes)] * n_objects, gains=[1.0] * n_objects,
                       max_impacts=max(n_impacts, 8), max_voices=max(n_voices, 1))
    slot = synth.adopt_track(1, lambda: synthesize_roughness(1e-4, -2.0, 1e-6))
    for i in range(n_impacts):
        synth.enqueue(ModalEvent("impact", obj=i % n_objects, expos=0, j=(0.05, 0.02, 0),
                                 pulse_step=1 / 2000.0, pulse_gamma=np.pi / 2 / 2000.0))
    voices = [
        SustainedVoice(
            voice_id=v + 1, obj=v % n_objects, blend_points=(0, 1, 2),
            blend_weights=(0.5, 0.3, 0.2), normal=(0, 1, 0), slip_dir=(1, 0, 0),
            sweep_dir=((1, 0, 0), (0, 0, -1)), normal_force=4.0, friction=0.4,
            stiffness=2.0**28, static_penetration=2.0**-20, damping_coeff=0.3,
            tracks=tuple(ContactTrackSpec(slot, 0.4, 2e-7, 8.0, 4e-7) for _ in range(4)),
        )
        for v in range(n_voices)
    ]
    # Voice cases must stream block-wise (the frame loop republishes each block and the
    # idle timeout would end a voice inside a long fused call), so fusing only applies to
    # impact-only scenes. Warm at the exact timed call size so compiles stay out of the
    # measurement (the ModalRenderBench steady-state discipline).
    fused = fused and not voices
    n = blocks * BLOCK
    if fused:
        np.asarray(synth.render(n))  # warm at size
        for i in range(n_impacts):
            synth.enqueue(ModalEvent("impact", obj=i % n_objects, expos=0, j=(0.05, 0.02, 0),
                                     pulse_step=1 / 2000.0, pulse_gamma=np.pi / 2 / 2000.0))
        t0 = time.perf_counter()
        np.asarray(synth.render(n))
        wall = time.perf_counter() - t0
    else:
        if voices:
            synth.publish_voices(voices)
        np.asarray(synth.render(BLOCK))  # warm at size
        t0 = time.perf_counter()
        outs = []
        for _ in range(blocks):
            if voices:
                synth.publish_voices(voices)
            outs.append(synth.render(BLOCK))
        np.asarray(outs[-1])
        wall = time.perf_counter() - t0
    us_per_block = wall / blocks * 1e6
    return us_per_block, DEADLINE_US / us_per_block


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--blocks", type=int, default=64)
    args = ap.parse_args()
    cases = [
        # (objects, modes, voices, impacts) — the FULL reference envelope
        # (/root/reference/tests/ModalRenderBench.cpp:165-196), including the
        # voice-heavy tail: 256 voices on one object (the coupled kernel's own
        # scaling) and 256 objects x 1 voice (the shape a scene actually has).
        (1, 64, 0, 1),
        (1, 64, 1, 1),
        (1, 64, 4, 0),
        (1, 200, 0, 1),
        (1, 200, 0, 4),
        (1, 200, 1, 1),
        (1, 200, 4, 0),
        (1, 512, 0, 4),
        (1, 512, 1, 0),
        (1, 512, 4, 0),
        (1, 200, 16, 0),
        (1, 200, 64, 0),
        (1, 200, 256, 0),
        (16, 200, 16, 0),
        (64, 200, 64, 0),
        (256, 200, 256, 0),
        (64, 200, 0, 64),
        (256, 200, 0, 256),
        (256, 200, 16, 0),   # 256 objects, 16 ringing with voices
        (256, 64, 16, 64),
        (1024, 64, 0, 16),   # 1024 objects, 16 ringing
    ]
    print(f"{'objects':>8} {'modes':>6} {'voices':>7} {'impacts':>8} {'us/block':>10} {'realtime x':>11}")
    for o, k, v, i in cases:
        us, rx = case(o, k, v, i, args.blocks, args.fused)
        print(f"{o:>8} {k:>6} {v:>7} {i:>8} {us:>10.1f} {rx:>11.2f}")


if __name__ == "__main__":
    main()
