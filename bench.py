"""Headline benchmark (BASELINE.json): eigensolve of a 10k-tet mesh to 256 modes plus one
second of polyphonic modal render for 64 objects, measured against real time on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where value is the
realtime factor (audio seconds rendered per wall second of solve + render; target >= 1.0).
A full warmup pass first so compile time (cached thereafter) is excluded, as the render
bench discipline of the reference does (tests/ModalRenderBench.cpp:199-205 reports steady
-state us/block against the 512 @ 48 kHz deadline).
"""

import json
import time

import numpy as np


def run(report_json=True):
    import mesheditor_tpu  # noqa: F401
    from mesheditor_tpu import SolverConfig, mesh2modes
    from mesheditor_tpu.api import make_synth
    from mesheditor_tpu.materials import CERAMIC
    from mesheditor_tpu.mesh import box_tets
    from mesheditor_tpu.synth import ModalEvent

    sample_rate = 48_000.0
    block = 512
    seconds = 1.0
    n_objects = 64

    # ~10k tets: 18*10*9 cells * 6 = 9720. Eigenvalue-settling tolerance 1e-6 (relative
    # lambda change) puts frequencies at ~5e-7 relative — 2000x inside the 0.1% parity
    # gate — without paying iterations to chase Rayleigh-Ritz noise on degenerate pairs.
    mesh = box_tets((0.3, 0.16, 0.15), (18, 10, 9))
    cfg = SolverConfig(num_modes=256, num_fem_modes=256, max_mode_freq=48_000.0,
                       tolerance=1e-6)
    excite = mesh.points[:: max(mesh.points.shape[0] // 10, 1)][:10]

    def solve():
        return mesh2modes(mesh, CERAMIC.properties, excite, config=cfg)

    def build_and_render(result):
        synth = make_synth([result] * n_objects, sample_rate=sample_rate)
        for o in range(n_objects):
            synth.enqueue(
                ModalEvent(
                    kind="impact", obj=o, expos=o % max(result.modes.shapes.shape[0], 1),
                    j=(0.05, 0.02, 0.01), pulse_step=1.0 / 150.0,
                    pulse_gamma=np.pi / 2 / 150.0, accel_amp=0.001,
                )
            )
        # Fused multi-block render: the production streaming path is block-by-block; with
        # no inter-block host interaction the engine fuses device calls (state-identical).
        return synth.render_seconds(seconds, block)

    import sys

    def note(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    # Warmup: compile every kernel at the benchmark shapes.
    note("warmup solve (compiles)...")
    warm_result = solve()
    assert warm_result.modes.num_modes > 0, "solve failed"
    note(
        f"warmup solve ok: {warm_result.modes.num_modes} modes, "
        f"{warm_result.profile.restarts} iters, iterate {warm_result.profile.iterate:.1f}s"
    )
    warm_audio = build_and_render(warm_result)
    assert np.isfinite(warm_audio).all() and np.abs(warm_audio).max() > 0, "render failed"
    note("warmup render ok; timing...")

    t0 = time.perf_counter()
    result = solve()
    solve_s = time.perf_counter() - t0
    note(f"timed solve {solve_s:.2f}s")

    t0 = time.perf_counter()
    audio = build_and_render(result)
    render_s = time.perf_counter() - t0
    note(f"timed render {render_s:.2f}s")

    total = solve_s + render_s
    realtime_x = seconds / total
    report = {
        "metric": "eigensolve_10ktet_256modes_plus_render_64obj_1s",
        "value": round(realtime_x, 4),
        "unit": "x_realtime",
        "vs_baseline": round(realtime_x / 1.0, 4),
    }
    detail = {
        "solve_s": round(solve_s, 3),
        "render_s": round(render_s, 3),
        "modes": int(result.modes.num_modes),
        "dofs": result.profile.dofs,
        "eig_iterations": result.profile.restarts,
        "f1_hz": float(result.modes.freqs[0]) if result.modes.num_modes else 0.0,
        "audio_rms": float(np.sqrt((audio.astype(np.float64) ** 2).mean())),
    }
    if report_json:
        import sys

        print(json.dumps(detail), file=sys.stderr)
        print(json.dumps(report))
    return report, detail


if __name__ == "__main__":
    run()
