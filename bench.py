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


def _golden_render_rms(sample_rate):
    """RMS of one second rendered from a DETERMINISTIC synthetic modal bank: fixed
    freqs/T60s/shapes from a seeded rng, one strike per object. Independent of the
    eigensolver, so it pins the render semantics alone."""
    from mesheditor_tpu.api import make_synth
    from mesheditor_tpu.synth import ModalEvent
    from mesheditor_tpu.types import ModalModes

    rng = np.random.default_rng(20260820)
    k = 64
    freqs = np.linspace(120.0, 9000.0, k)
    t60s = np.linspace(1.2, 0.15, k)
    shapes = (rng.standard_normal((4, k, 3)) * 0.02).astype(np.float32)
    modes = ModalModes(freqs, t60s, shapes)
    synth = make_synth([modes] * 8, sample_rate=sample_rate)
    for o in range(8):
        synth.enqueue(ModalEvent(
            kind="impact", obj=o, expos=o % 4, j=(0.04, 0.03, 0.01),
            pulse_step=1.0 / 140.0, pulse_gamma=np.pi / 2 / 140.0, accel_amp=0.0005,
        ))
    out = np.asarray(synth.render_seconds(1.0, 512), np.float64)
    return float(np.sqrt((out ** 2).mean()))


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

    # Pallas-vs-scan render parity ON DEVICE (VERDICT r3 #6): the CI suite runs the
    # kernels interpreter-only (CPU backend), so a silent semantic change in the
    # compiled kernels would otherwise ship unnoticed. Render the same strike set
    # through both paths from identical state and compare.
    def render_one_path(result, use_pallas):
        synth = make_synth([result] * n_objects, sample_rate=sample_rate)
        synth.use_pallas = use_pallas
        for o in range(n_objects):
            synth.enqueue(
                ModalEvent(
                    kind="impact", obj=o, expos=o % max(result.modes.shapes.shape[0], 1),
                    j=(0.05, 0.02, 0.01), pulse_step=1.0 / 150.0,
                    pulse_gamma=np.pi / 2 / 150.0, accel_amp=0.001,
                )
            )
        out = synth.render(4096)
        if use_pallas is True and synth._pallas_ok is False:
            raise AssertionError("pallas path failed to execute on device")
        return np.asarray(out, np.float64)

    a_pallas = render_one_path(warm_result, True)
    a_scan = render_one_path(warm_result, False)
    peak = max(np.abs(a_scan).max(), 1e-30)
    pallas_parity = float(np.abs(a_pallas - a_scan).max() / peak)
    note(f"pallas parity (max err / peak over 4096 samples): {pallas_parity:.3e}")
    assert pallas_parity < 1e-3, f"pallas/scan divergence {pallas_parity:.3e}"

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
    # Pinned RMS golden for the RENDER, measured on a deterministic synthetic bank
    # (VERDICT r3 #6: the solve->render rms silently drifted 19x across rounds as
    # solver changes rotated degenerate mode shapes — it is solver-noise-sensitive by
    # nature, so the render pin must not route through the eigensolver). A drift
    # outside the band means the rendered SIGNAL changed — re-pin only with an
    # explanation of which render change moved it. The solve-path audio_rms is still
    # reported (informational) in the detail JSON.
    golden_rms = _golden_render_rms(sample_rate)
    rms_band = (8.82e-3, 9.10e-3)  # pinned r4: measured 8.9566e-3 on v5e (+-1.5%)
    assert rms_band[0] <= golden_rms <= rms_band[1], (
        f"golden render rms {golden_rms:.4e} outside pinned band {rms_band}"
    )
    note(f"golden render rms {golden_rms:.4e} within band {rms_band}")
    audio_rms = float(np.sqrt((audio.astype(np.float64) ** 2).mean()))

    # Production (CDT) pencil case — VERDICT r4 #2: the headline box is a
    # structured mesh; the product emits conforming-Delaunay meshes whose
    # irregular element sizes stress the preconditioner differently. Solve the
    # quickstart torus (CDT, default settings) warm and report it alongside.
    cdt = {}
    try:
        from mesheditor_tpu.mesh import torus_surface
        from mesheditor_tpu.mesh.cdt import generate_tets_delaunay, native_available

        if native_available():
            pts, tris = torus_surface(0.06, 0.025)
            h = float(np.max(pts.max(0) - pts.min(0))) / 24
            tmesh = generate_tets_delaunay(pts, tris, lattice_h=h)
            cfg_cdt = SolverConfig(num_modes=30, num_fem_modes=45)  # quickstart shape
            ex_cdt = tmesh.points[:: max(tmesh.points.shape[0] // 10, 1)][:10]
            note("cdt warmup solve (compiles)...")
            rw = mesh2modes(tmesh, CERAMIC.properties, ex_cdt, config=cfg_cdt)
            assert rw.modes.num_modes > 0, "cdt solve failed"
            note(f"cdt warmup ok: {rw.modes.num_modes} modes, "
                 f"{rw.profile.restarts} iters")
            t0 = time.perf_counter()
            rc = mesh2modes(tmesh, CERAMIC.properties, ex_cdt, config=cfg_cdt)
            cdt_s = time.perf_counter() - t0
            note(f"cdt timed solve {cdt_s:.2f}s")
            cdt = {
                "cdt_solve_s": round(cdt_s, 3),
                "cdt_dofs": rc.profile.dofs,
                "cdt_iterations": rc.profile.restarts,
                "cdt_modes": int(rc.modes.num_modes),
                "cdt_f1_hz": float(rc.modes.freqs[0]) if rc.modes.num_modes else 0.0,
            }
    except Exception as ex:  # the CDT case must never take down the headline
        cdt = {"cdt_error": str(ex)[:200]}

    detail = {
        "solve_s": round(solve_s, 3),
        "render_s": round(render_s, 3),
        "modes": int(result.modes.num_modes),
        "dofs": result.profile.dofs,
        "eig_iterations": result.profile.restarts,
        "f1_hz": float(result.modes.freqs[0]) if result.modes.num_modes else 0.0,
        "audio_rms": audio_rms,
        "golden_render_rms": golden_rms,
        "golden_rms_band": list(rms_band),
        "pallas_parity": pallas_parity,
        **cdt,
    }
    if report_json:
        import sys

        print(json.dumps(detail), file=sys.stderr)
        print(json.dumps(report))
    return report, detail


if __name__ == "__main__":
    run()
