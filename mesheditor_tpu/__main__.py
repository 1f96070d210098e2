"""Command-line surface: `python -m mesheditor_tpu <command>`.

The headless analog of the reference's CLI (main.cpp:1387-1433 — --headless/--render/
--screenshot modes): solve meshes to modal models, render strikes to wav, inspect models,
and run the benchmarks, without an interactive session.
"""

from __future__ import annotations

import argparse
import json
import sys


def cmd_solve(args):
    import numpy as np

    from .api import solve_surface
    from .io.model_store import save_modal_model
    from .materials import find_material
    from .mesh import load_obj, load_ply
    from .types import ModalSolveSettings

    mat = find_material(args.material)
    if mat is None:
        sys.exit(f"unknown material {args.material!r}")
    load = load_ply if args.mesh.endswith(".ply") else load_obj
    pts, tris = load(args.mesh)
    print(f"mesh: {pts.shape[0]} verts, {tris.shape[0]} tris; material {mat.name}")
    settings = ModalSolveSettings(
        num_modes=args.modes, num_vertices=args.vertices,
        solve_resolution=args.resolution, max_mode_freq=args.max_freq,
    )
    result = solve_surface(pts, tris, mat.properties, settings=settings,
                           tet_resolution=args.tet_resolution,
                           progress=lambda p: print(f"  progress {p:4.0%}", end="\r"))
    if result.modes.num_modes == 0:
        sys.exit(
            "solve produced no modes in the band — small stiff objects often ring above "
            f"--max-freq (currently {args.max_freq:.0f} Hz); try raising it"
        )
    path = save_modal_model(args.out_dir, result.modes, result.mass_props)
    prof = result.profile
    print(f"\nsolved {result.modes.num_modes} modes, f1 {result.modes.freqs[0]:.1f} Hz, "
          f"mass {result.mass_props.mass:.3f} kg")
    print(f"profile: assemble {prof.assemble:.2f}s iterate {prof.iterate:.2f}s "
          f"({prof.restarts} iterations, {prof.dofs} dofs)")
    print(f"model -> {path}")


def cmd_render(args):
    import numpy as np

    from .api import make_synth
    from .io import load_modal_model, write_wav

    modes, mass = load_modal_model(args.model)
    synth = make_synth([modes])
    rng = np.random.default_rng(args.seed)
    times = sorted(rng.uniform(0, max(args.seconds - 0.3, 0.01), args.strikes))
    block = 512
    total_blocks = int(np.ceil(args.seconds * 48000 / block))
    strike_blocks = {int(t * 48000 // block) for t in times}
    out = []
    for b in range(total_blocks):
        if b in strike_blocks or b == 0:
            expos = int(rng.integers(0, max(modes.shapes.shape[0], 1)))
            synth.strike(0, expos, rng.normal(0, 0.04, 3), 2e-3)
        out.append(np.asarray(synth.render(block)))
    audio = np.concatenate(out)
    peak = max(float(np.abs(audio).max()), 1e-9)
    write_wav(args.out, audio / peak * 0.9)
    print(f"rendered {args.seconds}s ({args.strikes} strikes) -> {args.out} (peak {peak:.4f})")


def cmd_simulate(args):
    import tempfile

    import numpy as np

    from .io import write_wav
    from .io.gltf import import_gltf
    from .scene.audio_sync import simulate_scene

    store = args.store or tempfile.mkdtemp(prefix="mesheditor_tpu_store_")
    reg = import_gltf(args.scene, store_dir=store)
    print(f"scene: {len(reg.entities())} entities; store {store}")
    frames = []
    on_frame = None
    if args.video:
        from .render import RenderSettings, render_scene
        from .render.camera import frame_points
        from .render.scene_render import flatten_scene

        # Frame the WORLD-space scene at t=0 with headroom for motion.
        reg.process()
        batch = flatten_scene(reg)
        cam = frame_points(batch.positions if batch.positions.size else np.zeros((1, 3)),
                           margin=2.2)
        settings = RenderSettings(width=args.video_width, height=args.video_height)

        def on_frame(r, i):
            frames.append(render_scene(r, camera=cam, settings=settings).image())

    audio = simulate_scene(
        reg, store, seconds=args.seconds, tet_resolution=args.tet_resolution,
        progress=lambda p: print(f"  solve progress {p:4.0%}", end="\r"),
        on_frame=on_frame, video_fps=args.video_fps,
    )
    peak = max(float(np.abs(audio).max()), 1e-9)
    write_wav(args.out, audio / peak * 0.9)
    print(f"simulated {args.seconds}s of physics audio -> {args.out} (peak {peak:.4f})")
    if args.video and frames:
        from .render.record import record

        p = record(args.video, frames, fps=args.video_fps)
        print(f"video: {len(frames)} frames -> {p}")


def cmd_info(args):
    from .io import load_modal_model

    modes, mass = load_modal_model(args.model)
    print(f"modes: {modes.num_modes}  sample points: {modes.shapes.shape[0]}")
    print(f"mass: {mass.mass:.4f} kg  fundamental: {modes.original_fundamental_freq:.1f} Hz")
    for k in range(min(modes.num_modes, 12)):
        print(f"  mode {k:2d}: {modes.freqs[k]:9.2f} Hz  T60 {modes.t60s[k]*1e3:8.1f} ms")


def cmd_bench(args):
    from bench import run  # repo-root bench

    run()


def cmd_warmup(args):
    """Prime the persistent XLA compile cache at the standard shape set, so a fresh
    process (the README quickstart, `solve`, `render`) starts warm instead of paying
    minutes of first-compiles through the TPU tunnel (VERDICT r4 #4a).

    Compilation is keyed on array SHAPES: this runs the exact default-settings
    pipeline — quickstart torus solve (default tet resolution), a default synth
    render at quickstart bank shapes, and the streaming block renderer — writing
    every compiled program into the on-disk cache (~/.cache/mesheditor_tpu_xla).
    Subsequent processes at the same shapes load instead of compiling."""
    import time

    t_all = time.perf_counter()
    jobs = []
    if args.set in ("quickstart", "all"):
        jobs.append(("quickstart torus solve + render", _warm_quickstart))
    if args.set in ("bench", "all"):
        jobs.append(("bench box solve + 64-object render", _warm_bench))
    for name, fn in jobs:
        t0 = time.perf_counter()
        print(f"warming {name}...", flush=True)
        fn()
        print(f"  {name}: {time.perf_counter() - t0:.1f}s", flush=True)
    print(f"warmup done in {time.perf_counter() - t_all:.1f}s — "
          "future processes at these shapes start warm")


def _warm_quickstart():
    import numpy as np

    from .api import make_synth, solve_surface, strike
    from .materials import CERAMIC
    from .mesh import torus_surface
    from .types import ModalSolveSettings

    pts, tris = torus_surface(0.06, 0.025)
    res = solve_surface(pts, tris, CERAMIC.properties,
                        settings=ModalSolveSettings(num_modes=30), verbose=True)
    synth = make_synth([res])
    strike(synth, 0, 0, res, direction=(0, 1, 0), impulse_mag=0.05)
    audio = synth.render_seconds(1.0)
    assert np.isfinite(np.asarray(audio)).all()


def _warm_bench():
    from bench import run

    run(report_json=False)


def cmd_edit(args):
    """Interactive viewer/editor (reference: the windowed app, main.cpp:847-1185).

    Defaults to the CPU backend: interactive frames are small and latency-bound, and
    the tunneled TPU pays seconds of device-init plus per-frame round-trips that a
    local session never amortizes (--tpu opts in for big scenes)."""
    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from .app import ViewerApp, serve

    registry = None
    if args.scene:
        if str(args.scene).endswith(".project"):
            from .io.project import load_project

            registry = load_project(args.scene)
        else:
            from .io.gltf import import_gltf

            registry = import_gltf(args.scene)
    app = ViewerApp(registry, width=args.width, height=args.height, audio=args.audio)
    serve(app, port=args.port)


def cmd_sessions(args):
    """Crash-recovery sessions: list restore dirs, replay one, or verify replay
    determinism (reference: File > Restore, main.cpp:928-938; self-test :409-423)."""
    from .scene.session import SessionStore, verify_replay

    store = SessionStore(args.root)
    if args.action == "list":
        sessions = store.list()
        if not sessions:
            print("no sessions")
            return
        for d in sessions:
            n_actions = sum(1 for line in open(d / "actions.log")) if (
                d / "actions.log").exists() else 0
            print(f"{d.name}: {n_actions} actions")
    elif args.action == "restore":
        import json as _json

        from .scene.components import Name
        from .scene.snapshot import snapshot_scene

        d = store.list()[-1] if args.session is None else store.root / args.session
        r = store.restore(d)
        names = [r.get(e, Name).value for e in r.entities() if r.has(e, Name)]
        print(f"restored {d.name}: {len(names)} named objects: {names[:16]}")
        if args.out:
            from .io.project import save_project

            save_project(args.out, r)
            print(f"saved {args.out}")
        fixture = verify_replay(r, d)
        print("replay self-test:", "byte-exact" if fixture is None else f"DIVERGED -> {fixture}")


def cmd_record(args):
    """Fixed-step turntable recording (the reference's --record capture,
    main.cpp CLI + VideoRecorder)."""
    import numpy as np

    from .render import RenderSettings
    from .render.camera import frame_points
    from .render.record import record, turntable_frames
    from .render.scene_render import render_scene

    settings = RenderSettings(width=args.width, height=args.height, mode=args.mode)
    path = args.scene
    if path.endswith((".gltf", ".glb")):
        from .io.gltf import import_gltf
        from .scene.components import MeshSurface

        r = import_gltf(path)
        pts = np.concatenate([
            np.asarray(s.positions) for _, s in r.view(MeshSurface)
        ]) if any(True for _ in r.view(MeshSurface)) else np.zeros((1, 3))

        def frames():
            for i in range(args.frames):
                az = -60.0 + 360.0 * i / args.frames
                cam = frame_points(pts, azimuth_deg=az)
                yield render_scene(r, camera=cam, settings=settings).image()

        out = record(args.out, frames(), fps=args.fps)
    else:
        from .mesh import load_obj, load_ply

        load = load_ply if path.endswith(".ply") else load_obj
        pts, tris = load(path)
        out = record(args.out, turntable_frames(pts, tris, n_frames=args.frames,
                                                settings=settings), fps=args.fps)
    print(f"wrote {out} ({args.frames} frames @ {args.fps} fps)")


def cmd_view(args):
    """Screenshot a scene/mesh through the TPU rasterizer (the reference's
    --screenshot/--headless render path, main.cpp:1387-1433)."""
    from .render import RenderSettings, render_mesh, render_scene, save_png
    from .render.camera import frame_points

    settings = RenderSettings(width=args.width, height=args.height, mode=args.mode,
                              supersample=args.supersample)
    path = args.scene
    if path.endswith((".gltf", ".glb")):
        from .io.gltf import import_gltf

        r = import_gltf(path)
        view = render_scene(r, settings=settings)
        img = view.image()
        n = len(view.batch.entities)
        print(f"scene: {n} mesh entities, {view.batch.triangles.shape[0]} triangles")
        if args.debug_physics:
            from .physics.scene_build import build_world
            from .render.debug_draw import draw_physics_debug

            world, _ = build_world(r)
            if world.bodies:
                img = draw_physics_debug(img, world, view.camera)
                print(f"debug overlay: {len(world.bodies)} collider wireframes")
    else:
        from .mesh import load_obj, load_ply

        load = load_ply if path.endswith(".ply") else load_obj
        pts, tris = load(path)
        cam = frame_points(pts, azimuth_deg=args.azimuth, elevation_deg=args.elevation)
        img = render_mesh(pts, tris, camera=cam, settings=settings)
        print(f"mesh: {pts.shape[0]} verts, {tris.shape[0]} tris")
    save_png(args.out, img)
    print(f"wrote {args.out} ({settings.width}x{settings.height}, {settings.mode})")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mesheditor_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("solve", help="mesh (obj/ply) -> content-addressed modal model")
    s.add_argument("mesh")
    s.add_argument("--material", default="Ceramic")
    s.add_argument("--modes", type=int, default=30)
    s.add_argument("--vertices", type=int, default=10)
    s.add_argument("--resolution", type=float, default=1.0)
    s.add_argument("--max-freq", type=float, default=16000.0)
    s.add_argument("--tet-resolution", type=int, default=24)
    s.add_argument("--out-dir", default="modal")
    s.set_defaults(fn=cmd_solve)

    r = sub.add_parser("render", help="modal model -> strike-rendered wav")
    r.add_argument("model")
    r.add_argument("--out", default="render.wav")
    r.add_argument("--seconds", type=float, default=2.0)
    r.add_argument("--strikes", type=int, default=4)
    r.add_argument("--seed", type=int, default=0)
    r.set_defaults(fn=cmd_render)

    sim = sub.add_parser("simulate", help="glTF scene -> physics-driven audio wav")
    sim.add_argument("scene", help=".gltf/.glb with KHR_physics/audio_rigid_bodies")
    sim.add_argument("--seconds", type=float, default=3.0)
    sim.add_argument("--out", default="simulation.wav")
    sim.add_argument("--store", default=None, help="modal model store dir")
    sim.add_argument("--tet-resolution", type=int, default=24)
    sim.add_argument("--video", default=None,
                     help="also record the simulation (gif/mp4/png path)")
    sim.add_argument("--video-fps", type=float, default=30.0)
    sim.add_argument("--video-width", type=int, default=480)
    sim.add_argument("--video-height", type=int, default=360)
    sim.set_defaults(fn=cmd_simulate)

    i = sub.add_parser("info", help="inspect a modal model file")
    i.add_argument("model")
    i.set_defaults(fn=cmd_info)

    b = sub.add_parser("bench", help="run the headline benchmark")
    b.set_defaults(fn=cmd_bench)

    wu = sub.add_parser("warmup",
                        help="prime the XLA compile cache at standard shapes")
    wu.add_argument("--set", default="quickstart",
                    choices=["quickstart", "bench", "all"],
                    help="which shape set to compile (default: quickstart)")
    wu.set_defaults(fn=cmd_warmup)

    ed = sub.add_parser("edit", help="interactive browser viewer/editor")
    ed.add_argument("scene", nargs="?", default=None, help="glTF/.project to open")
    ed.add_argument("--port", type=int, default=8731)
    ed.add_argument("--audio", action="store_true", help="solve modal models at load; strike mode plays audio")
    ed.add_argument("--width", type=int, default=960)
    ed.add_argument("--height", type=int, default=600)
    ed.add_argument("--tpu", action="store_true",
                    help="render frames on the TPU (default: CPU — lower latency)")
    ed.set_defaults(fn=cmd_edit)

    ses = sub.add_parser("sessions", help="list/restore crash-recovery sessions")
    ses.add_argument("action", choices=["list", "restore"])
    ses.add_argument("session", nargs="?", default=None,
                     help="session dir name (default: most recent)")
    ses.add_argument("--root", default=None, help="session root dir override")
    ses.add_argument("--out", default=None, help="save restored scene as .project")
    ses.set_defaults(fn=cmd_sessions)

    rec = sub.add_parser("record", help="turntable-record a mesh/scene to gif/mp4/png")
    rec.add_argument("scene", help=".obj/.ply/.gltf/.glb")
    rec.add_argument("--out", default="turntable.gif")
    rec.add_argument("--frames", type=int, default=36)
    rec.add_argument("--fps", type=float, default=12.0)
    rec.add_argument("--width", type=int, default=480)
    rec.add_argument("--height", type=int, default=360)
    rec.add_argument("--mode", default="smooth",
                     choices=["smooth", "flat", "wireframe", "wireframe_only"])
    rec.set_defaults(fn=cmd_record)

    v = sub.add_parser("view", help="screenshot a mesh/scene (obj/ply/gltf) to PNG")
    v.add_argument("scene")
    v.add_argument("--out", default="view.png")
    v.add_argument("--width", type=int, default=960)
    v.add_argument("--height", type=int, default=720)
    v.add_argument("--mode", default="smooth",
                   choices=["smooth", "flat", "wireframe", "wireframe_only"])
    v.add_argument("--supersample", type=int, default=2)
    v.add_argument("--azimuth", type=float, default=-60.0)
    v.add_argument("--elevation", type=float, default=25.0)
    v.add_argument("--debug-physics", action="store_true",
                   help="overlay collider wireframes (glTF scenes)")
    v.set_defaults(fn=cmd_view)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
