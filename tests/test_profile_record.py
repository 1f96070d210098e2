"""Profiler scopes/report (reference: profile::, src/render/Profile.h:8-45) and
headless recording (reference: VideoRecorder + fixed-step capture, README.md:163-197)."""

import numpy as np

from mesheditor_tpu import profile


class TestProfile:
    def setup_method(self):
        profile.reset()
        profile.enabled = True

    def teardown_method(self):
        profile.enabled = False
        profile.reset()

    def test_nested_scopes_aggregate(self):
        for _ in range(3):
            with profile.scope("outer"):
                with profile.scope("inner"):
                    pass
        t = profile.totals()
        assert t["outer"][0] == 3
        assert t["outer/inner"][0] == 3
        assert t["outer"][1] >= t["outer/inner"][1]

    def test_disabled_scopes_record_nothing(self):
        profile.enabled = False
        with profile.scope("ghost"):
            pass
        assert "ghost" not in profile.totals()

    def test_report_renders(self):
        with profile.scope("stage_a"):
            with profile.scope("sub"):
                pass
        with profile.scope("stage_b"):
            pass
        r = profile.report()
        assert "stage_a" in r and "sub" in r and "stage_b" in r

    def test_solve_pipeline_fills_scopes(self):
        from mesheditor_tpu.api import solve_surface
        from mesheditor_tpu.materials import CERAMIC
        from mesheditor_tpu.mesh import icosphere_surface
        from mesheditor_tpu.types import ModalSolveSettings

        pos, tris = icosphere_surface(1)
        solve_surface(pos * 0.1, tris, CERAMIC.properties,
                      settings=ModalSolveSettings(num_modes=6, num_vertices=4,
                                                  max_mode_freq=96000.0),
                      tet_resolution=8)
        t = profile.totals()
        assert "solve/tetrahedralize" in t
        assert "solve/mesh2modes" in t

    def test_render_fills_scopes(self):
        from mesheditor_tpu.mesh import cuboid_surface
        from mesheditor_tpu.render import RenderSettings, render_mesh

        pos, tris = cuboid_surface((0.5, 0.5, 0.5))
        render_mesh(pos, tris, settings=RenderSettings(16, 16))
        # render_mesh goes through rasterize/shade directly (no SceneRenderer), so
        # drive the scene path too.
        from mesheditor_tpu.render import render_scene
        from mesheditor_tpu.scene.components import MeshSurface
        from mesheditor_tpu.scene.derive import install_default_pipeline
        from mesheditor_tpu.scene.registry import Registry

        r = Registry()
        install_default_pipeline(r)
        e = r.create()
        r.emplace(e, MeshSurface(positions=pos, triangles=np.asarray(tris, np.uint32)))
        render_scene(r, settings=RenderSettings(16, 16)).image()
        t = profile.totals()
        assert "render/rasterize" in t and "render/shade" in t


class TestRecord:
    def _frames(self, n=4):
        rng = np.random.default_rng(0)
        return [rng.random((16, 24, 3)) for _ in range(n)]

    def test_gif_roundtrip(self, tmp_path):
        from mesheditor_tpu.render.record import record

        p = record(tmp_path / "clip.gif", self._frames(), fps=10)
        assert p.suffix == ".gif" and p.stat().st_size > 0

    def test_png_sequence(self, tmp_path):
        from mesheditor_tpu.render.record import write_frames

        paths = write_frames(tmp_path / "frame.png", self._frames(3))
        assert len(paths) == 3 and all(p.exists() for p in paths)

    def test_mp4_falls_back_without_ffmpeg(self, tmp_path):
        from mesheditor_tpu.render.record import record

        p = record(tmp_path / "clip.mp4", self._frames(), fps=10)
        assert p.exists()  # .mp4 with ffmpeg, .gif fallback without

    def test_turntable_deterministic(self, tmp_path):
        from mesheditor_tpu.mesh import cuboid_surface
        from mesheditor_tpu.render import RenderSettings
        from mesheditor_tpu.render.record import turntable_frames

        pos, tris = cuboid_surface((0.5, 0.3, 0.4))
        s = RenderSettings(width=32, height=24)
        a = list(turntable_frames(pos, tris, n_frames=4, settings=s))
        b = list(turntable_frames(pos, tris, n_frames=4, settings=s))
        assert len(a) == 4
        for fa, fb in zip(a, b):
            assert np.array_equal(fa, fb)
        # Distinct azimuths produce distinct frames.
        assert not np.array_equal(a[0], a[2])

    def test_animation_playback_renders(self):
        from mesheditor_tpu.mesh import cuboid_surface
        from mesheditor_tpu.render import RenderSettings
        from mesheditor_tpu.render.record import animation_frames
        from mesheditor_tpu.scene.animation import (
            AnimationChannel, AnimationClip, Interpolation, TargetPath,
        )
        from mesheditor_tpu.scene.components import MeshSurface, Transform
        from mesheditor_tpu.scene.derive import install_default_pipeline
        from mesheditor_tpu.scene.registry import Registry

        r = Registry()
        install_default_pipeline(r)
        e = r.create()
        pos, tris = cuboid_surface((0.5, 0.5, 0.5))
        r.emplace(e, MeshSurface(positions=pos, triangles=np.asarray(tris, np.uint32)))
        r.emplace(e, Transform())
        clip = AnimationClip("spin", [AnimationChannel(
            entity=e, path=TargetPath.TRANSLATION,
            times=np.array([0.0, 1.0]),
            values=np.array([[0.0, 0, 0], [1.0, 0, 0]]),
            interpolation=Interpolation.LINEAR,
        )])
        frames = list(animation_frames(r, clip, fps=4, seconds=1.0,
                                       settings=RenderSettings(24, 16)))
        assert len(frames) == 4
        assert not np.array_equal(frames[0], frames[-1])  # the cube moved

    def test_motion_blur_accumulates_substeps(self):
        from mesheditor_tpu.mesh import cuboid_surface
        from mesheditor_tpu.render import RenderSettings
        from mesheditor_tpu.render.record import animation_frames
        from mesheditor_tpu.scene.animation import (
            AnimationChannel, AnimationClip, Interpolation, TargetPath,
        )
        from mesheditor_tpu.scene.components import MeshSurface, Transform
        from mesheditor_tpu.scene.derive import install_default_pipeline
        from mesheditor_tpu.scene.registry import Registry
        from mesheditor_tpu.render.camera import Camera

        def scene():
            r = Registry()
            install_default_pipeline(r)
            e = r.create()
            pos, tris = cuboid_surface((0.2, 0.2, 0.2))
            r.emplace(e, MeshSurface(positions=pos,
                                     triangles=np.asarray(tris, np.uint32)))
            r.emplace(e, Transform())
            clip = AnimationClip("slide", [AnimationChannel(
                entity=e, path=TargetPath.TRANSLATION,
                times=np.array([0.0, 1.0]),
                values=np.array([[-1.0, 0, 0], [1.0, 0, 0]]),
                interpolation=Interpolation.LINEAR,
            )])
            return r, clip

        cam = Camera(eye=np.array([0.0, 0.0, 4.0]), near=0.1, far=50.0)
        s = RenderSettings(64, 40)
        r1, c1 = scene()
        sharp = list(animation_frames(r1, c1, camera=cam, fps=2, seconds=1.0,
                                      settings=s))[1]
        r2, c2 = scene()
        blurred = list(animation_frames(r2, c2, camera=cam, fps=2, seconds=1.0,
                                        settings=s, motion_blur_steps=4))[1]
        bg = np.asarray(s.background)
        cover_sharp = (np.abs(sharp - bg[None, None, :]).max(-1) > 0.03).sum()
        cover_blur = (np.abs(blurred - bg[None, None, :]).max(-1) > 0.03).sum()
        # The shutter smears the cube across more pixels than any single instant.
        assert cover_blur > cover_sharp * 1.3, (cover_sharp, cover_blur)
        # Deterministic.
        r3, c3 = scene()
        again = list(animation_frames(r3, c3, camera=cam, fps=2, seconds=1.0,
                                      settings=s, motion_blur_steps=4))[1]
        assert np.array_equal(blurred, again)
