"""Timeline (frame clock + baked physics playback; reference PhysicsSystem.h:22-30,
ProcessEvents.cpp:1615) and recorded-sample playback voices (SoundVerticesModel::Samples,
AudioTypes.h:39-46)."""

import numpy as np

from mesheditor_tpu.mesh import cuboid_surface
from mesheditor_tpu.scene.animation import (
    AnimationChannel, AnimationClip, Interpolation, TargetPath,
)
from mesheditor_tpu.scene.components import (
    MeshSurface, RigidBodyComponent, Transform, WorldTransform,
)
from mesheditor_tpu.scene.derive import install_default_pipeline
from mesheditor_tpu.scene.registry import Registry
from mesheditor_tpu.scene.timeline import Timeline
from mesheditor_tpu.synth.samples import MAX_SAMPLE_VOICES, SamplePlayer


def _scene_with_clip():
    r = Registry()
    install_default_pipeline(r)
    e = r.create()
    pos, tris = cuboid_surface((0.5, 0.5, 0.5))
    r.emplace(e, MeshSurface(positions=pos, triangles=np.asarray(tris, np.uint32)))
    r.emplace(e, Transform())
    clip = AnimationClip("move", [AnimationChannel(
        entity=e, path=TargetPath.TRANSLATION,
        times=np.array([0.0, 1.0]),
        values=np.array([[0.0, 0, 0], [3.0, 0, 0]]),
        interpolation=Interpolation.LINEAR,
    )])
    return r, e, clip


class TestTimeline:
    def test_seek_evaluates_clip_and_derives(self):
        r, e, clip = _scene_with_clip()
        tl = Timeline(r, clips=[clip], fps=30)
        tl.seek(15)  # t = 0.5 s -> x = 1.5
        t = r.get(e, Transform)
        assert abs(t.translation[0] - 1.5) < 1e-12
        wt = r.get(e, WorldTransform)
        assert abs(wt.matrix[0, 3] - 1.5) < 1e-12  # derivation ran

    def test_tick_advances_and_loops(self):
        r, e, clip = _scene_with_clip()
        tl = Timeline(r, clips=[clip], fps=30)
        tl.state.start_frame = 0
        tl.state.end_frame = 3
        tl.play()
        frames = []
        for _ in range(6):
            tl.tick()
            frames.append(tl.state.frame)
        assert frames == [1, 2, 3, 0, 1, 2]

    def test_no_loop_stops_at_end(self):
        r, e, clip = _scene_with_clip()
        tl = Timeline(r, clips=[clip], fps=30)
        tl.state.end_frame = 2
        tl.state.loop = False
        tl.play()
        for _ in range(5):
            tl.tick()
        assert tl.state.frame == 2 and not tl.state.playing

    def test_baked_physics_playback_deterministic(self):
        def build():
            r = Registry()
            install_default_pipeline(r)
            floor = r.create()
            r.emplace(floor, RigidBodyComponent(shape_kind="plane"))
            ball = r.create()
            r.emplace(ball, Transform(translation=np.array([0.0, 2.0, 0.0])))
            r.emplace(ball, RigidBodyComponent(shape_kind="sphere", radius=0.25,
                                               is_dynamic=True, mass=1.0))
            tl = Timeline(r, fps=30)
            tl.bake_physics(seconds=1.5)
            return r, ball, tl

        r1, b1, t1 = build()
        r2, b2, t2 = build()
        ys1 = []
        ys2 = []
        for f in (0, 10, 20, 30, 44):
            t1.seek(f)
            ys1.append(r1.get(b1, Transform).translation[1])
            t2.seek(f)
            ys2.append(r2.get(b2, Transform).translation[1])
        assert ys1 == ys2                      # byte-deterministic replay
        assert ys1[0] > ys1[1] > ys1[2]        # the ball fell
        assert ys1[-1] < 0.6                   # and came to rest near the floor
        # Seeking back in time re-samples the cache, not a re-simulation.
        t1.seek(0)
        assert abs(r1.get(b1, Transform).translation[1] - ys1[0]) < 1e-15

    def test_frames_iterator_fixed_step(self):
        r, e, clip = _scene_with_clip()
        tl = Timeline(r, clips=[clip], fps=30)
        tl.state.end_frame = 5
        seen = list(tl.frames())
        assert seen == [0, 1, 2, 3, 4, 5]


class TestSamplePlayer:
    def test_trigger_and_mix(self):
        sp = SamplePlayer()
        clip = np.linspace(1.0, 0.0, 100, dtype=np.float32)
        sp.set_vertex_samples(0, [clip])
        assert sp.has_samples(0)
        assert sp.trigger(0, 0)
        out = sp.mix(60)
        assert np.allclose(out, clip[:60])
        out2 = sp.mix(60)  # remaining 40 + silence
        assert np.allclose(out2[:40], clip[60:])
        assert np.all(out2[40:] == 0)
        assert sp.active_voices == 0  # retired

    def test_block_boundary_invariance(self):
        clip = np.sin(np.linspace(0, 20, 512)).astype(np.float32)
        a = SamplePlayer()
        a.set_vertex_samples(0, [clip])
        a.trigger(0, 0)
        whole = a.mix(512)
        b = SamplePlayer()
        b.set_vertex_samples(0, [clip])
        b.trigger(0, 0)
        parts = np.concatenate([b.mix(128) for _ in range(4)])
        assert np.array_equal(whole, parts)

    def test_polyphony_and_refusal(self):
        sp = SamplePlayer()
        sp.set_vertex_samples(0, [np.ones(1000, np.float32)])
        for _ in range(MAX_SAMPLE_VOICES):
            assert sp.trigger(0, 0)
        assert not sp.trigger(0, 0)
        assert sp.voices_refused == 1
        out = sp.mix(16)
        assert np.allclose(out, MAX_SAMPLE_VOICES)

    def test_missing_vertex_is_ignored(self):
        sp = SamplePlayer()
        assert not sp.trigger(3, 7)
        assert np.all(sp.mix(8) == 0)


class TestSamplesModeRouting:
    def test_samples_mode_taps_recording_not_bank(self, tmp_path):
        import jax

        from mesheditor_tpu.scene.audio_sync import SceneAudio
        from mesheditor_tpu.scene.components import (
            AcousticMaterialRef, SolveSettingsComponent, SoundVertices,
        )
        from mesheditor_tpu.mesh import icosphere_surface

        r = Registry()
        install_default_pipeline(r)
        e = r.create()
        pos, tris = icosphere_surface(1)
        r.emplace(e, MeshSurface(positions=pos * 0.12,
                                 triangles=np.asarray(tris, np.uint32)))
        r.emplace(e, AcousticMaterialRef())
        r.emplace(e, SolveSettingsComponent(num_modes=8, num_vertices=4,
                                            max_mode_freq=48000.0))
        r.emplace(e, SoundVertices(vertices=np.arange(4, dtype=np.uint32),
                                   model="samples"))
        sa = SceneAudio(r, tmp_path, 48000.0, 8)
        sa.reconcile()
        clip = np.full(256, 0.25, np.float32)
        sa.set_vertex_samples(e, [clip, clip, clip, clip])
        sa.strike(e, 1, (0, 0.1, 0))
        out = sa.render_with_samples(128)
        assert np.allclose(out, 0.25, atol=1e-5)  # pure recording, no modal ring
        # Switching to modal mode re-routes to the bank.
        r.get(e, SoundVertices).model = "modal"
        sa.strike(e, 1, (0, 0.1, 0))
        out2 = sa.render_with_samples(4096)
        assert not np.allclose(out2, 0.0)
        assert np.abs(out2).max() != 0.25


class TestSimulateVideo:
    def test_on_frame_fires_at_video_clock(self, tmp_path):
        from mesheditor_tpu.mesh import icosphere_surface
        from mesheditor_tpu.scene.audio_sync import simulate_scene
        from mesheditor_tpu.scene.components import (
            AcousticMaterialRef, RigidBodyComponent, SolveSettingsComponent,
        )

        r = Registry()
        install_default_pipeline(r)
        floor = r.create()
        r.emplace(floor, RigidBodyComponent(shape_kind="plane"))
        ball = r.create()
        pos, tris = icosphere_surface(1)
        r.emplace(ball, MeshSurface(positions=pos * 0.12,
                                    triangles=np.asarray(tris, np.uint32)))
        r.emplace(ball, Transform(translation=np.array([0.0, 0.5, 0.0])))
        r.emplace(ball, RigidBodyComponent(shape_kind="sphere", radius=0.12,
                                           is_dynamic=True, mass=1.0))
        r.emplace(ball, AcousticMaterialRef())
        r.emplace(ball, SolveSettingsComponent(num_modes=6, num_vertices=4,
                                               max_mode_freq=48000.0))
        ys = []

        def on_frame(reg, i):
            ys.append(float(reg.get(ball, Transform).translation[1]))

        audio = simulate_scene(r, tmp_path, seconds=0.5, tet_resolution=8,
                               on_frame=on_frame, video_fps=20.0)
        assert np.isfinite(audio).all()
        assert 8 <= len(ys) <= 11          # ~0.5 s at 20 fps
        assert ys[0] > ys[-1]              # the ball fell across the frames
