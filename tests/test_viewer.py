"""Interactive viewer shell (app/viewer.py): event grammar, picking, gizmo drags, and
the replay determinism the reference's in-app self-test enforces (main.cpp:409-423).

Driven headless through ViewerApp.handle() — the same entry the HTTP layer calls — so
the tests cover the composition (actions -> derive -> render -> pick) without a
browser.
"""

import numpy as np

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu.app.viewer import ViewerApp, _encode_png
from mesheditor_tpu.scene.components import MeshSurface, Name, Transform


def make_app(tmp_path, **kw):
    return ViewerApp(width=320, height=200, session_root=tmp_path / "sess", **kw)


class TestViewerEvents:
    def test_add_select_render(self, tmp_path):
        app = make_app(tmp_path)
        st = app.handle({"type": "add", "kind": "cuboid"})
        assert [o["name"] for o in st["objects"]] == ["cuboid"]
        png = app.frame_png()
        assert png.startswith(b"\x89PNG") and len(png) > 1000
        # Click dead-center: the cuboid fills the framed view.
        st = app.handle({"type": "click", "x": 160, "y": 100})
        assert st["selected"] >= 0 and st["selected_name"] == "cuboid"

    def test_orbit_changes_frame(self, tmp_path):
        app = make_app(tmp_path)
        app.handle({"type": "add", "kind": "torus"})
        f1 = app.frame_png()
        app.handle({"type": "orbit", "dx": 60, "dy": 15})
        f2 = app.frame_png()
        assert f1 != f2

    def test_gizmo_translate_emits_actions(self, tmp_path):
        app = make_app(tmp_path)
        app.handle({"type": "add", "kind": "cuboid"})
        app.handle({"type": "click", "x": 160, "y": 100})
        ent = app.selected
        app.handle({"type": "mode", "mode": "translate"})
        t0 = np.asarray(app.registry.get(ent, Transform).translation).copy()
        # Grab near the x-axis tip by scanning a few pixels until a handle sticks.
        from mesheditor_tpu.render.gizmo import pick_handle

        cam = app.camera()
        center = app._gizmo_center()
        hit = None
        for x in range(0, 320, 4):
            for y in range(0, 200, 4):
                h = pick_handle(cam, 320, 200, x, y, center, mode="translate",
                                size=app.radius * 0.18)
                if h is not None and not h.plane:
                    hit = (x, y)
                    break
            if hit:
                break
        assert hit is not None, "no gizmo handle hit-testable on screen"
        app.handle({"type": "drag_start", "x": hit[0], "y": hit[1]})
        assert app.drag is not None
        app.handle({"type": "drag_move", "x": hit[0] + 25, "y": hit[1]})
        app.handle({"type": "drag_end"})
        t1 = np.asarray(app.registry.get(ent, Transform).translation)
        assert not np.allclose(t0, t1), "drag must move the object"

    def test_delete_and_replay_exact(self, tmp_path):
        app = make_app(tmp_path)
        app.handle({"type": "add", "kind": "icosphere"})
        app.handle({"type": "add", "kind": "cone"})
        app.handle({"type": "click_entity", "entity": app.state()["objects"][0]["entity"]})
        app.handle({"type": "delete"})
        st = app.state()
        assert len(st["objects"]) == 1
        v = app.verify()
        assert v["byte_exact"], f"viewer session must replay byte-exact: {v}"

    def test_strike_records_action(self, tmp_path):
        app = make_app(tmp_path)
        app.handle({"type": "add", "kind": "cuboid"})
        app.handle({"type": "mode", "mode": "strike"})
        st = app.handle({"type": "click", "x": 160, "y": 100})
        app.session.log.drain()
        log_text = (app.session.dir / "actions.log").read_text()
        assert "StrikeVertex" in log_text
        assert app.verify()["byte_exact"]


class TestPngEncoder:
    def test_roundtrip_via_png_signature(self):
        img = (np.random.default_rng(0).uniform(0, 255, (8, 6, 3))).astype(np.uint8)
        png = _encode_png(img)
        assert png.startswith(b"\x89PNG") and b"IEND" in png


class TestAudioStatePanel:
    """Live observability surface (VERDICT r3 #9; reference: DrawAudioDebug
    counters AudioSystem.cpp:2020 + ImPlot waveform/spectrum :1527-1597 +
    DrawModalJobsOverlay main.cpp:1137)."""

    def test_state_carries_audio_counters(self, tmp_path):
        app = make_app(tmp_path)
        st = app.state()
        a = st["audio"]
        assert a["active_voices"] == 0 and a["active_impacts"] == 0
        assert a["events_dropped"] == 0 and a["solves"] == []
        assert not a["enabled"]

    def test_waveform_unavailable_before_strike(self, tmp_path):
        app = make_app(tmp_path)
        assert app.waveform() == {"available": False}

    def test_waveform_and_counters_after_synth(self, tmp_path):
        from mesheditor_tpu.synth import ModalEvent
        from mesheditor_tpu.synth.engine import ModalSynth

        from mesheditor_tpu.types import ModalModes

        app = make_app(tmp_path)
        # Wire a synthetic bank directly (solve-free): two objects, four modes.
        rng = np.random.default_rng(0)
        k = 4
        freqs = np.array([200.0, 450.0, 800.0, 1200.0])
        modes = ModalModes(
            freqs=freqs, t60s=np.full(k, 0.3),
            shapes=rng.standard_normal((3, k, 3)) * 0.01,
        )
        synth = ModalSynth([modes, modes], max_impacts=8, max_voices=2)
        synth.enqueue(ModalEvent(kind="impact", obj=0, expos=0, j=(0.1, 0.1, 0.0),
                                 pulse_step=1 / 100.0, pulse_gamma=np.pi / 200.0,
                                 accel_amp=0.0))
        app._synth = synth
        audio = np.asarray(synth.render_seconds(0.25))
        app._last_audio = audio
        st = app.state()["audio"]
        assert st["bank_objects"] == 2 and st["bank_modes"] >= k  # bank pads the mode axis
        w = app.waveform()
        assert w["available"]
        assert len(w["env_hi"]) == len(w["env_lo"]) > 16
        assert len(w["spectrum"]) == len(w["spectrum_freqs"]) > 16
        assert max(w["spectrum"]) == 1.0
        # Spectrum peaks land on the bank's mode frequencies (+-1 bin of 48k/12000).
        peaks = np.asarray(w["peaks_hz"])
        assert any(abs(peaks - f).min() < 16.0 for f in freqs)

    def test_solve_progress_recorded(self, tmp_path):
        app = make_app(tmp_path, audio=True)
        app.handle({"type": "add", "name": "cube"})
        app._ensure_synth()
        assert app.solve_progress, "no solve progress recorded"
        job = next(iter(app.solve_progress.values()))
        assert job["done"] and (job.get("modes", 0) > 0 or "error" in job)
        st = app.state()["audio"]
        assert st["solves"] and st["solves"][0]["done"]


class TestPhysicsInspector:
    """VERDICT r4 #8: the PhysicsUi analog — bodies listed with editable
    motion/shape fields routed through the action system (FieldEdit limits)."""

    def test_add_body_and_list(self, tmp_path):
        app = make_app(tmp_path)
        st = app.handle({"type": "add", "kind": "cuboid"})
        ent = st["objects"][0]["entity"]
        app.handle({"type": "click_entity", "entity": ent})
        app.handle({"type": "add_body", "shape": "box"})
        p = app.physics_state()
        assert len(p["bodies"]) == 1
        b = p["bodies"][0]
        assert b["entity"] == ent and b["shape"] == "box" and b["motion"] == "static"
        names = {f["name"] for f in b["fields"]}
        assert {"mass", "is_dynamic", "gravity_factor", "shape_kind"} <= names
        # mass carries its FIELD_LIMITS range for the editor row
        mass_row = next(f for f in b["fields"] if f["name"] == "mass")
        assert mass_row["limits"] == [0.0, 1e5]
        assert p["world"]["bodies"] == 1 and p["world"]["dynamic"] == 0

    def test_edit_clamps_and_replays(self, tmp_path):
        from mesheditor_tpu.scene.components import RigidBodyComponent

        app = make_app(tmp_path)
        st = app.handle({"type": "add", "kind": "cuboid"})
        ent = st["objects"][0]["entity"]
        app.handle({"type": "add_body", "shape": "sphere", "entity": ent})
        app.handle({"type": "click_entity", "entity": ent})
        app.handle({"type": "add_body", "shape": "sphere"})
        app.handle({"type": "physics_edit", "entity": ent,
                    "field": "is_dynamic", "value": True})
        app.handle({"type": "physics_edit", "entity": ent,
                    "field": "mass", "value": 2.5})
        # Clamped at the FIELD_LIMITS boundary, like every SetField.
        app.handle({"type": "physics_edit", "entity": ent,
                    "field": "gravity_factor", "value": 99.0})
        rb = app.registry.get(ent, RigidBodyComponent)
        assert rb.is_dynamic is True and rb.mass == 2.5
        assert rb.gravity_factor == 10.0  # clamped
        p = app.physics_state()
        assert p["bodies"][0]["motion"] == "dynamic"
        assert p["world"]["dynamic"] == 1
        # The edits went through the action log: replay reproduces them byte-exact.
        v = app.verify()
        assert v["byte_exact"], v


class TestGenericInspector:
    """The generated per-entity inspector (FieldEdit reflection over every
    registered component) + the field_edit event through the action system."""

    def test_inspect_lists_components_with_limits(self, tmp_path):
        app = make_app(tmp_path)
        st = app.handle({"type": "add", "kind": "cuboid"})
        ent = st["objects"][0]["entity"]
        app.handle({"type": "click_entity", "entity": ent})
        p = app.inspect(ent)
        assert p["entity"] == ent and p["components"], p
        assert "Name" in p["components"]
        # Attach audio-ish components and see them appear with limits.
        app.handle({"type": "field_edit", "entity": ent,
                    "component": "ModalGainComponent", "field": "value",
                    "value": 2.0})
        p = app.inspect(ent)
        row = p["components"]["ModalGainComponent"][0]
        assert row["value"] == 2.0 and row["limits"] == [0.0, 10.0]

    def test_field_edit_clamps_and_replays(self, tmp_path):
        app = make_app(tmp_path)
        st = app.handle({"type": "add", "kind": "cuboid"})
        ent = st["objects"][0]["entity"]
        app.handle({"type": "field_edit", "entity": ent,
                    "component": "ModalGainComponent", "field": "value",
                    "value": 99.0})
        from mesheditor_tpu.scene.components import ModalGainComponent

        assert app.registry.get(ent, ModalGainComponent).value == 10.0  # clamped
        v = app.verify()
        assert v["byte_exact"], v
