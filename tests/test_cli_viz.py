"""CLI surface and offscreen visualization."""

import numpy as np
import pytest

import mesheditor_tpu  # noqa: F401


class TestCli:
    def test_solve_info_render(self, tmp_path):
        from mesheditor_tpu.__main__ import main
        from mesheditor_tpu.mesh import cuboid_surface, save_obj

        pts, tris = cuboid_surface((0.04, 0.04, 0.04))
        mesh_path = tmp_path / "cube.obj"
        save_obj(mesh_path, pts, tris)
        out_dir = tmp_path / "modal"
        main(["solve", str(mesh_path), "--material", "Glass", "--modes", "10",
              "--vertices", "4", "--tet-resolution", "7", "--max-freq", "48000",
              "--out-dir", str(out_dir)])
        models = list(out_dir.glob("*.npz"))
        assert len(models) == 1
        main(["info", str(models[0])])
        wav = tmp_path / "out.wav"
        main(["render", str(models[0]), "--out", str(wav), "--seconds", "0.3",
              "--strikes", "2"])
        assert wav.stat().st_size > 10_000

    def test_unknown_material_exits(self, tmp_path):
        from mesheditor_tpu.__main__ import main

        with pytest.raises(SystemExit):
            main(["solve", "x.obj", "--material", "Unobtanium"])


class TestViz:
    def test_mesh_and_mode_pngs(self, tmp_path):
        from mesheditor_tpu.mesh import icosphere_surface
        from mesheditor_tpu.types import ModalModes
        from mesheditor_tpu.viz import plot_modes_png, plot_waveform_png, render_mesh_png

        pts, tris = icosphere_surface(1)
        p1 = tmp_path / "mesh.png"
        render_mesh_png(p1, pts, tris, vertex_values=pts[:, 1], title="sphere")
        assert p1.stat().st_size > 5_000

        modes = ModalModes(freqs=np.linspace(100, 8000, 20), t60s=np.linspace(1, 0.05, 20),
                           shapes=np.zeros((1, 20, 3), np.float32))
        p2 = tmp_path / "modes.png"
        plot_modes_png(p2, modes)
        assert p2.stat().st_size > 5_000

        t = np.arange(24000) / 48000
        audio = np.exp(-t * 8) * np.sin(2 * np.pi * 700 * t)
        p3 = tmp_path / "wave.png"
        plot_waveform_png(p3, audio)
        assert p3.stat().st_size > 5_000


class TestCliSimulate:
    def test_simulate_glb_scene(self, tmp_path):
        from mesheditor_tpu.__main__ import main
        from mesheditor_tpu.io.gltf import export_gltf
        from tests.test_gltf_audio_ext import scene_with_model
        from mesheditor_tpu.scene.components import RigidBodyComponent, Transform

        reg, e, modes, mass = scene_with_model(tmp_path)
        reg.emplace(e, Transform(translation=np.array([0.0, 0.25, 0.0])))
        reg.emplace(e, RigidBodyComponent(shape_kind="sphere", radius=0.05,
                                          is_dynamic=True, mass=0.5))
        floor = reg.create()
        reg.emplace(floor, RigidBodyComponent(shape_kind="plane"))
        glb = tmp_path / "scene.glb"
        export_gltf(reg, glb)
        wav = tmp_path / "sim.wav"
        main(["simulate", str(glb), "--seconds", "0.4", "--out", str(wav),
              "--store", str(tmp_path / "store2")])
        assert wav.stat().st_size > 10_000


class TestViewRecordCli:
    """The view/record subcommands (reference: --screenshot/--record CLI)."""

    def _obj(self, tmp_path):
        from mesheditor_tpu.mesh import cuboid_surface, save_obj

        pos, tris = cuboid_surface((0.5, 0.4, 0.3))
        p = tmp_path / "box.obj"
        save_obj(p, pos, tris)
        return p

    def test_view_writes_png(self, tmp_path):
        from mesheditor_tpu.__main__ import main

        obj = self._obj(tmp_path)
        out = tmp_path / "shot.png"
        main(["view", str(obj), "--out", str(out), "--width", "48", "--height", "36",
              "--supersample", "1"])
        assert out.stat().st_size > 0

    def test_record_writes_gif(self, tmp_path):
        from mesheditor_tpu.__main__ import main

        obj = self._obj(tmp_path)
        out = tmp_path / "turn.gif"
        main(["record", str(obj), "--out", str(out), "--frames", "3",
              "--width", "32", "--height", "24"])
        assert out.stat().st_size > 0
