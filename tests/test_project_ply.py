"""Project archives and PLY IO."""

import numpy as np

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu.io.project import load_project, save_project
from mesheditor_tpu.mesh import icosphere_surface, circle_surface, cone_surface
from mesheditor_tpu.mesh.ply_io import load_ply, save_ply
from mesheditor_tpu.scene import AddObject, Registry, SetAcousticMaterial, apply_action
from mesheditor_tpu.scene.snapshot import snapshot_scene


class TestProject:
    def test_roundtrip_byte_exact(self, tmp_path):
        r = Registry()
        apply_action(r, AddObject(name="obj"))
        apply_action(r, SetAcousticMaterial(entity=1, name="Iron"))
        save_project(tmp_path / "a.project", r)
        r2 = load_project(tmp_path / "a.project")
        assert snapshot_scene(r2) == snapshot_scene(r)

    def test_bundles_modal_artifacts(self, tmp_path):
        from mesheditor_tpu.scene.components import ModalModel

        r = Registry()
        apply_action(r, AddObject(name="obj"))
        modal_dir = tmp_path / "modal"
        modal_dir.mkdir()
        (modal_dir / "deadbeef.npz").write_bytes(b"fake")
        r.emplace(1, ModalModel("deadbeef.npz"))
        save_project(tmp_path / "b.project", r, modal_dir=modal_dir)
        out = tmp_path / "restored"
        load_project(tmp_path / "b.project", extract_modal_to=out)
        assert (out / "deadbeef.npz").read_bytes() == b"fake"


class TestPly:
    def test_binary_roundtrip(self, tmp_path):
        pts, tris = icosphere_surface(1)
        save_ply(tmp_path / "s.ply", pts, tris, binary=True)
        p2, t2 = load_ply(tmp_path / "s.ply")
        assert np.allclose(p2, pts)
        assert np.array_equal(t2, tris)

    def test_ascii_roundtrip(self, tmp_path):
        pts, tris = icosphere_surface(0)
        save_ply(tmp_path / "a.ply", pts, tris, binary=False)
        p2, t2 = load_ply(tmp_path / "a.ply")
        assert np.allclose(p2, pts)
        assert np.array_equal(t2, tris)


class TestNewPrimitives:
    def test_circle_and_cone(self):
        pts, tris = circle_surface(0.5, 16)
        assert tris.shape == (16, 3)
        pts, tris = cone_surface(0.5, 1.0, 16)
        # Closed cone: Euler characteristic 2.
        edges = set()
        for t in tris.astype(int):
            for i in range(3):
                a, b = t[i], t[(i + 1) % 3]
                edges.add((min(a, b), max(a, b)))
        assert pts.shape[0] - len(edges) + tris.shape[0] == 2
