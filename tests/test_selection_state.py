"""Selection bitsets + picking integration (reference: src/selection/SelectionBitset,
the element bitsets the GPU selection passes maintain)."""

import numpy as np

from mesheditor_tpu.mesh import icosphere_surface
from mesheditor_tpu.render.selection_state import SelectionState, _edges_of


def _grid():
    # 3x3 vertex grid, 8 triangles.
    xs, ys = np.meshgrid(np.arange(3.0), np.arange(3.0))
    pos = np.stack([xs.ravel(), ys.ravel(), np.zeros(9)], 1)
    tris = []
    for r in range(2):
        for c in range(2):
            v = r * 3 + c
            tris += [[v, v + 1, v + 3], [v + 1, v + 4, v + 3]]
    return pos, np.asarray(tris)


class TestSelectionState:
    def test_modes(self):
        pos, tris = _grid()
        s = SelectionState(9, tris)
        s.apply("vertices", [0, 1, 2])
        assert s.counts()["vertices"] == 3
        s.apply("vertices", [2, 3], mode="add")
        assert s.counts()["vertices"] == 4
        s.apply("vertices", [0], mode="subtract")
        assert not s.vertices[0] and s.vertices[1]
        s.apply("vertices", [1, 5], mode="toggle")
        assert not s.vertices[1] and s.vertices[5]
        s.apply("vertices", [7], mode="replace")
        assert s.counts()["vertices"] == 1 and s.vertices[7]

    def test_invert_and_clear(self):
        pos, tris = _grid()
        s = SelectionState(9, tris)
        s.apply("faces", [0, 1])
        s.invert("faces")
        assert s.counts()["faces"] == tris.shape[0] - 2
        s.clear()
        assert s.counts() == {"vertices": 0, "edges": 0, "faces": 0}

    def test_domain_conversions(self):
        pos, tris = _grid()
        s = SelectionState(9, tris)
        s.apply("faces", [0])  # triangle (0, 1, 3)
        assert set(s.faces_to_vertices()) == {0, 1, 3}
        s.apply("vertices", [0, 1, 3])
        assert 0 in s.vertices_to_faces()
        eids = s.vertices_to_edges()
        pairs = {tuple(s.edge_list[i]) for i in eids}
        assert (0, 1) in pairs and (0, 3) in pairs and (1, 3) in pairs

    def test_edge_id_lookup(self):
        pos, tris = _grid()
        s = SelectionState(9, tris)
        assert s.edge_id(1, 0) >= 0
        assert s.edge_id(0, 8) == -1  # no such edge

    def test_grow_and_shrink_roundtrip(self):
        pos, tris = icosphere_surface(1)
        s = SelectionState(pos.shape[0], tris)
        s.apply("vertices", [0])
        s.grow_vertices()
        grown = s.counts()["vertices"]
        assert grown > 1
        s.shrink_vertices()
        assert s.counts()["vertices"] == 1 and s.vertices[0]

    def test_grow_saturates(self):
        pos, tris = icosphere_surface(1)
        s = SelectionState(pos.shape[0], tris)
        s.apply("vertices", [0])
        s.grow_vertices(rings=50)
        assert s.counts()["vertices"] == pos.shape[0]  # connected mesh fully selected

    def test_edges_of_unique_sorted(self):
        pos, tris = _grid()
        e = _edges_of(tris)
        assert (e[:, 0] <= e[:, 1]).all()
        assert np.unique(e, axis=0).shape == e.shape

    def test_picking_feeds_selection(self):
        from mesheditor_tpu.render import Camera, RenderSettings
        from mesheditor_tpu.render.picking import box_select_vertices
        from mesheditor_tpu.render.raster import project_points, rasterize
        from mesheditor_tpu.render.camera import view_projection

        pos, tris = _grid()
        pos = pos - [1, 1, 0]  # center
        cam = Camera(eye=np.array([0.0, 0.0, 5.0]), target=np.zeros(3), near=0.1,
                     far=20.0)
        clip = project_points(view_projection(cam, 64, 64), pos)
        gbuf = rasterize(clip, tris, 64, 64)
        ids = box_select_vertices(np.asarray(clip), 64, 64, 0, 0, 63, 63, gbuf, tris)
        s = SelectionState(pos.shape[0], tris)
        s.apply("vertices", ids)
        assert s.counts()["vertices"] == 9  # all visible vertices selected
        assert len(s.vertices_to_faces()) == tris.shape[0]
