"""Regenerate the tet-corpus structural snapshot (reference: ModalSolverBench
--snapshot + tests/fixtures/TetCorpusSnapshot.txt — per-case tet/Steiner/flip counts
that catch 'tetrahedralizes validly but differently').

Run from the repo root: python -u - < scripts/tet_corpus_snapshot.py > tests/fixtures/tet_corpus_snapshot.txt
"""

import hashlib

import numpy as np

from mesheditor_tpu.mesh import (
    cone_surface, cuboid_surface, icosphere_surface, torus_surface, uv_sphere_surface,
)
from mesheditor_tpu.mesh.cdt import TetProfile, generate_tets_delaunay


def corpus():
    yield "icosphere2", icosphere_surface(2)
    yield "icosphere1_noisy", icosphere_surface(1, noise=0.02, seed=3)
    yield "cuboid", cuboid_surface((0.5, 0.3, 0.4))
    yield "torus", torus_surface(0.5, 0.2, 24, 12)
    yield "uv_sphere", uv_sphere_surface(0.5, 12, 24)
    yield "cone", cone_surface(0.5, 1.0, 24)


def snapshot_lines():
    for name, (pos, tris) in corpus():
        for q, tag in ((0.0, "noq"), (2.0, "q2")):
            prof = TetProfile()
            tm = generate_tets_delaunay(pos, tris, quality_bound=q, profile=prof)
            h = hashlib.sha256()
            h.update(np.ascontiguousarray(tm.tets).tobytes())
            h.update(np.ascontiguousarray(np.round(tm.points, 12)).tobytes())
            yield (f"{name}@{tag}: tets={prof.tets_kept} pts={tm.points.shape[0]} "
                   f"lattice={prof.lattice_points} steiner={prof.recovery_steiner} "
                   f"refine={prof.refine_points} rounds={prof.recovery_rounds} "
                   f"passes={prof.refine_passes} carved={prof.carved_out} "
                   f"slivers={prof.slivers_dropped} hash={h.hexdigest()[:16]}")


if __name__ == "__main__":
    for line in snapshot_lines():
        print(line)
