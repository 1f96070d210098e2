"""Regenerate the tet-corpus structural snapshot (reference: ModalSolverBench
--snapshot + tests/fixtures/TetCorpusSnapshot.txt — per-case tet/Steiner/flip counts
that catch 'tetrahedralizes validly but differently').

Run from the repo root: python -u - < scripts/tet_corpus_snapshot.py > tests/fixtures/tet_corpus_snapshot.txt
"""

import hashlib

import numpy as np

import numpy as _np

from mesheditor_tpu.mesh import (
    bowl_surface, cone_surface, cuboid_surface, cylinder_surface, icosphere_surface,
    shell_surface, torus_surface, uv_sphere_surface,
)
from mesheditor_tpu.mesh.cdt import TetProfile, generate_tets_delaunay


def corpus():
    yield "icosphere2", icosphere_surface(2)
    yield "icosphere1_noisy", icosphere_surface(1, noise=0.02, seed=3)
    yield "cuboid", cuboid_surface((0.5, 0.3, 0.4))
    yield "torus", torus_surface(0.5, 0.2, 24, 12)
    yield "uv_sphere", uv_sphere_surface(0.5, 12, 24)
    yield "cone", cone_surface(0.5, 1.0, 24)
    # Adversarial thin-shell / scanned-class cases (the RealImpact regime:
    # /root/reference/tests/fixtures/TetCorpusSnapshot.txt pins bowls/plates/skillets;
    # walls are 2-5% of the diameter, exactly where lattice seeding used to starve).
    yield "bowl5pct", bowl_surface(0.06, 0.003, 12, 40)
    yield "bowl2.5pct", bowl_surface(0.06, 0.0015, 12, 40)
    yield "bowl_scan_noisy", bowl_surface(0.06, 0.003, 12, 40, noise=0.15, seed=7)
    yield "sphere_shell4pct", shell_surface(*_scaled_icosphere(0.05), 0.002)
    yield "ellipsoid_shell", shell_surface(
        *_scaled_icosphere(_np.array([0.06, 0.04, 0.02])), 0.0015)
    yield "plate_thin", cylinder_surface(0.09, 0.004, 48)


def _scaled_icosphere(scale):
    pts, tris = icosphere_surface(2)
    return pts * scale, tris


def snapshot_lines():
    for name, (pos, tris) in corpus():
        for q, tag in ((0.0, "noq"), (2.0, "q2")):
            prof = TetProfile()
            tm = generate_tets_delaunay(pos, tris, quality_bound=q, profile=prof)
            h = hashlib.sha256()
            h.update(np.ascontiguousarray(tm.tets).tobytes())
            h.update(np.ascontiguousarray(np.round(tm.points, 12)).tobytes())
            yield (f"{name}@{tag}: tets={prof.tets_kept} pts={tm.points.shape[0]} "
                   f"lattice={prof.lattice_points} thin={prof.thin_wall_seeds} "
                   f"steiner={prof.recovery_steiner} refine={prof.refine_points} "
                   f"rounds={prof.recovery_rounds} passes={prof.refine_passes} "
                   f"carved={prof.carved_out} slivers={prof.slivers_dropped} "
                   f"repaired={prof.sliver_repairs} hash={h.hexdigest()[:16]}")


if __name__ == "__main__":
    for line in snapshot_lines():
        print(line)
