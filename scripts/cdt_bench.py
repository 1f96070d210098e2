"""Solve benchmark through the FULL meshing pipeline (VERDICT r1 weak #4: the
headline bench uses a structured box; per-element conditioning of CDT tets is what
actually stresses the preconditioner).

Meshes an irregular scanned-class surface (vertex-jittered icosphere) with the native
conforming-Delaunay tetrahedralizer to ~bench-scale, then times the modal solve on the
current backend. Prints one JSON line per case.

Usage: python scripts/cdt_bench.py [--modes 256] [--subdiv 3]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", type=int, default=256)
    ap.add_argument("--subdiv", type=int, default=3)
    ap.add_argument("--jitter", type=float, default=0.02, help="vertex jitter, fraction of radius")
    ap.add_argument("--tolerance", type=float, default=1e-6)
    args = ap.parse_args()

    from mesheditor_tpu import SolverConfig, mesh2modes
    from mesheditor_tpu.materials import CERAMIC
    from mesheditor_tpu.mesh import icosphere_surface
    from mesheditor_tpu.mesh.cdt import generate_tets_delaunay

    radius = 0.05
    pts, tris = icosphere_surface(args.subdiv)
    pts = pts * radius
    rng = np.random.default_rng(7)
    pts = pts + rng.standard_normal(pts.shape) * (args.jitter * radius)

    t0 = time.perf_counter()
    bbox = pts.max(0) - pts.min(0)
    mesh = generate_tets_delaunay(pts, tris, lattice_h=float(bbox.max()) / 14)
    mesh_s = time.perf_counter() - t0

    cfg = SolverConfig(num_modes=args.modes, num_fem_modes=args.modes,
                       max_mode_freq=48_000.0, tolerance=args.tolerance)
    excite = mesh.points[:: max(mesh.points.shape[0] // 10, 1)][:10]

    # Warmup (compiles at these shapes), then timed.
    r = mesh2modes(mesh, CERAMIC.properties, excite, config=cfg)
    assert r.modes.num_modes > 0, "CDT solve failed"
    t0 = time.perf_counter()
    r = mesh2modes(mesh, CERAMIC.properties, excite, config=cfg)
    solve_s = time.perf_counter() - t0
    print(json.dumps({
        "metric": "cdt_icosphere_solve",
        "tets": int(mesh.tets.shape[0]),
        "dofs": int(r.profile.dofs),
        "modes": int(r.modes.num_modes),
        "mesh_s": round(mesh_s, 3),
        "solve_s": round(solve_s, 3),
        "iters": int(r.profile.restarts),
        "factorize_s": round(r.profile.factorize, 3),
        "iterate_s": round(r.profile.iterate, 3),
        "f1_hz": float(r.modes.freqs[0]) if r.modes.num_modes else 0.0,
    }))


if __name__ == "__main__":
    main()
