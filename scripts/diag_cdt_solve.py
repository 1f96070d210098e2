"""Diagnose the CDT-vs-structured solve gap (VERDICT r4 #2): run the quickstart
torus through mesh2modes on the live backend with stage profiling + eigensolver
debug, and print where the wall-clock actually goes (f32 engine vs f64 polish,
iteration counts, per-stage seconds). Run N times to expose run-to-run variance
(VERDICT r4 weak #4).

Usage: python scripts/diag_cdt_solve.py [runs=2]
"""
import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("MESHEDITOR_TPU_DEBUG_EIG", "1")

import numpy as np

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu import SolverConfig, mesh2modes, profile
from mesheditor_tpu.materials import CERAMIC
from mesheditor_tpu.mesh import torus_surface
from mesheditor_tpu.mesh.cdt import generate_tets_delaunay


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    pts, tris = torus_surface(0.06, 0.025)
    h = float(np.max(pts.max(0) - pts.min(0))) / 24
    t0 = time.perf_counter()
    tm = generate_tets_delaunay(pts, tris, lattice_h=h)
    print(f"mesh: {tm.tets.shape[0]} tets in {time.perf_counter()-t0:.1f}s", flush=True)

    # The quickstart's solve settings (solve_surface defaults at num_modes=30).
    cfg = SolverConfig(num_modes=30, num_fem_modes=45)
    excite = tm.points[:: max(tm.points.shape[0] // 10, 1)][:10]

    profile.enabled = True
    for i in range(runs):
        profile.reset()
        t0 = time.perf_counter()
        r = mesh2modes(tm, CERAMIC.properties, excite, config=cfg, verbose=True)
        dt = time.perf_counter() - t0
        print(f"--- run {i}: {dt:.1f}s wall, modes={r.modes.num_modes}, "
              f"f1={r.modes.freqs[0] if r.modes.num_modes else 0:.1f} Hz", flush=True)
        print(profile.report(min_share=0.02), flush=True)


if __name__ == "__main__":
    main()
