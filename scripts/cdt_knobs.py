"""CDT-torus solver knob experiments (the irregular-pencil regime, VERDICT r4 #2).

Usage: python scripts/cdt_knobs.py [inner_iters] [max_coarse_dofs] [reps]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu import SolverConfig
from mesheditor_tpu.materials import CERAMIC
from mesheditor_tpu.mesh import torus_surface
from mesheditor_tpu.mesh.cdt import generate_tets_delaunay

inner = int(sys.argv[1]) if len(sys.argv) > 1 else 10
coarse = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

from mesheditor_tpu.solve import amg as amg_mod
from mesheditor_tpu.solve import mesh2modes as _  # noqa
import importlib

m2m = importlib.import_module("mesheditor_tpu.solve.mesh2modes")

_orig_build = amg_mod.build_amg


def build_patched(*a, **kw):
    kw.setdefault("max_coarse_dofs", coarse)
    return _orig_build(*a, **kw)


amg_mod.build_amg = build_patched

pts, tris = torus_surface(0.06, 0.025)
h = float(np.max(pts.max(0) - pts.min(0))) / 24
tm = generate_tets_delaunay(pts, tris, lattice_h=h)
cfg = SolverConfig(num_modes=30, num_fem_modes=45, inner_iters=inner)
excite = tm.points[:: max(tm.points.shape[0] // 10, 1)][:10]

for r in range(reps):
    t0 = time.perf_counter()
    result = m2m.mesh2modes(tm, CERAMIC.properties, excite, config=cfg)
    dt = time.perf_counter() - t0
    p = result.profile
    print(
        f"run{r}: total={dt:.2f}s iters={p.restarts} ops={p.op_applications} "
        f"factorize={p.factorize:.2f}s iterate={p.iterate:.2f}s "
        f"modes={result.modes.num_modes} "
        f"f1={float(result.modes.freqs[0]) if result.modes.num_modes else 0:.1f}",
        flush=True,
    )
print(f"knobs: inner_iters={inner} max_coarse_dofs={coarse} dofs={p.dofs}")
