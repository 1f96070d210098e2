"""Bench-pencil eigensolver knob experiments on the TPU.

Usage: python scripts/bench_solve_knobs.py [inner_iters] [max_coarse_dofs] [reps]
Assembles the bench box once, builds the AMG at the requested coarse size, and runs
the production solve path end-to-end, reporting stage wall times + iterations.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu import SolverConfig
from mesheditor_tpu.materials import CERAMIC
from mesheditor_tpu.mesh import box_tets
import importlib

m2m = importlib.import_module("mesheditor_tpu.solve.mesh2modes")  # the module
# (solve/__init__ rebinds the package attribute `mesh2modes` to the FUNCTION, so
# `import ... as` — which resolves via getattr — would return the function.)

inner = int(sys.argv[1]) if len(sys.argv) > 1 else 16
coarse = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

# Patch the AMG coarse-size default for the experiment.
from mesheditor_tpu.solve import amg as amg_mod

_orig_build = amg_mod.build_amg


def build_patched(*a, **kw):
    kw.setdefault("max_coarse_dofs", coarse)
    return _orig_build(*a, **kw)


amg_mod.build_amg = build_patched
m2m_build = getattr(m2m, "build_amg", None)

mesh = box_tets((0.3, 0.16, 0.15), (18, 10, 9))
cfg = SolverConfig(num_modes=256, num_fem_modes=256, max_mode_freq=48_000.0,
                   tolerance=1e-6, inner_iters=inner)
excite = mesh.points[:: max(mesh.points.shape[0] // 10, 1)][:10]

for r in range(reps):
    t0 = time.perf_counter()
    result = m2m.mesh2modes(mesh, CERAMIC.properties, excite, config=cfg)
    dt = time.perf_counter() - t0
    p = result.profile
    print(
        f"run{r}: total={dt:.2f}s iters={p.restarts} ops={p.op_applications} "
        f"factorize={p.factorize:.2f}s iterate={p.iterate:.2f}s extract={p.extract:.2f}s "
        f"modes={result.modes.num_modes} f1={float(result.modes.freqs[0]):.1f}",
        flush=True,
    )
print(f"knobs: inner_iters={inner} max_coarse_dofs={coarse}")
