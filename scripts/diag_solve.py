"""Full-solve stage breakdown at bench scale (second run = compile-cached)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from mesheditor_tpu import SolverConfig, mesh2modes
from mesheditor_tpu.materials import CERAMIC
from mesheditor_tpu.mesh import box_tets


def main():
    os.environ.setdefault("MESHEDITOR_TPU_DEBUG_EIG", "1")
    mesh = box_tets((0.3, 0.16, 0.15), (18, 10, 9))
    cfg = SolverConfig(num_modes=256, num_fem_modes=256, max_mode_freq=48_000.0,
                       tolerance=1e-6)
    excite = mesh.points[:: max(mesh.points.shape[0] // 10, 1)][:10]

    for run in range(2):
        t0 = time.perf_counter()
        r = mesh2modes(mesh, CERAMIC.properties, excite, config=cfg)
        dt = time.perf_counter() - t0
        p = r.profile
        print(f"run {run}: total={dt:.2f}s modes={r.modes.num_modes}")
        for f in ("mass_props", "quad_mesh", "assemble", "sample_excite",
                  "factorize", "iterate", "extract", "postprocess"):
            v = getattr(p, f, None)
            if v:
                print(f"  {f:14s} {v:8.3f}s")
        print(f"  iters={p.restarts} ops={p.op_applications}")


if __name__ == "__main__":
    main()
