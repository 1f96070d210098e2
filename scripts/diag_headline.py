import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np
from mesheditor_tpu import SolverConfig, mesh2modes
from mesheditor_tpu.materials import CERAMIC
from mesheditor_tpu.mesh import box_tets

mesh = box_tets((0.3, 0.16, 0.15), (18, 10, 9))
cfg = SolverConfig(num_modes=256, num_fem_modes=256, max_mode_freq=48_000.0, tolerance=1e-6)
excite = mesh.points[:: max(mesh.points.shape[0] // 10, 1)][:10]
r = mesh2modes(mesh, CERAMIC.properties, excite, config=cfg)  # warmup+compile
print("warm done", r.profile.iterate, flush=True)
t0 = time.perf_counter()
r = mesh2modes(mesh, CERAMIC.properties, excite, config=cfg)
print("timed", time.perf_counter() - t0, "iters", r.profile.restarts,
      "factorize", r.profile.factorize, "iterate", r.profile.iterate, flush=True)
