"""Edit-loop bench: cold solve vs warm-started re-solve vs exact material rescale
(reference: ModalSolverBench --edit-loop, README.md:283 — the interactive edit cycle
the warm-start machinery exists for).

Three tiers of the same "user edits the material" loop:
  1. cold      — full solve from a random subspace
  2. warm      — re-solve seeded with the prior basis (SolveReuse; Poisson edit)
  3. rescale   — exact closed-form E/rho rescale, no solve at all (RescaleModes)

Run: python -u - < scripts/edit_loop_bench.py
"""

import time

import numpy as np

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu import SolverConfig, mesh2modes
from mesheditor_tpu.materials import CERAMIC
from mesheditor_tpu.mesh import box_tets
from mesheditor_tpu.solve.mesh2modes import SolveReuse
from mesheditor_tpu.solve.postprocess import rescale_modes
from mesheditor_tpu.types import AcousticMaterialProperties


def main():
    mesh = box_tets((0.3, 0.16, 0.15), (12, 7, 6))
    cfg = SolverConfig(num_modes=96, num_fem_modes=96, max_mode_freq=48_000.0,
                       tolerance=1e-6)
    excite = mesh.points[:: max(mesh.points.shape[0] // 10, 1)][:10]
    mat = CERAMIC.properties

    # Warmup compiles.
    r0 = mesh2modes(mesh, mat, excite, config=cfg, reuse=SolveReuse(keep_basis=True))

    t0 = time.perf_counter()
    r_cold = mesh2modes(mesh, mat, excite, config=cfg,
                        reuse=SolveReuse(keep_basis=True))
    cold_s = time.perf_counter() - t0
    print(f"cold:    {cold_s:6.1f}s  iters={r_cold.profile.restarts} "
          f"f1={float(r_cold.modes.freqs[0]):.2f}", flush=True)

    # Material edit that CANNOT be rescaled exactly (Poisson changes mode shapes).
    mat_nu = AcousticMaterialProperties(mat.density, mat.young_modulus,
                                        mat.poisson_ratio + 0.02,
                                        mat.alpha, mat.beta)
    t0 = time.perf_counter()
    r_warm = mesh2modes(mesh, mat_nu, excite, config=cfg,
                        reuse=SolveReuse(seed_basis=r_cold.basis))
    warm_s = time.perf_counter() - t0
    print(f"warm:    {warm_s:6.1f}s  iters={r_warm.profile.restarts} "
          f"f1={float(r_warm.modes.freqs[0]):.2f}  speedup={cold_s / warm_s:.1f}x",
          flush=True)

    # Material edit that CAN: E/rho only — exact closed-form rescale.
    mat_e = AcousticMaterialProperties(mat.density * 1.3, mat.young_modulus * 0.8,
                                       mat.poisson_ratio, mat.alpha, mat.beta)
    t0 = time.perf_counter()
    rescaled = rescale_modes(r_cold.summary, r_cold.modes, mat_e, cfg)
    rescale_s = time.perf_counter() - t0
    expect = float(r_cold.modes.freqs[0]) * np.sqrt(0.8 / 1.3)
    print(f"rescale: {rescale_s * 1e3:6.1f}ms f1={float(rescaled.freqs[0]):.2f} "
          f"(closed-form {expect:.2f})  speedup={cold_s / max(rescale_s, 1e-9):.0f}x",
          flush=True)


if __name__ == "__main__":
    main()
