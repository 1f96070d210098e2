"""Break ONE production eigensolver outer iteration into its timed constituents on
the live backend, at bench shapes: the f32/bf16/macro shifted applies, the fused
K/M apply, inner-PCG (production 10 iters), AMG coarse correction, CholQR, Grams,
the fold-RR, and the fold's internals (eigh / Newton-Schulz / refinement).

Round-5 reference numbers on one v5e (bench box, inner=10, macro clustering):
FULL iteration 182 ms = 86 PCG (10 x [4.6 macro apply + coarse 3 + misc]) +
47 fold (26 eigh-795 + 12 NS + 9 refine) + ~49 basis upkeep (kmmat on W, 2x
CholQR, grams). History: 409 ms (r4) -> 381 (node-granular AMG) -> 182 (macro).

Run: python scripts/profile_iter.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu import SolverConfig
from mesheditor_tpu.fem.assembly import (
    assemble_element_matrices, bake_shifted_f32, filter_degenerate, pencil_diagonals,
)
from mesheditor_tpu.fem.quad_mesh import build_quad_mesh
from mesheditor_tpu.materials import CERAMIC
from mesheditor_tpu.mesh import box_tets
from mesheditor_tpu.solve.amg import build_amg
from mesheditor_tpu.solve.eigs import _chol_qr_m, _rr_fold, gram64c
from mesheditor_tpu.solve.lobpcg import _pcg_block, _precise


def timeit(f, *args, n=10):
    r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    mesh = box_tets((0.3, 0.16, 0.15), (18, 10, 9))
    kept = filter_degenerate(mesh.points, mesh.tets)
    quad = build_quad_mesh(kept, mesh.points.shape[0])
    ops = assemble_element_matrices(mesh.points, kept, CERAMIC.properties, quad)
    n = ops.n_dofs
    cfg = SolverConfig(num_modes=256, num_fem_modes=256, max_mode_freq=48_000.0)
    sigma = -((2 * np.pi * cfg.min_mode_freq) ** 2)
    k_diag, m_diag = pencil_diagonals(ops)
    pre = build_amg(mesh.points, kept, quad, ops, k_diag, m_diag, sigma)
    shifted = bake_shifted_f32(ops, sigma)
    p = cfg.num_fem_modes + cfg.guard - pre.rigid.shape[1]  # elastic panel width
    print(f"n={n} p_elastic={p} nagg={pre.nagg} nc={pre.nagg*6}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, p)), jnp.float32)

    from functools import partial

    j = lambda f: jax.jit(_precise(f))  # noqa: E731

    t = timeit(j(shifted.amat), x)
    print(f"amat f32 (p={p}):            {t*1e3:7.2f} ms", flush=True)
    t = timeit(j(shifted.amat_pc), x)
    print(f"amat_pc bf16-traffic:        {t*1e3:7.2f} ms", flush=True)
    t = timeit(j(ops.kmmat_f32), x)
    print(f"kmmat_f32 fused K+M:         {t*1e3:7.2f} ms", flush=True)

    pcg = j(lambda b: _pcg_block(shifted.amat_pc, pre, b, 10))
    t = timeit(pcg, x, n=3)
    print(f"inner PCG x10 (amat_pc+AMG): {t*1e3:7.2f} ms", flush=True)
    pcg32 = j(lambda b: _pcg_block(shifted.amat, pre, b, 10))
    t = timeit(pcg32, x, n=3)
    print(f"inner PCG x10 (amat f32):    {t*1e3:7.2f} ms", flush=True)

    cc = j(lambda r: pre._coarse_correct(r))
    t = timeit(cc, x)
    print(f"AMG coarse correct:          {t*1e3:7.2f} ms", flush=True)
    jac = j(lambda r: pre.inv_diag[:, None] * r)
    t = timeit(jac, x)
    print(f"jacobi term:                 {t*1e3:7.2f} ms", flush=True)

    mx = jax.jit(ops.mmat_f32)(x)
    kx = jax.jit(ops.kmat_f32)(x)
    t = timeit(j(_chol_qr_m), x, mx, kx, n=5)
    print(f"_chol_qr_m (2 passes):       {t*1e3:7.2f} ms", flush=True)
    t = timeit(j(gram64c), x, kx)
    print(f"gram64c (n x p)^2:           {t*1e3:7.2f} ms", flush=True)

    s = jnp.concatenate([x, x, x], 1)
    a = gram64c(s, s) + 10.0 * jnp.eye(3 * p, dtype=jnp.float64)
    b = jnp.eye(3 * p, dtype=jnp.float64) + 1e-8 * a
    fold = j(lambda a, b: _rr_fold(a, b, p, jnp.asarray(1.0)))
    t = timeit(fold, a, b, n=5)
    print(f"_rr_fold (3p={3*p}):         {t*1e3:7.2f} ms", flush=True)

    # fold internals
    from mesheditor_tpu.solve.eigs import _ns_inv_sqrt
    from mesheditor_tpu.solve.lobpcg import _refine_sym

    g32 = (a / jnp.max(jnp.abs(a))).astype(jnp.float32)
    t = timeit(j(lambda m: jnp.linalg.eigh(m)[1]), g32, n=5)
    print(f"  eigh f32 ({3*p})^2:        {t*1e3:7.2f} ms", flush=True)
    t = timeit(j(_ns_inv_sqrt), a, n=5)
    print(f"  _ns_inv_sqrt ({3*p})^2:    {t*1e3:7.2f} ms", flush=True)
    v0 = jnp.linalg.eigh(g32)[1].astype(jnp.float64)
    t = timeit(j(lambda g, v: _refine_sym(g, v)), a / jnp.max(jnp.abs(a)), v0, n=5)
    print(f"  _refine_sym x2 ({3*p})^2:  {t*1e3:7.2f} ms", flush=True)
    g265 = g32[:p, :p]
    t = timeit(j(lambda m: jnp.linalg.eigh(m)[1]), g265, n=5)
    print(f"  eigh f32 ({p})^2:          {t*1e3:7.2f} ms", flush=True)

    # one full production iteration for the total
    from mesheditor_tpu.solve.eigs import _init_stage, _iter_stage

    s0, ks0, ms0, a0, b0, th0, c0 = jax.block_until_ready(_init_stage(ops, x))
    sig_d = jnp.asarray(abs(sigma), jnp.float64)

    def one_iter(s, ks, ms, a, b, c):
        return _iter_stage(ops, shifted, pre, s, ks, ms, a, b, c,
                           pre.rigid, pre.m_rigid, 10, sig_d, refresh=False, lock=0)

    t = timeit(one_iter, s0, ks0, ms0, a0, b0, c0, n=3)
    print(f"FULL _iter_stage:            {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
