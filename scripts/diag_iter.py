"""Per-piece wall timing of the ortho-engine iteration at bench scale: applies, PCG,
CholQR, Grams, Rayleigh-Ritz — tells us where the ~700 ms per outer iteration goes."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mesheditor_tpu import SolverConfig
from mesheditor_tpu.fem.assembly import (
    assemble_element_matrices, bake_shifted_f32, filter_degenerate, pencil_diagonals,
)
from mesheditor_tpu.fem.quad_mesh import build_quad_mesh
from mesheditor_tpu.materials import CERAMIC
from mesheditor_tpu.mesh import box_tets
from mesheditor_tpu.solve.amg import build_amg
from mesheditor_tpu.solve import eigs
from mesheditor_tpu.solve.lobpcg import _pcg_block


def timeit(label, fn, *args, n=10, **kwargs):
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:48s} {dt * 1e3:9.3f} ms", flush=True)
    return out, dt


def main():
    mesh = box_tets((0.3, 0.16, 0.15), (18, 10, 9))
    cfg = SolverConfig(num_modes=256, num_fem_modes=256, max_mode_freq=48_000.0,
                       tolerance=1e-6)
    kept = filter_degenerate(mesh.points, mesh.tets)
    quad = build_quad_mesh(kept, mesh.points.shape[0])
    ops = assemble_element_matrices(mesh.points, kept, CERAMIC.properties, quad)
    n = ops.n_dofs
    sigma = -((2 * np.pi * cfg.min_mode_freq) ** 2)
    k_diag, m_diag = pencil_diagonals(ops)
    precond = build_amg(mesh.points, kept, quad, ops, k_diag, m_diag, sigma)
    shifted = bake_shifted_f32(ops, sigma)
    p = cfg.num_fem_modes + 15 - precond.rigid.shape[1]
    print(f"n={n} p={p} 3p={3*p} E={kept.shape[0]}", flush=True)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, p), dtype=jnp.float32)
    x = eigs.smooth_panel(shifted, precond, x)
    s, ks, ms, a0, b0, theta, c = eigs._init_stage(ops, x)
    jax.block_until_ready(s)
    sig_d = jnp.asarray(abs(sigma), jnp.float64)

    r = jax.random.normal(key, (n, p), dtype=jnp.float32)

    with jax.default_matmul_precision("highest"):
        timeit("kmmat_f32 (fused K/M pair, p)", jax.jit(ops.kmmat_f32), x)
        timeit("mmat_f32 (p)", jax.jit(ops.mmat_f32), x)
        timeit("amat (shifted, p)", jax.jit(shifted.amat), x)
        timeit("amg.apply (p)", jax.jit(lambda r: precond.apply(shifted.amat, r)), r)
        timeit("pcg_block 16 iters", jax.jit(lambda r: _pcg_block(shifted.amat, precond, r, 16)), r)
        timeit("recombine s@c (one)", jax.jit(lambda s, c: s @ c.astype(jnp.float32)), s, c)
        timeit("gram64c (3p x 3p)", jax.jit(eigs.gram64c), s, ks)
        timeit("chol_qr_m (p block)", jax.jit(eigs._chol_qr_m), r, r, r)
        timeit("rr_fold (3p)", jax.jit(lambda a, b: eigs._rr_fold(a, b, p, jnp.float64(1e10))), a0, b0, n=5)
        timeit("eigh f32 (3p)", jax.jit(lambda g: jnp.linalg.eigh(g.astype(jnp.float32))),
               a0, n=5)
        timeit("full _iter_stage", lambda: eigs._iter_stage(
            ops, shifted, precond, s, ks, ms, a0, b0, c, precond.rigid,
            precond.m_rigid, 16, sig_d, refresh=False), n=5)
        timeit("full _iter_stage refresh", lambda: eigs._iter_stage(
            ops, shifted, precond, s, ks, ms, a0, b0, c, precond.rigid,
            precond.m_rigid, 16, sig_d, refresh=True), n=5)


if __name__ == "__main__":
    main()
