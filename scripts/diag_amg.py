"""Inner-solve quality comparison: additive two-level vs multiplicative V(1,1).

For the bench pencil, measures the blocked-PCG residual reduction after k inner
iterations under each preconditioner cycle, on a residual-shaped RHS (A applied to a
random panel, rigid components deflated — the shape the eigensolver actually feeds
the inner solve).
"""
import sys; sys.path.insert(0, "/root/repo")
import dataclasses
import time

import jax, jax.numpy as jnp, numpy as np
from mesheditor_tpu.mesh import box_tets
from mesheditor_tpu.materials import CERAMIC
from mesheditor_tpu.fem.assembly import (
    assemble_element_matrices, filter_degenerate, pencil_diagonals, bake_shifted_f32,
)
from mesheditor_tpu.fem.quad_mesh import build_quad_mesh
from mesheditor_tpu.solve.amg import build_amg
from mesheditor_tpu.solve import lobpcg as L

mesh = box_tets((0.3, 0.16, 0.15), (18, 10, 9))
kept = filter_degenerate(mesh.points, mesh.tets)
quad = build_quad_mesh(kept, mesh.points.shape[0])
ops = assemble_element_matrices(mesh.points, kept, CERAMIC.properties, quad)
n = ops.n_dofs
k_diag, m_diag = pencil_diagonals(ops)
sigma = -((2 * np.pi * 20.0) ** 2)
amg = build_amg(mesh.points, kept, quad, ops, k_diag, m_diag, sigma)
shifted = bake_shifted_f32(ops, sigma)
p = 64
key = jax.random.PRNGKey(1)
x_true = jax.random.normal(key, (n, p), dtype=jnp.float32)
# Residual-shaped RHS: deflate rigid, apply A.
xd = x_true - amg.rigid @ (amg.rigid.T @ (ops.mmat_f32(x_true)))


@jax.jit
def make_rhs(xd):
    with jax.default_matmul_precision("highest"):
        return shifted.amat(xd)


b = make_rhs(xd)
b0 = float(jnp.linalg.norm(b))


@jax.jit
def resid(x):
    with jax.default_matmul_precision("highest"):
        return jnp.linalg.norm(b - shifted.amat(x)) / b0


for cycle in ("additive", "v11"):
    pc = dataclasses.replace(amg, cycle=cycle)
    for k in (4, 8, 16):
        pcg = jax.jit(lambda bb, pc=pc, k=k: L._pcg_block(shifted.amat, pc, bb, k))
        t0 = time.perf_counter()
        x = pcg(b)
        r = float(resid(x))
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            x = pcg(b)
        r = float(resid(x))
        dt = (time.perf_counter() - t0) / 3
        print(f"{cycle:9s} k={k:3d}  |r|/|b|={r:9.3e}  {dt*1e3:8.1f} ms", flush=True)
