"""Honest (lazy-tunnel-safe) per-stage timings of the eigensolver at bench scale.

Every measurement warms + forces a fetch first, then times a CHAIN of n_iter calls
ending in one scalar fetch — per-call dispatch overlaps exactly like the real loop.
"""
import sys; sys.path.insert(0, "/root/repo")
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
p = 271
print(f"n={n} E={ops.elem_dofs.shape[0]} p={p}", flush=True)
x32 = jax.random.normal(jax.random.PRNGKey(0), (n, p), dtype=jnp.float32)


def fetch(tree):
    jax.device_get(jax.tree_util.tree_leaves(tree)[0].ravel()[0])


def chain(label, body, init, n_iter=6):
    s = body(init)
    fetch(s)
    s = init
    t0 = time.perf_counter()
    for _ in range(n_iter):
        s = body(s)
    fetch(s)
    print(f"{label:40s} {(time.perf_counter() - t0) / n_iter * 1e3:9.1f} ms", flush=True)


ksplit = jax.jit(lambda x: ops.kmat_split(x).astype(jnp.float32))
chain("kmat_split (n,271) f32->f64", ksplit, x32)
amat = jax.jit(lambda x: shifted.amat(x))
chain("amat f32 (n,271)", amat, x32)
amg_apply = jax.jit(lambda x: amg.apply(shifted.amat, x))
chain("amg.apply (n,271)", amg_apply, x32)
pcg = jax.jit(lambda b: L._pcg_block(shifted.amat, amg, b, 16))
chain("pcg 16 inner (amg)", pcg, x32)

# full f32 iteration: stage + rr chained like the real loop
c0 = jnp.concatenate(
    [jnp.eye(p), jnp.zeros((2 * p, p))], 0).astype(jnp.float64)
s0 = jnp.concatenate([x32, jnp.zeros_like(x32), jnp.zeros_like(x32)], 1)
eps_b = jnp.asarray(1e-5, jnp.float64)
hint = jnp.asarray(0.0, jnp.float64)


sig_d = jnp.asarray(abs(sigma), jnp.float64)


def stage_only(carry):
    s, c = carry
    s2, a, b, _, _ = L._f32_iter_stage(ops, shifted, s, c, amg, 16, sig_d)
    return s2, c


chain("f32_iter_stage accurate (16 inner)", stage_only, (s0, c0), n_iter=4)

# Real (consistent) Grams for the carry chain: one accurate stage provides them.
_, a0, b0, _, _ = L._f32_iter_stage(ops, shifted, s0, c0, amg, 16, sig_d)


def stage_carry(carry):
    s, c = carry
    s2, a, b = L._f32_iter_stage_carry(ops, shifted, s, c, a0, b0, amg, 16)
    return s2, c


chain("f32_iter_stage carry (16 inner)", stage_carry, (s0, c0), n_iter=4)


def full_iter(carry):
    s, c, a, b = carry
    s2, a2, b2 = L._f32_iter_stage_carry(ops, shifted, s, c, a, b, amg, 16)
    th, c2 = L._rr_device(a2, b2, p, eps_b, hint)
    return s2, c2, a2, b2


chain("carry iter + rr_device", full_iter, (s0, c0, a0, b0), n_iter=4)

# polish stage (f64 panels)
s64 = s0.astype(jnp.float64)
ks64 = ops.kmat(s64)
ms64 = ops.mmat(s64)
th0 = jnp.zeros(p, jnp.float64)


def pol(carry):
    s, ks, ms = carry
    s2, ks2, ms2, a, b, _ = L._polish_stage(ops, shifted, s, ks, ms, c0, th0, amg, 16)
    return s2, ks2, ms2


chain("polish_stage (16 inner)", pol, (s64, ks64, ms64), n_iter=3)
