"""Isolate the torus inner-PCG divergence: f32 vs f64 apply, Jacobi-only vs AMG,
omega sweep, and symmetry/definiteness of the preconditioner."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu.fem import (
    assemble_element_matrices, build_quad_mesh, filter_degenerate, pencil_diagonals,
)
from mesheditor_tpu.fem.assembly import bake_shifted_f32
from mesheditor_tpu.materials import CERAMIC
from mesheditor_tpu.mesh import torus_surface
from mesheditor_tpu.mesh.cdt import generate_tets_delaunay
from mesheditor_tpu.solve.amg import build_amg, AmgPrecond
from mesheditor_tpu.solve.lobpcg import _pcg_block, _precise

pts, tris = torus_surface(0.06, 0.025)
h = float(np.max(pts.max(0) - pts.min(0))) / 24
tm = generate_tets_delaunay(pts, tris, lattice_h=h)
kept = filter_degenerate(tm.points, tm.tets)
quad = build_quad_mesh(kept, tm.points.shape[0])
ops = assemble_element_matrices(tm.points, kept, CERAMIC.properties, quad)
n = ops.n_dofs
sigma = -((2 * np.pi * 20.0) ** 2)
k_diag, m_diag = pencil_diagonals(ops)
pre = build_amg(tm.points, kept, quad, ops, k_diag, m_diag, sigma)
shifted = bake_shifted_f32(ops, sigma)
print(f"n={n} nagg={pre.nagg} omega={pre.omega:.4f}", flush=True)

from functools import partial

rng = np.random.default_rng(0)
b32 = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)


@partial(jax.jit, static_argnames=("iters",))
@_precise
def pcg_resid32(shifted, pre, b, iters):
    x = _pcg_block(shifted.amat, pre, b, iters)
    r = b - shifted.amat(x)
    return jnp.sqrt(jnp.einsum("np,np->p", r, r) / jnp.einsum("np,np->p", b, b))


def show(tag, arr):
    a = np.asarray(arr)
    print(f"{tag}: {' '.join(f'{v:.2e}' for v in a)}", flush=True)


# 1. Jacobi-only preconditioner (omega * inv_diag), f32
jac = pre.inv_diag * jnp.float32(pre.omega)
show("PCG16 f32 jacobi-only", pcg_resid32(shifted, jac, b32, 16))

# 2. full AMG additive, f32 (the production path)
show("PCG16 f32 amg", pcg_resid32(shifted, pre, b32, 16))

# 3. coarse-only (no jacobi term): is the coarse correction the amplifier?
pre_c = AmgPrecond(agg6=pre.agg6, w=pre.w, ac_inv=pre.ac_inv,
                   inv_diag=jnp.zeros_like(pre.inv_diag), rigid=pre.rigid,
                   m_rigid=pre.m_rigid, omega=1.0, nagg=pre.nagg, mc=pre.mc)
show("PCG16 f32 coarse-only", pcg_resid32(shifted, pre_c, b32, 16))

# 4. f64 apply with the same f32 preconditioner pieces
@partial(jax.jit, static_argnames=("iters",))
@_precise
def pcg_resid64(ops, pre, b, iters):
    sig = jnp.float64(sigma)

    def amat64(x):
        return (ops.kmat(x.astype(jnp.float64))
                - sig * ops.mmat(x.astype(jnp.float64))).astype(jnp.float64)

    def precond(r):
        z = pre.apply(lambda y: amat64(y).astype(jnp.float64), r.astype(jnp.float32))
        return z.astype(jnp.float64)

    x = _pcg_block(amat64, precond, b.astype(jnp.float64), iters)
    r = b - amat64(x)
    return jnp.sqrt(jnp.einsum("np,np->p", r, r) / jnp.einsum("np,np->p", b, b))


show("PCG16 f64 amg", pcg_resid64(ops, pre, b32, 16))

# 5. symmetry check of the preconditioner in f32: z = B r; <z1, r2> vs <r1, z2>
r1 = jnp.asarray(rng.standard_normal((n, 1)), jnp.float32)
r2 = jnp.asarray(rng.standard_normal((n, 1)), jnp.float32)


@jax.jit
@_precise
def sym_check(shifted, pre, r1, r2):
    z1 = pre.apply(shifted.amat, r1)
    z2 = pre.apply(shifted.amat, r2)
    a = jnp.einsum("np,np->", z1, r2)
    b = jnp.einsum("np,np->", r1, z2)
    return a, b


a, b = sym_check(shifted, pre, r1, r2)
print(f"symmetry: <Br1,r2>={float(a):.6e} <r1,Br2>={float(b):.6e} "
      f"rel diff={abs(float(a)-float(b))/max(abs(float(a)),1e-30):.2e}", flush=True)

# 6. definiteness probe: <r, B r> for a few random r
@jax.jit
@_precise
def def_check(shifted, pre, r):
    z = pre.apply(shifted.amat, r)
    return jnp.einsum("np,np->p", z, r)


show("definiteness <r,Br> (should be >0)", def_check(shifted, pre, jnp.asarray(
    rng.standard_normal((n, 6)), jnp.float32)))

# 7. conditioning probe: lambda_max of shifted pencil via power iteration on D^-1 A
d = np.asarray(k_diag - sigma * m_diag)
print(f"shifted diag: min={d.min():.3e} max={d.max():.3e} ratio={d.max()/d.min():.2e}",
      flush=True)
