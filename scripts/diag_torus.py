"""Diagnose eigensolver convergence on the quickstart torus CDT pencil (VERDICT r3 #1b).

Builds the torus exactly as the README quickstart does, then measures:
- element volume spread + aggregate size stats (mesh irregularity),
- Jacobi damping omega and rho(D^-1 A) (global smoother health),
- inner-PCG residual contraction on a random panel (preconditioner quality),
- per-column outer residuals after a few iterations.
"""
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
from mesheditor_tpu.solve.amg import build_amg
from mesheditor_tpu.solve.lobpcg import _pcg_block, _precise

pts, tris = torus_surface(0.06, 0.025)
lo, hi = pts.min(0), pts.max(0)
h = float(np.max(hi - lo)) / 24
tm = generate_tets_delaunay(pts, tris, lattice_h=h)
print(f"torus: {tm.tets.shape[0]} tets, {tm.points.shape[0]} pts")

kept = filter_degenerate(tm.points, tm.tets)
quad = build_quad_mesh(kept, tm.points.shape[0])
ops = assemble_element_matrices(tm.points, kept, CERAMIC.properties, quad)
n = ops.n_dofs
print(f"n_dofs={n} E={kept.shape[0]}")

v = tm.points[kept]
r3 = v[:, 1:] - v[:, :1]
vol = np.abs(np.einsum("ei,ei->e", r3[:, 0], np.cross(r3[:, 1], r3[:, 2]))) / 6
print(f"element volume: min={vol.min():.3e} med={np.median(vol):.3e} max={vol.max():.3e} "
      f"ratio={vol.max()/vol.min():.1e}")

# element quality: circumradius-ish via edge lengths
edges = []
for i in range(4):
    for j in range(i + 1, 4):
        edges.append(np.linalg.norm(v[:, i] - v[:, j], axis=1))
lmax = np.max(edges, axis=0)
qual = vol / lmax**3
print(f"vol/lmax^3 (shape quality): min={qual.min():.2e} med={np.median(qual):.2e}")

sigma = -((2 * np.pi * 20.0) ** 2)
k_diag, m_diag = pencil_diagonals(ops)
t0 = time.perf_counter()
pre = build_amg(tm.points, kept, quad, ops, k_diag, m_diag, sigma)
print(f"build_amg {time.perf_counter()-t0:.1f}s nagg={pre.nagg} omega={pre.omega:.4f}")

agg = np.asarray(pre.agg6[:, 0] // 6)
sizes = np.bincount(agg, minlength=pre.nagg)
print(f"aggregate sizes: min={sizes.min()} med={np.median(sizes):.0f} max={sizes.max()}")

shifted = bake_shifted_f32(ops, sigma)

from functools import partial


@partial(jax.jit, static_argnames=("iters",))
@_precise
def pcg_resid(shifted, pre, b, iters):
    x = _pcg_block(shifted.amat, pre, b, iters)
    r = b - shifted.amat(x)
    return jnp.sqrt(jnp.einsum("np,np->p", r, r)) / jnp.sqrt(jnp.einsum("np,np->p", b, b))


rng = np.random.default_rng(0)
b = jnp.asarray(rng.standard_normal((n, 8)), jnp.float32)
for iters in (4, 8, 16):
    rr = np.asarray(pcg_resid(shifted, pre, b, iters))
    print(f"inner PCG {iters:2d} iters: relative residual per col "
          f"min={rr.min():.2e} max={rr.max():.2e}")

# ALSO: smooth rhs (what the outer iteration actually feeds: preconditioned residuals)
smooth = pre.apply(shifted.amat, b)
smooth = smooth / np.sqrt(np.asarray(jnp.einsum("np,np->p", smooth, smooth)))[None, :]
for iters in (8, 16):
    rr = np.asarray(pcg_resid(shifted, pre, jnp.asarray(smooth), iters))
    print(f"inner PCG {iters:2d} iters (smooth rhs): min={rr.min():.2e} max={rr.max():.2e}")
