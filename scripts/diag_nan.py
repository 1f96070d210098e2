"""Pinpoint the first NaN in the LOBPCG iteration (current step flow)."""

import os, sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import mesheditor_tpu  # noqa
import jax, jax.numpy as jnp
from mesheditor_tpu.fem import (
    assemble_element_matrices, build_quad_mesh, filter_degenerate, pencil_diagonals,
)
from mesheditor_tpu.mesh import bar_tets
import mesheditor_tpu.solve.lobpcg as L
from mesheditor_tpu.types import AcousticMaterialProperties

mesh = bar_tets(0.3, 0.05, 0.05, 8, 2, 2)
mat = AcousticMaterialProperties(1000, 1e7, 0.0)
kept = filter_degenerate(mesh.points, mesh.tets)
quad = build_quad_mesh(kept, mesh.points.shape[0])
ops = assemble_element_matrices(mesh.points, kept, mat, quad)
n = ops.n_dofs
kd, md = pencil_diagonals(ops)
sigma = -((2 * np.pi * 20.0) ** 2)
nev, p, inner = 20, 35, 24
inv_diag = 1.0 / (kd - sigma * md)

def apply_shifted(x):
    return ops.kmat(x) - sigma * ops.mmat(x)

def precond(r):
    return L._pcg_block(apply_shifted, inv_diag, r, inner)

def chk(name, arr):
    a = np.asarray(arr)
    bad = ~np.isfinite(a)
    if bad.any():
        print(f"  !! {name}: {bad.sum()}/{a.size} non-finite", flush=True)
        return True
    return False

def project_clean(block, x, mx, extra=None, extra_m=None, tag=""):
    mb = ops.mmat(block)
    pre2 = L._col_dots(block, mb)
    block = block - x @ (mx.T @ block)
    if extra is not None:
        block = block - extra @ (extra_m.T @ block)
    mb = ops.mmat(block)
    post2 = L._col_dots(block, mb)
    live = post2 > 1e-14 * jnp.maximum(pre2, 1e-300)
    print(f"  {tag}: live={int(np.asarray(live).sum())}/{live.shape[0]} pre2 range "
          f"[{float(jnp.min(pre2)):.1e},{float(jnp.max(pre2)):.1e}] post2 min {float(jnp.min(post2)):.1e}", flush=True)
    block = jnp.where(live[None, :], block, 0.0)
    mb = jnp.where(live[None, :], mb, 0.0)
    ob, omb = L._m_orthonormalize(block, mb)
    chk(f"{tag} ortho", ob)
    return ob, omb

key = jax.random.PRNGKey(20260710)
x = jax.random.normal(key, (n, p), dtype=jnp.float64)
mx = ops.mmat(x)
x, mx = L._m_orthonormalize(x, mx)
kx = ops.kmat(x)
theta, c = L._rayleigh_ritz(x, kx, mx, p)
x = x @ c
pdir = jnp.zeros_like(x)
for it in range(10):
    print(f"iter {it}", flush=True)
    mx = ops.mmat(x)
    kx = ops.kmat(x)
    if chk("x", x):
        break
    r = kx - mx * theta[None, :]
    w = precond(r)
    if chk("w=precond(r)", w):
        break
    w, mw = project_clean(w, x, mx, tag="w")
    kw = ops.kmat(w)
    pdir_o, mp = project_clean(pdir, x, mx, extra=w, extra_m=mw, tag="p")
    if it == 0:
        pdir_o = jnp.zeros_like(pdir_o); mp = jnp.zeros_like(mp)
    kp = ops.kmat(pdir_o)
    s = jnp.concatenate([x, w, pdir_o], axis=1)
    ks = jnp.concatenate([kx, kw, kp], axis=1)
    ms = jnp.concatenate([mx, mw, mp], axis=1)
    theta_new, c = L._rayleigh_ritz(s, ks, ms, p)
    if chk("theta_new", theta_new):
        b = np.asarray(s.T @ ms)
        print("  B eigs:", np.linalg.eigvalsh(0.5*(b+b.T))[[0,1,-1]], flush=True)
        a = np.asarray(s.T @ ks)
        print("  A finite:", np.isfinite(a).all(), " A max", np.abs(a).max(), flush=True)
        break
    x = s @ c
    pdir = s @ c.at[:p, :].set(0.0)
    theta = theta_new
    lam = np.asarray(theta)
    print(f"  ok theta[6:9]={lam[6:9]}", flush=True)
print("done", flush=True)
