"""Diagnose LOBPCG convergence: per-iteration eigenvalue error vs scipy reference."""

import os, sys, time

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
import scipy.sparse as sp
import scipy.sparse.linalg as spla

nx, ny, nz, nev, inner, iters = 8, 2, 2, 20, 24, 60
if len(sys.argv) > 1:
    nx, ny, nz, nev, inner, iters = (int(v) for v in sys.argv[1:7])

mesh = bar_tets(0.3, 0.05, 0.05, nx, ny, nz)
mat = AcousticMaterialProperties(1000, 1e7, 0.0)
kept = filter_degenerate(mesh.points, mesh.tets)
quad = build_quad_mesh(kept, mesh.points.shape[0])
ops = assemble_element_matrices(mesh.points, kept, mat, quad)
n = ops.n_dofs
print(f"n_dofs={n}", flush=True)

dofs = np.asarray(ops.elem_dofs)
kb = np.asarray(ops.k_blocks)
mb = np.asarray(ops.rho_vol)[:, None, None] * np.asarray(ops.m_unit)[None]
rows = np.repeat(dofs, 30, axis=1).reshape(-1)
cols = np.tile(dofs, (1, 30)).reshape(-1)
K = sp.coo_matrix((kb.reshape(-1), (rows, cols)), shape=(n, n)).tocsc()
M = sp.coo_matrix((mb.reshape(-1), (rows, cols)), shape=(n, n)).tocsc()
sigma = -((2 * np.pi * 20.0) ** 2)
vals_ref = np.sort(spla.eigsh(K, k=nev, M=M, sigma=sigma, which="LM", return_eigenvectors=False))
print("ref lam[6:10]:", vals_ref[6:10], flush=True)

kd, md = pencil_diagonals(ops)
p = min(nev + 15, n)
inv_diag = 1.0 / (kd - sigma * md)

def apply_shifted(x):
    return ops.kmat(x) - sigma * ops.mmat(x)

def precond(r):
    return L._pcg_block(apply_shifted, inv_diag, r, inner)

key = jax.random.PRNGKey(20260710)
x = jax.random.normal(key, (n, p), dtype=jnp.float64)
mx = ops.mmat(x)
x, mx = L._m_orthonormalize(x, mx)
kx = ops.kmat(x)
theta, c = L._rayleigh_ritz(x, kx, mx, p)
x = x @ c
pdir = jnp.zeros_like(x)
t0 = time.time()
for it in range(iters):
    mx = ops.mmat(x)
    kx = ops.kmat(x)
    r = kx - mx * theta[None, :]
    rn = np.asarray(jnp.sqrt(L._col_dots(r, r)) / jnp.sqrt(L._col_dots(kx, kx)))
    w = precond(r)
    w = w - x @ (mx.T @ w)
    mw = ops.mmat(w)
    w, mw = L._m_orthonormalize(w, mw)
    kw = ops.kmat(w)
    pdir_o = pdir - x @ (mx.T @ pdir) - w @ (mw.T @ pdir)
    mp = ops.mmat(pdir_o)
    pdir_o, mp = L._m_orthonormalize(pdir_o, mp)
    if it == 0:
        pdir_o = jnp.zeros_like(pdir_o)
        mp = jnp.zeros_like(mp)
    kp = ops.kmat(pdir_o)
    s = jnp.concatenate([x, w, pdir_o], axis=1)
    ks = jnp.concatenate([kx, kw, kp], axis=1)
    ms = jnp.concatenate([mx, mw, mp], axis=1)
    theta_new, c = L._rayleigh_ritz(s, ks, ms, p)
    x = s @ c
    pdir = s @ c.at[:p, :].set(0.0)
    theta = theta_new
    lam = np.asarray(theta)[:nev]
    err = np.abs(lam - vals_ref) / np.maximum(np.abs(vals_ref), abs(sigma))
    if it % 5 == 0 or it == iters - 1:
        print(
            f"it={it:3d} t={time.time()-t0:6.1f}s lam_err max={err.max():.2e} "
            f"med={np.median(err):.2e} res[nev-1]={rn[nev-1]:.2e}",
            flush=True,
        )
print("done", flush=True)
