"""Interactive validation: LOBPCG vs scipy shift-invert eigsh on a small bar."""

import os, sys, time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import mesheditor_tpu  # noqa
from mesheditor_tpu.fem import (
    assemble_element_matrices, build_quad_mesh, filter_degenerate, pencil_diagonals,
)
from mesheditor_tpu.mesh import bar_tets
from mesheditor_tpu.solve.lobpcg import lobpcg_pencil
from mesheditor_tpu.types import AcousticMaterialProperties

import scipy.sparse as sp
import scipy.sparse.linalg as spla

nx, ny, nz = (int(x) for x in (sys.argv[1:4] if len(sys.argv) > 3 else (8, 2, 2)))
nev = int(sys.argv[4]) if len(sys.argv) > 4 else 20
inner = int(sys.argv[5]) if len(sys.argv) > 5 else 24

mesh = bar_tets(0.3, 0.05, 0.05, nx, ny, nz)
mat = AcousticMaterialProperties(1000, 1e7, 0.0)
kept = filter_degenerate(mesh.points, mesh.tets)
quad = build_quad_mesh(kept, mesh.points.shape[0])
ops = assemble_element_matrices(mesh.points, kept, mat, quad)
n = ops.n_dofs
print(f"tets={kept.shape[0]} quad_nodes={quad.node_count} n_dofs={n}")

# scipy oracle: CSR from element blocks
dofs = np.asarray(ops.elem_dofs)
kb = np.asarray(ops.k_blocks)
mb = np.asarray(ops.rho_vol)[:, None, None] * np.asarray(ops.m_unit)[None]
rows = np.repeat(dofs, 30, axis=1).reshape(-1)
cols = np.tile(dofs, (1, 30)).reshape(-1)
K = sp.coo_matrix((kb.reshape(-1), (rows, cols)), shape=(n, n)).tocsc()
M = sp.coo_matrix((mb.reshape(-1), (rows, cols)), shape=(n, n)).tocsc()
sigma = -((2 * np.pi * 20.0) ** 2)
t0 = time.time()
vals_ref = spla.eigsh(K, k=nev, M=M, sigma=sigma, which="LM", return_eigenvectors=False)
vals_ref = np.sort(vals_ref)
print(f"scipy eigsh: {time.time()-t0:.2f}s")

kd, md = pencil_diagonals(ops)
t0 = time.time()
res = lobpcg_pencil(
    ops.kmat, ops.mmat, kd, md, n, nev, sigma=sigma, tol=1e-8, max_iters=200, inner_iters=inner
)
print(f"lobpcg: {time.time()-t0:.2f}s iters={res.iterations} ops={res.op_applications}")
if res.eigenvalues.size == 0:
    print("LOBPCG FAILED to converge")
    sys.exit(1)
lam = res.eigenvalues
# Compare frequencies (sqrt of positive eigenvalues)
f_ref = np.sqrt(np.maximum(vals_ref, 0)) / (2 * np.pi)
f_got = np.sqrt(np.maximum(lam, 0)) / (2 * np.pi)
audible = f_ref > 20
rel = np.abs(f_got - f_ref) / np.maximum(f_ref, 1e-9)
print("freqs ref:", np.round(f_ref[audible][:10], 2))
print("freqs got:", np.round(f_got[audible][:10], 2))
print(f"max rel freq err (audible): {rel[audible].max():.2e}")
print(f"rigid eigenvalues got: {lam[:6]}")
