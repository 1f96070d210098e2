"""Per-stage wall profile of the production eigensolver at bench shapes on the TPU.

Times each component of one outer iteration (applies, AMG, PCG, Grams, CholQR, RR fold,
recombinations) to locate the wall. Diagnostic for the round-4 perf work.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu import SolverConfig
from mesheditor_tpu.fem import assemble_element_matrices, build_quad_mesh, filter_degenerate
from mesheditor_tpu.fem.assembly import bake_shifted_f32
from mesheditor_tpu.materials import CERAMIC
from mesheditor_tpu.mesh import box_tets
from mesheditor_tpu.solve.amg import build_amg
from mesheditor_tpu.solve.eigs import _chol_qr_m, _init_stage, _iter_stage, gram64c
from mesheditor_tpu.solve.lobpcg import _pcg_block, _precise
from mesheditor_tpu.fem.assembly import pencil_diagonals

mesh = box_tets((0.3, 0.16, 0.15), (18, 10, 9))
cfg = SolverConfig(num_modes=256, num_fem_modes=256, max_mode_freq=48_000.0, tolerance=1e-6)
kept = filter_degenerate(mesh.points, mesh.tets)
quad = build_quad_mesh(kept, mesh.points.shape[0])
ops = assemble_element_matrices(mesh.points, kept, CERAMIC.properties, quad)
n = ops.n_dofs
sigma = -((2 * np.pi * 20.0) ** 2)
k_diag, m_diag = pencil_diagonals(ops)
precond = build_amg(mesh.points, kept, quad, ops, k_diag, m_diag, sigma)
shifted = bake_shifted_f32(ops, sigma)
print(f"n={n} E={kept.shape[0]} nagg={precond.nagg} cycle={precond.cycle}")

p = 271 - precond.rigid.shape[1]  # elastic panel width as in the bench solve
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((n, p)), jnp.float32)
s3 = jnp.asarray(rng.standard_normal((n, 3 * p)), jnp.float32)


def t(name, fn, *args, reps=10, **kw):
    r = jax.block_until_ready(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args, **kw)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:8.2f} ms")
    return dt


@jax.jit
@_precise
def one_amat(shifted, x):
    return shifted.amat(x)


@jax.jit
@_precise
def one_kmmat(ops, x):
    return ops.kmmat_f32(x)


@jax.jit
@_precise
def one_amg(precond, shifted, x):
    return precond.apply(shifted.amat, x)


from functools import partial


@partial(jax.jit, static_argnames=("iters",))
@_precise
def pcg16(shifted, precond, b, iters=16):
    return _pcg_block(shifted.amat, precond, b, iters)


@jax.jit
@_precise
def one_gram(a, b):
    return gram64c(a, b)


@jax.jit
@_precise
def one_cholqr(w, mw, kw):
    return _chol_qr_m(w, mw, kw)


@jax.jit
@_precise
def one_recombine(s, c):
    return s @ c


from mesheditor_tpu.solve.eigs import _rr_fold


@partial(jax.jit, static_argnames=("p_want",))
@_precise
def one_rr(a, b, p_want, hint):
    return _rr_fold(a, b, p_want, hint)


d_apply = t("amat (E,30,30) f32 panel", one_amat, shifted, x)
t("kmmat_f32 fused K+M", one_kmmat, ops, x)
d_amg = t("AMG precond apply", one_amg, precond, shifted, x)
d_pcg = t("PCG 16 iters", pcg16, shifted, precond, x, reps=3)
a_g = jnp.asarray(rng.standard_normal((n, 3 * p)), jnp.float32)
d_gram = t("gram64c (n,3p)x(n,3p)", one_gram, s3, a_g)
w = jnp.asarray(rng.standard_normal((n, p)), jnp.float32)
d_qr = t("chol_qr_m (2 passes)", one_cholqr, w, w * 1.01, w * 0.99)
c_f64 = jnp.asarray(rng.standard_normal((3 * p, p)))
d_rec = t("recombine s3 @ c (f32)", one_recombine, s3, c_f64.astype(jnp.float32)[:, :p] * 0)
a_r = np.asarray(rng.standard_normal((3 * p, 3 * p)))
a_r = a_r @ a_r.T + 3 * p * np.eye(3 * p)
b_r = np.eye(3 * p) + 1e-6 * a_r / np.abs(a_r).max()
d_rr = t("_rr_fold (3p)^2 device RR", one_rr, jnp.asarray(a_r), jnp.asarray(b_r), p,
         jnp.asarray(100.0), reps=3)

# full iteration for comparison
rigid = precond.rigid
m_rigid = precond.m_rigid
s, ks, ms, a, b, theta, c = jax.block_until_ready(_init_stage(ops, x))
args = (ops, shifted, precond, s, ks, ms, a, b, c, rigid, m_rigid)
d_it = t("FULL _iter_stage (16 inner)", lambda: _iter_stage(*args, 16, jnp.asarray(abs(sigma))), reps=3)

print("\napprox budget: pcg={:.0f} grams~3x{:.0f} qr~2x{:.0f} rr={:.0f} recombine~6x{:.0f} kmmat~2x? sum_check={:.0f} vs full={:.0f} (ms)".format(
    d_pcg * 1e3, d_gram * 1e3, d_qr * 1e3, d_rr * 1e3, d_rec * 1e3,
    (d_pcg + 3 * d_gram + 2 * d_qr + d_rr + 6 * d_rec) * 1e3, d_it * 1e3))
