"""Generalized block eigensolver for the FEM pencil (K, M), TPU-native.

Replaces the reference's sparse-Cholesky shift-invert Lanczos / warm-started subspace
iteration (src/audio/mesh2modes.cpp:329-512, CholeskyShiftInvert.cpp) with LOBPCG on the
pencil: no sparse factorization exists on TPU, so the shift-invert role moves into the
preconditioner — a fixed-iteration Jacobi-PCG solve of (K - sigma*M) z = r, with the same
negative shift sigma = -(2*pi*min_freq)^2 that keeps the operator positive definite.

Split of labor (the TPU-idiomatic shape of the algorithm):
- DEVICE (jitted, panel-sized): all operator applications — element-form K/M matvecs
  (batched 30x30 matmuls + segment-sum), the blocked PCG preconditioner, panel
  projections/normalizations, and the 3p x 3p Gram matrices.
- HOST (numpy/LAPACK, O(p^3)): the reduced Rayleigh-Ritz eigenproblem. The backend's own
  eigh (a QDWH-style iteration) returns NaNs on RR matrices whose spectrum mixes a
  converged near-zero cluster with 1e8-scale values, and the TPU runtime here has no host
  callbacks — so the small dense solve lives between the two jitted stages instead. The
  traffic is only the Gram matrices down and the (3p, p) recombination weights up.

Compile discipline: the jitted stages are MODULE-LEVEL functions taking the element
operators, diagonals, and shift as arguments — jax.jit caches on function identity, so
closures defined inside the solver recompiled ~23 s of XLA programs on EVERY solve (the
xprof trace showed 4 backend_compile calls per warm run). Module-level stages compile
once per shape for the process lifetime. A closure-based fallback remains for callers
that pass bare kmat/mmat callables without an ElementOperators-style op_state.

Panels stay on device across the whole solve; K X and M X are carried through the
recombination (ks @ c, ms @ c) so each iteration applies the pencil only to the W and P
blocks. Warm starts seed the panel with a prior basis, reproducing the reference's
SolveReuse semantics (mesh2modes.h:63-68).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class LobpcgResult:
    eigenvalues: np.ndarray  # (nev,), ascending; empty when convergence failed
    # (n, nev), M-orthonormal. A DEVICE array on success: at corpus scale the full
    # basis is ~100 MB and the tunnel runs ~10 MB/s, so callers gather the rows they
    # need on device (mode shapes are a handful of rows) and only download the full
    # basis when they keep it (warm starts).
    eigenvectors: object
    iterations: int = 0
    op_applications: int = 0  # pencil matvec panels applied (K or K-sigma*M)
    residual_norms: Optional[np.ndarray] = None


def _col_dots(a, b):
    return jnp.einsum("np,np->p", a, b)


def _pcg_block(apply_a, precond, b, iters):
    """Fixed-iteration preconditioned CG for A X = B, columns independent, X0 = 0.
    `precond` maps residual panels to preconditioned panels (Jacobi by default;
    element-by-element additive Schwarz when the caller provides one)."""
    if not callable(precond):  # backward compatibility: an inv-diagonal array
        inv_diag = precond
        precond = lambda r: inv_diag[:, None] * r  # noqa: E731
    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rz = _col_dots(r, z)

    def body(_, carry):
        x, r, p, rz = carry
        ap = apply_a(p)
        p_ap = _col_dots(p, ap)
        alpha = jnp.where(p_ap > 0, rz / jnp.where(p_ap == 0, 1.0, p_ap), 0.0)
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * ap
        z = precond(r)
        rz_new = _col_dots(r, z)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        p = z + beta[None, :] * p
        return x, r, p, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rz))
    return x


def _solve_reduced(a: np.ndarray, b: np.ndarray, p_want: int):
    """Host Rayleigh-Ritz: lowest p_want Ritz pairs of the reduced pencil (a, b).

    Whitens by b's eigendecomposition with a loose cutoff (whitening by 1/sqrt of a
    barely-alive Gram eigenvalue amplifies noise into the spectrum); masked directions get
    a scale-relative above-spectrum penalty so they sort past the wanted window while
    LAPACK never sees values spanning hundreds of orders of magnitude. Returns
    (theta (p_want,), c (q, p_want)) with c B-orthonormal on live directions."""
    a = 0.5 * (a + a.T)
    b = 0.5 * (b + b.T)
    bw, bu = np.linalg.eigh(b)
    b_max = max(float(np.abs(bw).max()), 1e-300)
    good = bw > 1e-8 * b_max
    inv_sqrt = np.where(good, 1.0 / np.sqrt(np.where(good, bw, 1.0)), 0.0)
    w = bu * inv_sqrt[None, :]
    h = w.T @ a @ w
    h = 0.5 * (h + h.T)
    penalty = 10.0 * float(np.abs(h).max()) + 1.0
    h[np.diag_indices_from(h)] += np.where(good, 0.0, penalty)
    theta, q = np.linalg.eigh(h)
    c = w @ q
    return theta[:p_want], np.ascontiguousarray(c[:, :p_want])


def _normalize_cols(block, mb):
    """Scale columns to unit M-norm; columns with no mass become exact zeros."""
    cn = _col_dots(block, mb)
    live = cn > 1e-300
    d = jnp.where(live, 1.0 / jnp.sqrt(jnp.where(live, cn, 1.0)), 0.0)
    return block * d[None, :], mb * d[None, :]


# ---- module-level jitted stages (the ElementOperators fast path) ----


@jax.jit
def _ops_init_stage(ops, x):
    mx = ops.mmat(x)
    x, mx = _normalize_cols(x, mx)
    kx = ops.kmat(x)
    a = x.T @ kx
    b = x.T @ mx
    return x, kx, mx, a, b


@partial(jax.jit, static_argnames=("inner_iters",))
def _ops_fused_stage(ops, s_in, ks_in, ms_in, cu, theta_up, inv_diag_f32, sigma_f32,
                     inner_iters):
    """Recombine + step in ONE dispatch, with ONE significant packed upload.

    cu (3p, p) carries the Rayleigh-Ritz weights c (X = S c); theta_up (p,) f64
    rides alongside (KB-scale). The momentum weights are DERIVED on device — c_wp
    is c with the X-block rows zeroed (exactly the host-side c_wp[:p] = 0) —
    halving the upload (the tunnel's host->device path runs ~1-2 MB/s, so upload
    width is wall-clock). On the first iteration those rows are all of c's support,
    so P is exactly zero and the projection masks retire it."""
    p = cu.shape[1]
    c = cu.astype(s_in.dtype)
    theta = theta_up.astype(s_in.dtype)
    c_wp = jnp.where((jnp.arange(c.shape[0]) >= p)[:, None], c, 0.0)
    x = s_in @ c
    kx = ks_in @ c
    mx = ms_in @ c
    pdir = s_in @ c_wp
    kp_in = ks_in @ c_wp
    mp_in = ms_in @ c_wp
    # Residuals of the current Ritz pairs; preconditioned residuals form W.
    r = kx - mx * theta[None, :]
    res_norm = jnp.sqrt(_col_dots(r, r))

    # Mixed precision: the inner solve is only a preconditioner, so it runs in f32 on
    # the MXU (orders of magnitude faster than TPU's emulated f64); the outer pencil
    # products and Rayleigh-Ritz stay f64, which is where the 0.1% parity lives.
    def apply_shifted(xx):
        return ops.kmat_f32(xx) - sigma_f32 * ops.mmat_f32(xx)

    w = _pcg_block(apply_shifted, inv_diag_f32, r.astype(jnp.float32),
                   inner_iters).astype(r.dtype)
    # Project W M-orthogonal to X (X is M-orthonormal by construction). Columns that
    # collapse below 1e-7 of their pre-projection M-norm are numerically inside span(X)
    # — orthonormalizing them would amplify cancellation noise into the trial space
    # (the post-convergence NaN failure mode), so they zero out instead. The
    # pre-projection norm is only that dead-column heuristic, so the cheap f32
    # operator serves it.
    mw_pre = ops.mmat_f32(w.astype(jnp.float32)).astype(w.dtype)
    pre2 = _col_dots(w, mw_pre)
    w = w - x @ (mx.T @ w)
    mw = ops.mmat(w)
    post2 = _col_dots(w, mw)
    live = post2 > 1e-14 * jnp.maximum(pre2, 1e-300)
    w = jnp.where(live[None, :], w, 0.0)
    mw = jnp.where(live[None, :], mw, 0.0)
    w, mw = _normalize_cols(w, mw)
    kw = ops.kmat(w)

    # P is a linear combination of the previous S, so its K/M products arrived from
    # the recombination GEMMs — projection and normalization are linear and update
    # them consistently: the pencil is NEVER applied to P.
    kp = kp_in
    mp = mp_in
    pre2p = _col_dots(pdir, mp)
    q = mx.T @ pdir
    pdir_o = pdir - x @ q
    mp = mp - mx @ q
    kp = kp - kx @ q
    post2p = _col_dots(pdir_o, mp)
    livep = post2p > 1e-14 * jnp.maximum(pre2p, 1e-300)
    pdir_o = jnp.where(livep[None, :], pdir_o, 0.0)
    mp = jnp.where(livep[None, :], mp, 0.0)
    kp = jnp.where(livep[None, :], kp, 0.0)
    cn = _col_dots(pdir_o, mp)
    livec = cn > 1e-300
    d = jnp.where(livec, 1.0 / jnp.sqrt(jnp.where(livec, cn, 1.0)), 0.0)
    pdir_o = pdir_o * d[None, :]
    mp = mp * d[None, :]
    kp = kp * d[None, :]

    # W/P cross-correlations are absorbed by the host whitening, not projected here.
    s = jnp.concatenate([x, w, pdir_o], axis=1)
    ks = jnp.concatenate([kx, kw, kp], axis=1)
    ms = jnp.concatenate([mx, mw, mp], axis=1)
    a = s.T @ ks
    b = s.T @ ms
    # b only whitens, so f32 transfer is plenty (1e-7 on ~unit values). a stays f64.
    return s, ks, ms, a, b.astype(jnp.float32), res_norm


@jax.jit
def _recombine(s, ks, ms, c2):
    # K X / M X (and K P / M P) carry through the linear recombination — the pencil
    # is only ever applied to the W block. f32 weights perturb the basis by ~1e-7
    # within the same subspace, which the f64 Rayleigh-Ritz corrects.
    c = c2[0].astype(s.dtype)
    c_wp = c2[1].astype(s.dtype)
    return s @ c, ks @ c, ms @ c, s @ c_wp, ks @ c_wp, ms @ c_wp


@jax.jit
def _ops_refresh(ops, x):
    return ops.kmat(x), ops.mmat(x)


@jax.jit
def _pad_basis(x, kx, mx):
    z = jnp.zeros((x.shape[0], 2 * x.shape[1]), x.dtype)
    return (jnp.concatenate([x, z], 1), jnp.concatenate([kx, z], 1),
            jnp.concatenate([mx, z], 1))


@jax.jit
def _rebuild(x, kx, mx, pdir, kp, mp):
    z = jnp.zeros_like(x)
    return (jnp.concatenate([x, pdir, z], 1), jnp.concatenate([kx, kp, z], 1),
            jnp.concatenate([mx, mp, z], 1))


def lobpcg_pencil(
    kmat: Callable,
    mmat: Callable,
    k_diag: jax.Array,
    m_diag: jax.Array,
    n: int,
    nev: int,
    *,
    op_state=None,
    kmat_pc=None,
    mmat_pc=None,
    sigma: float,
    x0: Optional[np.ndarray] = None,
    guard: int = 15,
    tol: float = 1e-8,
    max_iters: int = 100,
    inner_iters: int = 24,
    refresh_every: int = 25,
    seed: int = 20260710,
    callback: Optional[Callable[[int, int], bool]] = None,
) -> LobpcgResult:
    """Lowest `nev` eigenpairs of K x = lambda M x.

    kmat/mmat apply the operators to (n, p) panels as kmat(op_state, x) when `op_state`
    is given (the element arrays thread through the jitted stages as real arguments —
    closure-captured device arrays would be baked into the HLO as constants, bloating
    compiles and memory), or kmat(x) when not. `sigma` (negative) shifts the
    preconditioner pencil. `x0` (n, >=1) seeds the leading panel columns (warm start).
    Convergence mirrors the reference's settling criterion (SubspaceIterate,
    mesh2modes.cpp:403-410): the leading prefix of pairs whose relative eigenvalue change
    (against max(|lambda|, |sigma|)) stays under `tol`. `callback(iteration, settled)` may
    return True to cancel — an empty result, the JobMonitor contract of the reference.

    When `op_state` exposes kmat/mmat/kmat_f32/mmat_f32 (ElementOperators), the solver
    uses the module-level compiled stages (no per-solve recompilation); otherwise it
    builds closure-based stages around the given callables (recompiled per call).
    """
    p = min(nev + guard, n)
    dtype = k_diag.dtype

    inv_diag = 1.0 / (k_diag - sigma * m_diag)
    inv_diag_f32 = inv_diag.astype(jnp.float32)
    sigma_f32 = jnp.float32(sigma)

    fast = (op_state is not None and kmat_pc is not None
            and all(hasattr(op_state, a)
                    for a in ("kmat", "mmat", "kmat_f32", "mmat_f32")))

    if fast:
        init_stage_f = _ops_init_stage

        def fused_f(ops, s, ks, ms, cu, theta_up):
            return _ops_fused_stage(ops, s, ks, ms, cu, theta_up, inv_diag_f32,
                                    sigma_f32, inner_iters)

        refresh_f = _ops_refresh
    else:
        # Legacy closure path: generic callables; recompiles per lobpcg_pencil call.
        if op_state is None:
            _kmat = lambda ops, x: kmat(x)  # noqa: E731
            _mmat = lambda ops, x: mmat(x)  # noqa: E731
        else:
            _kmat, _mmat = kmat, mmat

        if kmat_pc is not None:
            def precond(ops, r):
                def apply_shifted(x):
                    return kmat_pc(ops, x) - sigma_f32 * mmat_pc(ops, x)

                z = _pcg_block(apply_shifted, inv_diag_f32, r.astype(jnp.float32),
                               inner_iters)
                return z.astype(r.dtype)
        else:
            def precond(ops, r):
                def apply_shifted(x):
                    return _kmat(ops, x) - sigma * _mmat(ops, x)

                return _pcg_block(apply_shifted, inv_diag, r, inner_iters)

        @jax.jit
        def init_stage_f(ops, x):
            mx = _mmat(ops, x)
            x, mx = _normalize_cols(x, mx)
            kx = _kmat(ops, x)
            return x, kx, mx, x.T @ kx, x.T @ mx

        @jax.jit
        def fused_f(ops, s_in, ks_in, ms_in, cu, theta_up):
            c = cu.astype(s_in.dtype)
            theta = theta_up.astype(s_in.dtype)
            c_wp = jnp.where((jnp.arange(c.shape[0]) >= p)[:, None], c, 0.0)
            x = s_in @ c
            kx = ks_in @ c
            mx = ms_in @ c
            pdir = s_in @ c_wp
            kp = ks_in @ c_wp
            mp = ms_in @ c_wp
            r = kx - mx * theta[None, :]
            res_norm = jnp.sqrt(_col_dots(r, r))
            w = precond(ops, r)
            if kmat_pc is not None:
                mw_pre = mmat_pc(ops, w.astype(jnp.float32)).astype(w.dtype)
            else:
                mw_pre = _mmat(ops, w)
            pre2 = _col_dots(w, mw_pre)
            w = w - x @ (mx.T @ w)
            mw = _mmat(ops, w)
            post2 = _col_dots(w, mw)
            live = post2 > 1e-14 * jnp.maximum(pre2, 1e-300)
            w = jnp.where(live[None, :], w, 0.0)
            mw = jnp.where(live[None, :], mw, 0.0)
            w, mw = _normalize_cols(w, mw)
            kw = _kmat(ops, w)
            pre2p = _col_dots(pdir, mp)
            q = mx.T @ pdir
            pdir_o = pdir - x @ q
            mp = mp - mx @ q
            kp = kp - kx @ q
            post2p = _col_dots(pdir_o, mp)
            livep = post2p > 1e-14 * jnp.maximum(pre2p, 1e-300)
            pdir_o = jnp.where(livep[None, :], pdir_o, 0.0)
            mp = jnp.where(livep[None, :], mp, 0.0)
            kp = jnp.where(livep[None, :], kp, 0.0)
            cn = _col_dots(pdir_o, mp)
            livec = cn > 1e-300
            d = jnp.where(livec, 1.0 / jnp.sqrt(jnp.where(livec, cn, 1.0)), 0.0)
            pdir_o = pdir_o * d[None, :]
            mp = mp * d[None, :]
            kp = kp * d[None, :]
            s = jnp.concatenate([x, w, pdir_o], axis=1)
            ks = jnp.concatenate([kx, kw, kp], axis=1)
            ms = jnp.concatenate([mx, mw, mp], axis=1)
            return s, ks, ms, s.T @ ks, (s.T @ ms).astype(jnp.float32), res_norm

        @jax.jit
        def refresh_f(ops, x):
            return _kmat(ops, x), _mmat(ops, x)

    # Upload dtype for the weights: f32 validated; f16 opt-in (halves the upload;
    # basis perturbation ~1e-3 stays inside the subspace, which the f64 Rayleigh-Ritz
    # re-optimizes each iteration).
    c_up_dtype = np.float16 if os.environ.get("MESHEDITOR_TPU_C16") else np.float32

    from .. import profile

    # Seed: warm basis columns, then fixed-seed gaussian fill (same determinism discipline
    # as the reference's SubspaceIterate rng seed, mesh2modes.cpp:354).
    with profile.scope("eig/init"):
        key = jax.random.PRNGKey(seed)
        x = jax.random.normal(key, (n, p), dtype=dtype)
        if x0 is not None and x0.size:
            seeded = min(x0.shape[1], p)
            x = x.at[:, :seeded].set(jnp.asarray(x0[:, :seeded], dtype=dtype))

        x, kx, mx, a, b = init_stage_f(op_state, x)
        theta_np, c_np = _solve_reduced(np.asarray(a), np.asarray(b), p)
        # Enter the fused (n, 3p) block layout once: basis columns beyond X are zero,
        # as are their c rows, so the first fused iteration recombines exactly [X c | 0].
        s, ks, ms = _pad_basis(x, kx, mx)
        cu = np.zeros((3 * p, p))
        cu[:p] = c_np
        cu = cu.astype(c_up_dtype)
        theta_up = theta_np
    ops = 3  # init + recombined products
    prev = np.full(p, np.inf)
    iterations = 0
    res_norm = None

    for it in range(max_iters):
        with profile.scope("eig/fused_stage"):
            s, ks, ms, a_d, b32, res_norm = fused_f(
                op_state, s, ks, ms, jnp.asarray(cu), jnp.asarray(theta_up)
            )
            if profile.enabled:
                jax.block_until_ready(a_d)
        ops += 2 + 2 * inner_iters
        with profile.scope("eig/transfer_down"):
            a_h, b_h32 = jax.device_get((a_d, b32))
        with profile.scope("eig/host_rr"):
            theta_np, c_np = _solve_reduced(a_h, b_h32.astype(np.float64), p)
        iterations = it + 1
        lam = theta_np
        if not np.isfinite(lam[:nev]).all():
            # Numerical breakdown is a failed solve, like the reference's empty-modes path.
            return LobpcgResult(np.zeros(0), np.zeros((n, 0)), iterations, ops)
        # P's weights (the LOBPCG momentum) are derived on device from cu: rows [:p]
        # zeroed — identical to the former host-side c_wp.
        cu = c_np.astype(c_up_dtype)
        theta_up = theta_np
        refreshed = refresh_every and (it + 1) % refresh_every == 0
        if refreshed:
            # Shed recombination drift: materialize X/P, reapply the pencil to X, and
            # re-enter the block layout with selection weights. The derived-momentum
            # packing cannot express an independent P selection, so the iteration
            # right after a refresh runs without momentum (a steepest-descent step)
            # — refreshes are rare (every `refresh_every`), the cost is one slightly
            # weaker step.
            c_wp = c_np.copy()
            c_wp[:p, :] = 0.0
            c2 = np.stack([c_np, c_wp]).astype(np.float32)
            x, kx, mx, pdir, kp, mp = _recombine(s, ks, ms, jnp.asarray(c2))
            kx, mx = refresh_f(op_state, x)
            s, ks, ms = _rebuild(x, kx, mx, pdir, kp, mp)
            cu = np.zeros((3 * p, p))
            cu[:p] = np.eye(p)
            cu = cu.astype(c_up_dtype)
            ops += 2

        delta = np.abs(lam[:nev] - prev[:nev])
        rel = delta / np.maximum(np.abs(lam[:nev]), abs(sigma))
        # Near-zero (rigid-body) eigenvalues carry Rayleigh-Ritz noise of order
        # eps * spectrum_width, which can hover exactly at the relative tolerance and
        # stall the settling criterion forever; an absolute floor scaled to the wanted
        # window marks them settled (the exact-factorization reference never sees this).
        window = max(float(np.abs(lam[:nev]).max()), abs(sigma))
        ok = (rel < tol) | (delta < 1e-9 * window)
        prev = lam
        settled = 0  # leading prefix of settled pairs
        for v in ok:
            if v:
                settled += 1
            else:
                break
        if os.environ.get("MESHEDITOR_TPU_DEBUG_EIG"):
            j = settled if settled < nev else nev - 1
            print(
                f"[eig] it={iterations} settled={settled}/{nev} "
                f"blocker: lam={lam[j]:.6e} delta={delta[j]:.3e} rel={rel[j]:.3e} "
                f"window={window:.3e}",
                flush=True,
            )
        if callback is not None and callback(iterations, settled):
            return LobpcgResult(np.zeros(0), np.zeros((n, 0)), iterations, ops)
        if settled >= nev:
            if refreshed:
                # s was rebuilt to [X|P|0] this iteration; X is selected directly.
                sel = np.zeros((3 * p, p), np.float32)
                sel[:p] = np.eye(p)
                c2 = np.stack([sel, np.zeros_like(sel)])
            else:
                c2 = np.stack([c_np, np.zeros_like(c_np)]).astype(np.float32)
            x_out, _, _, _, _, _ = _recombine(s, ks, ms, jnp.asarray(c2))
            return LobpcgResult(
                lam[:nev].copy(),
                x_out[:, :nev],  # device-resident; see LobpcgResult
                iterations,
                ops,
                residual_norms=np.asarray(res_norm)[:nev],
            )
    # Convergence failed: empty eigenvalues, like the reference (mesh2modes.cpp:399,479).
    return LobpcgResult(np.zeros(0), np.zeros((n, 0)), iterations, ops)
