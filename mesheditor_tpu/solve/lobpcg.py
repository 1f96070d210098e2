"""Generalized block eigensolver for the FEM pencil (K, M), TPU-native.

Replaces the reference's sparse-Cholesky shift-invert Lanczos / warm-started subspace
iteration (src/audio/mesh2modes.cpp:329-512, CholeskyShiftInvert.cpp) with LOBPCG on the
pencil: no sparse factorization exists on TPU, so the shift-invert role moves into the
preconditioner — a fixed-iteration Jacobi-PCG solve of (K - sigma*M) z = r, with the same
negative shift sigma = -(2*pi*min_freq)^2 that keeps the operator positive definite.

Two-stage mixed precision (the TPU-idiomatic shape of the algorithm):

1. **f32 subspace stage** — the whole LOBPCG iteration runs in float32 on device:
   element-form operator panels, the blocked PCG preconditioner (on ONE prebaked
   A = K - sigma*M block array), the 3p-basis Gram matrices, and the Rayleigh-Ritz
   reduced eigensolve itself (jnp.linalg.eigh after guarded whitening). One dispatch per
   iteration; the only host traffic is the (p,) Ritz values for the settling check, and
   that download is pipelined one iteration behind the device. f32 Rayleigh-Ritz noise is
   ~eps32 * lambda_max, so this stage converges the SUBSPACE to f32 accuracy, not the
   eigenvalues to solver tolerance.

   The pencil is applied FRESH to every block of [X | W | P] each iteration — K/M
   products are never carried through the Rayleigh-Ritz recombination. Carrying them
   (the round-1 design) is catastrophically wrong in f32: recombining low-Rayleigh-
   quotient Ritz vectors out of high-energy basis columns cancels ~theta_max/theta
   digits, so carried K S drifted ~1e-3 relative after ONE iteration on a stiff ceramic
   pencil, making the (a, b) Gram pair mutually inconsistent — Rayleigh-Ritz then
   produces huge spurious NEGATIVE Ritz values (the pencil is PSD) that hijack the sort
   and the iteration diverges. Fresh application costs 4 extra p-panel matvecs per
   iteration on top of the inner PCG's ~16 and buys Grams that are exact-to-eps32
   functions of the actual basis.

2. **f64 polish stage** — a [X | W] block Rayleigh-Ritz refinement in float64 over the
   f32-converged basis: residuals and Gram matrices in f64 (eigenvalue error is quadratic
   in the remaining subspace error, so a couple of iterations recover full f64-grade
   values), with the preconditioner still running f32 on the MXU. This is where the 0.1%
   reference-parity gate (and the reference's 1e-8 default tolerance,
   src/audio/mesh2modes.h:17-26) is actually enforced: the settling criterion of the
   reference's SubspaceIterate (mesh2modes.cpp:403-410) runs here on f64 Ritz values.

Everything stays device-resident across the whole solve — basis panels, recombination
weights, Gram matrices, and both reduced eigensolves. The host sees only (p,)-sized Ritz
value vectors. (The axon tunnel uploads at ~1-2 MB/s, so any per-iteration panel or
weight upload would dominate wall-clock; the round-1 design that shipped Gram matrices to
a host LAPACK Rayleigh-Ritz spent ~0.7 s/iteration on that alone.)

Compile discipline: the jitted stages are MODULE-LEVEL functions taking the element
operators, diagonals, and shift as arguments — jax.jit caches on function identity, so
closures defined inside the solver would recompile on every solve. A closure-based f64
fallback remains for callers that pass bare kmat/mmat callables without an
ElementOperators op_state.

Warm starts seed the f32 panel with a prior basis, reproducing the reference's
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


def _tiny(dtype):
    return 1e-300 if dtype == jnp.float64 else 1e-30


def _gram64(s, ks):
    """Gram matrix of f32 panels, accumulated in f64.

    An f32 accumulation of s.T @ K s carries absolute noise ~sqrt(q)*eps32*lambda_max,
    which for stiff pencils (ceramic, lambda_max ~ 1e15-16) is 1e9+ — the size of (or
    far above) the entire audible eigenvalue window, and the whitening in the reduced
    solve amplifies it further into spurious negative Ritz values that hijack the sort.
    f64 accumulation pins the Gram to the representation accuracy of the f32 panels
    themselves; at (n, 3p) panel sizes the emulated-f64 matmul is one ~n*(3p)^2 MAC
    pass, small next to the inner PCG's element matvecs."""
    return jnp.einsum("ni,nj->ij", s, ks, preferred_element_type=jnp.float64)


def _live_eps(dtype):
    # Projection-survival threshold: a W/P column whose M-norm collapses below
    # sqrt(eps) of its pre-projection norm is numerically inside span(X); keeping it
    # would amplify cancellation noise into the trial space.
    return 1e-14 if dtype == jnp.float64 else 1e-8


def _pcg_block(apply_a, precond, b, iters):
    """Fixed-iteration preconditioned CG for A X = B, columns independent, X0 = 0.
    `precond` maps residual panels to preconditioned panels: a bare array is an
    inverse diagonal (Jacobi), an AmgPrecond is the additive two-level cycle."""
    from .amg import AmgPrecond

    if isinstance(precond, AmgPrecond):
        amg = precond
        precond = lambda r: amg.apply(apply_a, r)  # noqa: E731
    elif not callable(precond):  # an inv-diagonal array
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
    """Host Rayleigh-Ritz (legacy closure path): lowest p_want Ritz pairs of (a, b).

    Whitens by b's eigendecomposition with a loose cutoff (whitening by 1/sqrt of a
    barely-alive Gram eigenvalue amplifies noise into the spectrum); masked directions get
    a scale-relative above-spectrum penalty so they sort past the wanted window while
    LAPACK never sees values spanning hundreds of orders of magnitude."""
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


# ---- TPU matmul precision ----
#
# JAX's DEFAULT dot precision on TPU routes f32 matmuls through the MXU at
# bf16-CLASS input precision (~2^-8 relative). The audio/render paths are designed
# for that; the eigensolver is NOT: recombining the basis (x = s @ c) at bf16
# precision contaminates a converged low-theta column with ~1e-3 of every other
# basis column, and the fresh f64 Rayleigh quotient then reads
# ~(1e-3)^2 * theta_max ~ 1e7+ for what should be a near-zero rigid-body mode —
# the iteration can never settle (observed exactly this on a v5e: lam[0] ~ 1e7 and
# rising for 64 iterations on the bench box, while the identical program converges
# on CPU where f32 dots are exact). Every jitted solver stage therefore traces
# under "highest" matmul precision: full-f32 MXU passes for f32 panels (~6x the
# bf16 MAC count — microseconds against the gather/segment-sum-bound matvecs) and
# unchanged emulated-f64 dots for f64 panels. The inner PCG preconditioner rides
# along; its quality only gates convergence RATE, but the extra passes are noise
# next to its gather traffic.
def _precise(fn):
    """Trace `fn` under full-f32 matmul precision (see note above)."""
    from functools import wraps

    @wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper


def _refine_sym(g, v, passes=2, cluster_rel=1e-5):
    """First-order eigenvector refinement of approximate eigenvectors `v` of the
    symmetric f64 matrix `g` — the device-RR's precision workhorse.

    TPU has fast f32 eigh and NO practical f64 eigh (software-emulated, minutes at
    800^2), but f64 MATMULS are fine — and eigenvector error is first-order
    correctable by pure matmuls: with E = v^T g v, the Sylvester correction
    dv_j = sum_i v_i E_ij / (E_jj - E_ii) squares the error per pass (eps32-grade
    f32 eigh vectors reach ~eps32^2 in two passes). Near-degenerate pairs are
    guarded out (cluster_rel): rotations inside an eigenvalue cluster are
    physically arbitrary, and dividing by their gap would amplify noise instead of
    fixing it. `v` must span the FULL basis being refined (the correction lives in
    span(v)); columns are renormalized each pass.

    Why this exists: the fold-RR's f32 eigh leaves ~eps32 * kappa_local mixing in
    the recombination weights, which re-injects high-Rayleigh-quotient directions
    into converged columns every iteration — measured as the f32 loop flooring at
    rel ~ 7e-3 while the same loop under a host f64 LAPACK RR reaches 4e-6 and
    keeps going. Two refinement passes (+ ~30 ms of f64 matmuls) buy the host-RR
    floor without the ~1 s/iteration tunnel round-trip."""
    k = v.shape[1]
    eye_mask = 1.0 - jnp.eye(k, dtype=v.dtype)

    def one(v, _):
        gv = g @ v
        e = v.T @ gv
        lam = jnp.diagonal(e)
        den = lam[None, :] - lam[:, None]
        mag = jnp.abs(lam)[None, :] + jnp.abs(lam)[:, None]
        ok = jnp.abs(den) > cluster_rel * mag + 1e-300
        x = jnp.where(ok, e / jnp.where(ok, den, 1.0), 0.0) * eye_mask
        # ZERO (never clip) corrections outside first-order validity: a large X_ij
        # means the pair is an effective cluster whose returned basis is an
        # arbitrary rotation — E_ij ~ den * O(1) — and "correcting" by a clipped
        # +-0.5 injects an O(1) wrong-direction mix (measured: clipping REGRESSED
        # the f32 loop floor from 8e-3 to 8e-2 on the bench box, whose symmetry
        # packs the spectrum with near-degenerate pairs).
        x = jnp.where(jnp.abs(x) > 0.1, 0.0, x)
        v = v + v @ x
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=0, keepdims=True), 1e-300)
        return v, None

    v, _ = jax.lax.scan(one, v, None, length=passes)
    return v


@partial(jax.jit, static_argnames=("p_want",))
@_precise
def _rr_device(a, b, p_want: int, eps_b, s_hint):
    """Device Rayleigh-Ritz via SPECTRAL FOLD — no f64 eigh anywhere.

    The direct approach (whiten b, f64 eigh of the whitened h) is numerically right but
    physically impossible on TPU: f64 eigh is software-emulated and a single 800^2
    factorization runs for MINUTES (measured: >580 s at 813^2 on v5e — it is an
    iterative algorithm whose every sweep pays the emulation tax). f32 eigh is fast
    (~40 ms at 813^2) but cannot see the wanted spectrum: h's norm is the basis's worst
    Rayleigh quotient (~1e16 for stiff ceramic pencils) while the audible window ends
    ~1e10, so eigh's absolute backward error eps32*||h|| (~1e9) swamps every wanted
    eigenvalue.

    The fold flips that conditioning. Everything EXPENSIVE stays f32/fast; everything
    f64 is Cholesky/matmul-shaped (tens of ms emulated — direct algorithms, unlike
    eigh):

      1. whiten b by its f32 eigh (b has unit-M-norm columns; it is O(1)-conditioned
         apart from near-dependent directions, which are cut at eps_b and parked by a
         diagonal penalty far above the window)
      2. h = w^T a w in f64; fold g = (h + s*I)^{-1} by f64 Cholesky + triangular solve
      3. f32 eigh of g: the wanted (lowest-theta) modes are now the LARGEST eigenvalues
         mu = 1/(theta+s), at the top of g's spectrum where f32's eps32*||g|| absolute
         noise is RELATIVELY small. High-lambda junk mixes into the selection at
         amplitude ~eps32*(theta+s)/s — with s at the top of the wanted window, ~1e-6.
      4. a SECOND fold inside the selected p_want-dim window (now spanning only
         ~[sigma, 1e10]) with s2 at the window's geometric mean re-resolves the
         low-frequency end that the wide first fold blurred.
      5. returned theta are EXACT f64 Rayleigh quotients of the actual returned
         columns (diag ratios of the projected Grams) — f64-grade settling values from
         f32 factorizations. Eigenvalue error is quadratic in the remaining subspace
         error, so these reach ~1e-7-relative floors while panels stay f32.

    s_hint is the previous iteration's top wanted Ritz value (a DEVICE scalar — it
    never crosses the tunnel); the fold shift adapts to it."""
    f64 = jnp.float64
    a = 0.5 * (a + a.T).astype(f64)
    b = 0.5 * (b + b.T).astype(f64)
    n3 = a.shape[0]
    # 1. b-whiten: f32 eigh refined to f64-grade against the f64 b (see _refine_sym —
    # unrefined f32 whitening vectors inject ~eps32 * kappa(b) errors through the
    # 1/sqrt weighting of near-cutoff directions, one of the two fold-RR noise
    # sources that floored the f32 loop).
    bu = _refine_sym(b, jnp.linalg.eigh(b.astype(jnp.float32))[1].astype(f64))
    bw = jnp.einsum("ij,ij->j", bu, b @ bu)  # fresh f64 Rayleigh quotients
    b_max = jnp.maximum(jnp.max(jnp.abs(bw)), 1e-300)
    good = bw > eps_b.astype(f64) * b_max
    inv_sqrt = jnp.where(good, jax.lax.rsqrt(jnp.where(good, bw, 1.0)), 0.0)
    w = bu * inv_sqrt[None, :]
    # 2. whitened pencil + dead-direction parking + first (wide) fold.
    h = w.T @ (a @ w)
    h = 0.5 * (h + h.T)
    hdiag_max = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(h))), 1.0)
    penalty = 10.0 * hdiag_max
    h = h + jnp.diag(jnp.where(good, 0.0, penalty))
    # Shift: at least the top wanted Ritz value, and large enough that h + s*I stays
    # positive under the f32-whitening noise floor (~eps32 * ||h||).
    s = jnp.maximum(jnp.maximum(s_hint.astype(f64), 1e-5 * hdiag_max), 1.0)
    ell = jnp.linalg.cholesky(h + s * jnp.eye(n3, dtype=f64))
    linv = jax.scipy.linalg.solve_triangular(ell, jnp.eye(n3, dtype=f64), lower=True)
    g = linv.T @ linv  # (h + s I)^{-1}
    # f32 eigh refined against the f64 fold (the second fold-RR noise source: f32
    # mixing across the selection boundary re-injected high-theta directions into
    # converged columns at ~1e-4/iteration).
    y = _refine_sym(g, jnp.linalg.eigh(g.astype(jnp.float32))[1].astype(f64))
    mu = jnp.einsum("ij,ij->j", y, g @ y)
    order1 = jnp.argsort(-mu)  # descending mu = ascending theta
    sel = y[:, order1[:p_want]]
    c1 = w @ sel
    # 3. second (window) fold over the selected subspace.
    a2 = c1.T @ (a @ c1)
    b2 = c1.T @ (b @ c1)
    a2 = 0.5 * (a2 + a2.T)
    b2 = 0.5 * (b2 + b2.T) + 1e-10 * jnp.eye(p_want, dtype=f64)
    ell2 = jnp.linalg.cholesky(b2)
    e_p = jnp.eye(p_want, dtype=f64)
    l2inv = jax.scipy.linalg.solve_triangular(ell2, e_p, lower=True)
    h2 = l2inv @ (a2 @ l2inv.T)
    h2 = 0.5 * (h2 + h2.T)
    d2 = jnp.diagonal(h2)
    d_max = jnp.maximum(jnp.max(d2), 1.0)
    d_min = jnp.maximum(jnp.min(d2), 1e-7 * d_max)
    s2 = jnp.sqrt(d_min * d_max)
    ell3 = jnp.linalg.cholesky(h2 + s2 * e_p)
    l3inv = jax.scipy.linalg.solve_triangular(ell3, e_p, lower=True)
    g2 = l3inv.T @ l3inv
    y2 = _refine_sym(g2, jnp.linalg.eigh(g2.astype(jnp.float32))[1].astype(f64))
    mu2 = jnp.einsum("ij,ij->j", y2, g2 @ y2)
    sel2 = y2[:, jnp.argsort(-mu2)]  # ascending theta
    c = c1 @ (l2inv.T @ sel2)
    # 4. exact f64 Rayleigh quotients of the actual columns; unit-b-norm; sorted.
    ac = a @ c
    bc = b @ c
    num = jnp.einsum("ij,ij->j", c, ac)
    den = jnp.einsum("ij,ij->j", c, bc)
    den = jnp.maximum(den, 1e-300)
    theta = num / den
    c = c * jax.lax.rsqrt(den)[None, :]
    order = jnp.argsort(theta)
    return theta[order], c[:, order]


def _normalize_cols(block, mb):
    """Scale columns to unit M-norm; columns with no mass become exact zeros."""
    cn = _col_dots(block, mb)
    live = cn > _tiny(block.dtype)
    d = jnp.where(live, jax.lax.rsqrt(jnp.where(live, cn, 1.0)), 0.0)
    return block * d[None, :], mb * d[None, :]


# ---- main iteration stage (module-level jitted; one dispatch per iteration) ----
#
# Panels are f32 (HBM traffic, MXU matmuls); the pencil is applied to the X block in
# f64 and to the W/P blocks in f32. Why the split works: applying K to a CONVERGED
# column cancels catastrophically — per-element products ~||K_e||*|x| sum to the tiny
# theta*M*x, a ~1e5x cancellation at FEM conditioning, so an f32 apply leaves only ~2
# digits and the X-block Gram entries (the wanted Ritz values) drown. W/P columns have
# Rayleigh quotients near lambda_max where the apply does NOT cancel, so their f32
# Grams carry eps32-relative errors; those enter the wanted Ritz values only
# quadratically over the (theta_w - theta_x ~ 1e13) gap — sub-0.1-absolute. Measured
# on a CDT ceramic cube: all-f32 Grams are 36% inconsistent (PSD violations half the
# norm); this mixed scheme is eps64-grade on the X block at ~1/3 the f64-everything
# cost (f64 emulated matmul is ~4-5x f32 on v5e).


@jax.jit
@_precise
def _f32_init_stage(ops, x):
    """Normalize the seed panel, apply the pencil (f64 on the X block), and form the
    first Gram matrices."""
    mx = ops.mmat(x.astype(jnp.float64))
    x, mx = _normalize_cols(x.astype(jnp.float64), mx)
    kx = ops.kmat(x)
    x32 = x.astype(jnp.float32)
    return x32, _gram64(x, kx), _gram64(x, mx)


@jax.jit
def _enter_block_layout(x, c):
    """Enter the (n, 3p) [X | W | P] block layout with zero W/P columns and c padded."""
    p = x.shape[1]
    z = jnp.zeros_like(x)
    s = jnp.concatenate([x, z, z], 1)
    cpad = jnp.concatenate([c, jnp.zeros((2 * p, p), c.dtype)], 0)
    return s, cpad


def _blocks_to_gram(xx, xw, xp, ww, wp, pp):
    """Assemble the symmetric (3p)^2 Gram from its six f64 blocks."""
    top = jnp.concatenate([xx, xw, xp], 1)
    mid = jnp.concatenate([xw.T, ww, wp], 1)
    bot = jnp.concatenate([xp.T, wp.T, pp], 1)
    return jnp.concatenate([top, mid, bot], 0)


@jax.jit
def _pad_gram(g):
    """Embed a (p, p) Gram in the (3p, 3p) block layout (zero W/P columns)."""
    p = g.shape[0]
    out = jnp.zeros((3 * p, 3 * p), g.dtype)
    return out.at[:p, :p].set(g)


@partial(jax.jit, static_argnames=("inner_iters",))
@_precise
def _f32_iter_stage(ops, shifted, s, c, inv_diag, inner_iters, abs_sigma):
    """One CALIBRATION LOBPCG iteration up to the Gram matrices (the device
    Rayleigh-Ritz runs as its own small program, see _rr_device): recombine [X | P]
    from the previous basis and weights, apply the pencil FRESH to X in f64, compute
    residuals with fresh Rayleigh quotients, precondition W (f32 PCG), M-project and
    normalize W and P against X, apply the pencil fresh to W and P in f32, and form
    the blockwise mixed-precision Gram matrices (see the section comment for the
    precision story).

    No K/M product survives a recombination here — recombining carried (n, p)
    products cancels ~theta_max/theta digits and leaves the Gram pair mutually
    inconsistent. (The CARRY stage below avoids that trap by carrying the (3p)^2
    GRAMS, an exact f64 congruence, never the n-dim products.) The momentum weights
    are derived on device: c_wp is c with the X-block rows zeroed.

    Returns per-column RELATIVE residuals rel = ||r|| / (||Kx|| + |sigma|*||Mx||) —
    the scale-free convergence certificate (rigid-body columns: ||Kx|| ~ 0, the
    sigma term keeps the measure finite and tiny). Eigenvalue error is quadratic in
    rel over the preconditioned gap, so rel certifies a residual-based exit that the
    f32 value-settling noise cannot."""
    c32 = c.astype(s.dtype)  # recombination weights arrive f64 from _rr_device
    p = c.shape[1]
    c_wp = jnp.where((jnp.arange(c.shape[0]) >= p)[:, None], c32, jnp.zeros_like(c32))
    x = s @ c32
    pdir = s @ c_wp

    # X block: the K apply runs f64 (it cancels ~theta_max/theta digits, see the
    # section comment) but the M apply stays f32 — the mass matrix is well-conditioned
    # (element volumes only), so M x carries eps32 RELATIVE error with no cancellation:
    # the residual picks up ~eps32*theta*|Mx| (far under the settling floor) and the
    # b-Grams eps32-relative entries, both harmless.
    mx32 = ops.mmat_f32(x)
    cn = jnp.einsum("np,np->p", x, mx32, preferred_element_type=jnp.float64)
    live = cn > _tiny(jnp.float32)
    d = jnp.where(live, jax.lax.rsqrt(jnp.where(live, cn, 1.0)), 0.0)
    x = x * d.astype(jnp.float32)[None, :]
    mx32 = mx32 * d.astype(jnp.float32)[None, :]
    x64 = x.astype(jnp.float64)
    kx = ops.kmat(x64)
    mx = mx32.astype(jnp.float64)
    theta = _col_dots(x64, kx)  # fresh f64 Rayleigh quotients; unit-M-norm columns
    r = kx - mx * theta[None, :]
    res_norm = jnp.sqrt(_col_dots(r, r))
    rel = res_norm / (
        jnp.sqrt(_col_dots(kx, kx)) + abs_sigma * jnp.sqrt(_col_dots(mx, mx)) + 1e-300
    )

    w = _pcg_block(shifted.amat, inv_diag, r.astype(jnp.float32), inner_iters)
    mw = ops.mmat_f32(w)
    pre2 = _col_dots(w, mw)
    q = mx32.T @ w
    w = w - x @ q
    mw = mw - mx32 @ q
    post2 = _col_dots(w, mw)
    live = post2 > _live_eps(w.dtype) * jnp.maximum(pre2, _tiny(w.dtype))
    w = jnp.where(live[None, :], w, 0.0)
    mw = jnp.where(live[None, :], mw, 0.0)
    w, mw = _normalize_cols(w, mw)
    kw = ops.kmat_f32(w)

    mp = ops.mmat_f32(pdir)
    pre2p = _col_dots(pdir, mp)
    qp = mx32.T @ pdir
    pdir = pdir - x @ qp
    mp = mp - mx32 @ qp
    post2p = _col_dots(pdir, mp)
    livep = post2p > _live_eps(pdir.dtype) * jnp.maximum(pre2p, _tiny(pdir.dtype))
    pdir = jnp.where(livep[None, :], pdir, 0.0)
    mp = jnp.where(livep[None, :], mp, 0.0)
    pdir, mp = _normalize_cols(pdir, mp)
    kp = ops.kmat_f32(pdir)

    s2 = jnp.concatenate([x, w, pdir], 1)
    # Cross blocks ride the f64 X-side products: a_xw = (K x)^T w is the same number
    # as x^T (K w) but computed through the accurate side.
    a = _blocks_to_gram(
        _gram64(x64, kx),
        _gram64(kx, w), _gram64(kx, pdir),
        _gram64(w, kw), _gram64(w, kp), _gram64(pdir, kp),
    )
    b = _blocks_to_gram(
        _gram64(x64, mx),
        _gram64(mx, w), _gram64(mx, pdir),
        _gram64(w, mw), _gram64(w, mp), _gram64(pdir, mp),
    )
    return s2, a, b, res_norm, rel


@partial(jax.jit, static_argnames=("inner_iters",))
@_precise
def _f32_iter_stage_carry(ops, shifted, s, c, a_prev, b_prev, inv_diag, inner_iters):
    """One CARRY LOBPCG iteration: identical subspace update to `_f32_iter_stage`, but
    the X-block Gram pair is CARRIED through the Rayleigh-Ritz recombination as an
    exact f64 congruence of the previous iteration's measured Grams —
        a_xx = d (c^T a_prev c) d,   b_xx = d (c^T b_prev c) d
    (d the fresh unit-M-norm scaling) — instead of re-measured through an emulated-f64
    pencil apply. Why this is safe where carrying (n, p) PRODUCTS was not: the
    congruence never touches n-dim vectors, so there is no theta_max/theta
    cancellation — its error is ~eps64 * p * |c|^T|a_prev||c|, i.e. eps64-grade
    RELATIVE to the Ritz values. The only f32 content entering a_xx is the panel
    noise of the recombination itself (the f32 subspace floor, which both designs
    share). Measured on the bench pencil: the emulated-f64 batched element einsum is
    ~320 ms/iteration (the MXU cannot tile (E, 30, 30) blocks, so the f64 expansion
    runs element-by-element) while this congruence is two gram-shaped f64 matmuls.

    The residual is formed from the f32 K apply — its ~1e-2-relative cancellation
    noise only pollutes the W search DIRECTION (quadratically damped over the
    preconditioned gap) and the a_x[w|p] cross blocks (second-order over the
    theta_w - theta_x ~ 1e13 gap: delta^2/gap << any wanted value). Calibration
    iterations (the accurate stage above) re-anchor the carried values every few
    steps, so drift cannot accumulate past ~recalib * eps32-grade.
    """
    c64 = c  # f64 from _rr_device
    c32 = c.astype(s.dtype)
    p = c.shape[1]
    c_wp = jnp.where((jnp.arange(c.shape[0]) >= p)[:, None], c32, jnp.zeros_like(c32))
    x = s @ c32
    pdir = s @ c_wp

    mx32 = ops.mmat_f32(x)
    cn = jnp.einsum("np,np->p", x, mx32, preferred_element_type=jnp.float64)
    live = cn > _tiny(jnp.float32)
    d = jnp.where(live, jax.lax.rsqrt(jnp.where(live, cn, 1.0)), 0.0)
    x = x * d.astype(jnp.float32)[None, :]
    mx32 = mx32 * d.astype(jnp.float32)[None, :]

    # Carried X-block Grams: exact congruence, then the fresh normalization scaling.
    axx = c64.T @ (a_prev @ c64)
    bxx = c64.T @ (b_prev @ c64)
    theta = jnp.diagonal(axx) / jnp.maximum(jnp.diagonal(bxx), _tiny(jnp.float64))
    axx = axx * d[:, None] * d[None, :]
    bxx = bxx * d[:, None] * d[None, :]

    kx32 = ops.kmat_f32(x)
    r32 = kx32 - mx32 * theta.astype(jnp.float32)[None, :]

    w = _pcg_block(shifted.amat, inv_diag, r32, inner_iters)
    mw = ops.mmat_f32(w)
    pre2 = _col_dots(w, mw)
    q = mx32.T @ w
    w = w - x @ q
    mw = mw - mx32 @ q
    post2 = _col_dots(w, mw)
    live = post2 > _live_eps(w.dtype) * jnp.maximum(pre2, _tiny(w.dtype))
    w = jnp.where(live[None, :], w, 0.0)
    mw = jnp.where(live[None, :], mw, 0.0)
    w, mw = _normalize_cols(w, mw)
    kw = ops.kmat_f32(w)

    mp = ops.mmat_f32(pdir)
    pre2p = _col_dots(pdir, mp)
    qp = mx32.T @ pdir
    pdir = pdir - x @ qp
    mp = mp - mx32 @ qp
    post2p = _col_dots(pdir, mp)
    livep = post2p > _live_eps(pdir.dtype) * jnp.maximum(pre2p, _tiny(pdir.dtype))
    pdir = jnp.where(livep[None, :], pdir, 0.0)
    mp = jnp.where(livep[None, :], mp, 0.0)
    pdir, mp = _normalize_cols(pdir, mp)
    kp = ops.kmat_f32(pdir)

    s2 = jnp.concatenate([x, w, pdir], 1)
    # Cross blocks ride the f32 X-side products; their apply noise (~1e-2 of theta_x
    # scale) enters the wanted Ritz values only as delta^2 / (theta_w - theta_x).
    a = _blocks_to_gram(
        axx,
        _gram64(kx32, w), _gram64(kx32, pdir),
        _gram64(w, kw), _gram64(w, kp), _gram64(pdir, kp),
    )
    b = _blocks_to_gram(
        bxx,
        _gram64(mx32, w), _gram64(mx32, pdir),
        _gram64(w, mw), _gram64(w, mp), _gram64(pdir, mp),
    )
    return s2, a, b


@jax.jit
@_precise
def _materialize_f64(s, c):
    return (s.astype(jnp.float64)) @ c.astype(jnp.float64)


# ---- f64 polish stage ----


@jax.jit
@_precise
def _polish_init(ops, x):
    """Pencil products and the [X | 0 | 0] block layout of the f32-converged basis, in
    f64. The f64 Rayleigh-Ritz over this basis has eigenvalue error quadratic in the
    f32 subspace error — which is what buys 0.1%-grade parity from a coarse basis."""
    mx = ops.mmat(x)
    x, mx = _normalize_cols(x, mx)
    kx = ops.kmat(x)
    a = x.T @ kx
    b = x.T @ mx
    p = x.shape[1]
    z = jnp.zeros_like(x)
    s = jnp.concatenate([x, z, z], 1)
    ks = jnp.concatenate([kx, z, z], 1)
    ms = jnp.concatenate([mx, z, z], 1)
    return s, ks, ms, a, b


@partial(jax.jit, static_argnames=("inner_iters", "w_f32"))
@_precise
def _polish_stage(ops, shifted, s, ks, ms, c, theta, inv_diag32, inner_iters,
                  w_f32=False):
    """One [X | W | P] LOBPCG refinement step in f64, up to the Gram matrices. Full
    momentum matters in the polish too: without the P block, near-zero rigid-body
    modes descend at steepest-descent rates and never settle.

    Unlike the f32 stage, K S / M S CARRY through the linear recombinations here — in
    f64 the recombination-cancellation drift is ~eps64 * (theta_max/theta) ~ 1e-11
    relative, harmless — so the expensive emulated-f64 pencil applies only to the W
    block. The correction block W is the f32-preconditioned residual (the
    preconditioner needs no precision).

    w_f32=True applies the pencil to W in f32 instead (the emulated-f64 element
    apply is ~460 ms/iteration at bench scale): W is a HIGH-Rayleigh-quotient block,
    so the f32 apply is eps32-RELATIVE accurate (no cancellation), and its Gram
    errors enter the wanted Ritz values only quadratically over the theta_w -
    theta_x gap. The deterministic eps32 rounding does add ~1e-7-relative jitter to
    the b-Grams, so this path is gated to tolerances >= 1e-7 by the caller; the K
    apply lands on the RAW preconditioned block (exactly f32-representable) and is
    carried through the projection/normalization linearly, like P."""
    c = c.astype(s.dtype)
    theta = theta.astype(s.dtype)
    p = c.shape[1]
    no_p = bool(int(os.environ.get("MESHEDITOR_TPU_POLISH_NO_P", "0")))
    c_wp = jnp.where((jnp.arange(c.shape[0]) >= p)[:, None], c, jnp.zeros_like(c))
    if no_p:
        c_wp = jnp.zeros_like(c_wp)
    x = s @ c
    kx = ks @ c
    mx = ms @ c
    pdir = s @ c_wp
    kp = ks @ c_wp
    mp = ms @ c_wp

    r = kx - mx * theta[None, :]
    res_norm = jnp.sqrt(_col_dots(r, r))

    w32 = _pcg_block(shifted.amat, inv_diag32, r.astype(jnp.float32), inner_iters)
    w = w32.astype(s.dtype)
    if w_f32:
        mw = ops.mmat_f32(w32).astype(s.dtype)
        kw_raw = ops.kmat_f32(w32).astype(s.dtype)
    else:
        mw = ops.mmat(w)
        kw_raw = None
    pre2 = _col_dots(w, mw)
    q = mx.T @ w
    w = w - x @ q
    mw = mw - mx @ q
    post2 = _col_dots(w, mw)
    live = post2 > _live_eps(w.dtype) * jnp.maximum(pre2, _tiny(w.dtype))
    w = jnp.where(live[None, :], w, 0.0)
    mw = jnp.where(live[None, :], mw, 0.0)
    cnw = _col_dots(w, mw)
    livew = cnw > _tiny(w.dtype)
    dw = jnp.where(livew, jax.lax.rsqrt(jnp.where(livew, cnw, 1.0)), 0.0)
    w = w * dw[None, :]
    mw = mw * dw[None, :]
    if w_f32:
        kw = (kw_raw - kx @ q)  # carried through the projection, like P
        kw = jnp.where(live[None, :], kw, 0.0) * dw[None, :]
    else:
        kw = ops.kmat(w)

    # P is a linear combination of the previous S; its carried products update linearly
    # through projection and normalization — the pencil is never applied to P.
    pre2p = _col_dots(pdir, mp)
    qp = mx.T @ pdir
    pdir = pdir - x @ qp
    mp = mp - mx @ qp
    kp = kp - kx @ qp
    post2p = _col_dots(pdir, mp)
    livep = post2p > _live_eps(pdir.dtype) * jnp.maximum(pre2p, _tiny(pdir.dtype))
    pdir = jnp.where(livep[None, :], pdir, 0.0)
    mp = jnp.where(livep[None, :], mp, 0.0)
    kp = jnp.where(livep[None, :], kp, 0.0)
    cn = _col_dots(pdir, mp)
    livec = cn > _tiny(pdir.dtype)
    d = jnp.where(livec, jax.lax.rsqrt(jnp.where(livec, cn, 1.0)), 0.0)
    pdir = pdir * d[None, :]
    mp = mp * d[None, :]
    kp = kp * d[None, :]

    s2 = jnp.concatenate([x, w, pdir], 1)
    ks2 = jnp.concatenate([kx, kw, kp], 1)
    ms2 = jnp.concatenate([mx, mw, mp], 1)
    a = s2.T @ ks2
    b = s2.T @ ms2
    return s2, ks2, ms2, a, b, res_norm


@jax.jit
@_precise
def _extract_x(s, c):
    return s @ c.astype(s.dtype)


def _pencil_csr(ops):
    """Scipy CSR (K, M) assembled from the element blocks, f64 on host.

    Only the small-pencil path materializes matrices; the TPU path stays element-form
    (matrix-free). COO duplicate summation does the scatter-add."""
    import scipy.sparse as sp

    ed = np.asarray(ops.elem_dofs, np.int64)  # (E, 30)
    rows = np.repeat(ed, 30, axis=1).reshape(-1)
    cols = np.tile(ed, (1, 30)).reshape(-1)
    n = ops.n_dofs
    kb = np.asarray(ops.k_blocks, np.float64).reshape(-1)
    k = sp.coo_matrix((kb, (rows, cols)), shape=(n, n)).tocsr()
    m_unit = np.asarray(ops.m_unit, np.float64)
    mb = (np.asarray(ops.rho_vol, np.float64)[:, None, None] * m_unit[None]).reshape(-1)
    m = sp.coo_matrix((mb, (rows, cols)), shape=(n, n)).tocsr()
    diag = np.arange(n)
    k = k + sp.coo_matrix((np.asarray(ops.k_fix, np.float64), (diag, diag)), shape=(n, n))
    m = m + sp.coo_matrix((np.asarray(ops.m_fix, np.float64), (diag, diag)), shape=(n, n))
    return k.tocsc(), m.tocsc()


def _small_pencil_path(ops, n, nev, p, sigma, callback) -> "LobpcgResult":
    """Host sparse shift-invert for small pencils — the exact role of the reference's
    Spectra + Cholesky path (src/audio/mesh2modes.cpp:339-428): factorize (K - sigma*M)
    once, Lanczos in the shift-inverted spectrum. Small problems are host problems: at
    a few thousand DOFs the splu factorization is milliseconds while the blocked TPU
    iteration pays fixed per-dispatch and tunnel costs per step — and the iterative
    path's preconditioner quality matters least exactly where this path is exact."""
    import scipy.sparse.linalg as spla

    k, m = _pencil_csr(ops)
    p = min(p, n - 1)
    try:
        vals, vecs = spla.eigsh(k, k=p, M=m, sigma=sigma, which="LM")
    except Exception:
        return LobpcgResult(np.zeros(0), np.zeros((n, 0)), 0, 1)
    order = np.argsort(vals)
    vals = vals[order][:nev]
    vecs = vecs[:, order][:, :nev]
    if callback is not None and callback(1, nev):
        return LobpcgResult(np.zeros(0), np.zeros((n, 0)), 1, 1)
    return LobpcgResult(vals.copy(), jnp.asarray(vecs), 1, 1,
                        residual_norms=np.zeros(nev))


def _settled_prefix(lam, prev, nev, tol, sigma, floor_rel, cluster_rel=1e-4):
    """Leading prefix of pairs whose eigenvalue settled, mirroring the reference's
    SubspaceIterate criterion (mesh2modes.cpp:403-410): relative change under tol, with
    an absolute floor scaled to the wanted window for near-zero (rigid-body) values.

    CLUSTER-AWARE: adjacent eigenvalues whose relative gap is below cluster_rel are a
    near-degenerate group (symmetric geometry — a torus carries its spectrum almost
    entirely in pairs). Rayleigh-Ritz keeps rotating inside such a group, so the
    individual values exchange by ~cluster width every iteration and NEVER settle
    per-index; the group's MEAN is rotation-invariant and converges. Physics is
    indifferent to intra-cluster assignment: the width bound keeps every member within
    cluster_rel/2 in frequency, far inside the 0.1% parity gate."""
    delta = np.abs(lam[:nev] - prev[:nev])
    denom = np.maximum(np.abs(lam[:nev]), abs(sigma))
    rel = delta / denom
    window = max(float(np.abs(lam[:nev]).max()), abs(sigma))
    ok = (rel < tol) | (delta < floor_rel * window)
    if not ok.all():
        # Cluster pass: means over maximal runs of near-equal values.
        gaps = np.abs(np.diff(lam[:nev]))
        gap_rel = gaps / np.maximum(denom[1:], 1e-300)
        same = gap_rel < cluster_rel
        start = 0
        for i in range(nev):
            last = i + 1 >= nev or not same[i]
            if last:
                if start < i or not ok[start]:  # singleton clusters keep per-index ok
                    m_now = lam[start : i + 1].mean()
                    m_prev = prev[start : i + 1].mean()
                    d = abs(m_now - m_prev)
                    c_ok = (d / max(abs(m_now), abs(sigma)) < tol) or (d < floor_rel * window)
                    if start < i and c_ok:
                        ok[start : i + 1] = True
                start = i + 1
    settled = 0
    for v in ok:
        if v:
            settled += 1
        else:
            break
    return settled, rel, delta, window


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
    precond=None,
) -> LobpcgResult:
    """Lowest `nev` eigenpairs of K x = lambda M x.

    kmat/mmat apply the operators to (n, p) panels as kmat(op_state, x) when `op_state`
    is given, or kmat(x) when not. `sigma` (negative) shifts the preconditioner pencil.
    `x0` (n, >=1) seeds the leading panel columns (warm start). Convergence mirrors the
    reference's settling criterion (SubspaceIterate, mesh2modes.cpp:403-410) on the f64
    polish Ritz values. `callback(iteration, settled)` may return True to cancel — an
    empty result, the JobMonitor contract of the reference.

    When `op_state` is an ElementOperators (kmat/mmat/kmat_f32/mmat_f32), the solver runs
    the two-stage f32-subspace + f64-polish path with module-level compiled stages;
    otherwise it falls back to a closure-based all-f64 LOBPCG around the given callables.
    """
    from ..fem.assembly import ElementOperators, bake_shifted_f32

    guard = int(os.environ.get("MESHEDITOR_TPU_GUARD", "0")) or guard
    p = min(nev + guard, n)

    # Small pencils route to the host shift-invert (exact, robust); the blocked TPU
    # iteration exists for the regime where factorization is impossible, not for
    # problems a sparse LU dispatches in milliseconds.
    small_n = int(os.environ.get("MESHEDITOR_TPU_SMALL_N", "9000"))
    if isinstance(op_state, ElementOperators) and n <= small_n:
        return _small_pencil_path(op_state, n, nev, p, sigma, callback)

    fast = isinstance(op_state, ElementOperators) and kmat_pc is not None
    if not fast:
        return _lobpcg_legacy(
            kmat, mmat, k_diag, m_diag, n, nev, op_state=op_state, kmat_pc=kmat_pc,
            mmat_pc=mmat_pc, sigma=sigma, x0=x0, guard=guard, tol=tol,
            max_iters=max_iters, inner_iters=inner_iters, refresh_every=refresh_every,
            seed=seed, callback=callback,
        )

    from .. import profile

    debug = bool(os.environ.get("MESHEDITOR_TPU_DEBUG_EIG"))
    shifted = bake_shifted_f32(op_state, sigma)
    # The inner-solve preconditioner: the caller's AMG cycle when provided (see
    # amg.build_amg), else the Jacobi inverse diagonal of the shifted pencil.
    inv_diag32 = precond if precond is not None else (
        1.0 / (k_diag - sigma * m_diag)).astype(jnp.float32)
    # f32-stage whitening cutoff: every basis column is unit-M-norm before the Grams,
    # so an honest direction carries O(1) weight in b and small eigenvalues of b are
    # near-DEPENDENCE among columns. The Grams are f64-accumulated (_gram64) so b's
    # entries are accurate to the f32 representation of the panels (~1e-6 relative);
    # directions below that are cancellation noise and whitening by 1/sqrt of them
    # would amplify Gram noise into spurious Ritz values inside the wanted window.
    eps_b32 = jnp.asarray(
        float(os.environ.get("MESHEDITOR_TPU_EPS_B", "0") or 1e-5), jnp.float64)
    eps_b64 = jnp.asarray(1e-8, jnp.float64)

    # The fold-RR settling values are EXACT f64 Rayleigh quotients of the f32 basis, so
    # the f32 stage settles directly at the caller's tolerance down to the f32-panel RQ
    # floor (~eps32 * theta relative, from f32 pencil applications inside the Grams).
    # Only tolerances below that floor need the f64-panel polish loop.
    f32_floor = 3e-7
    tol32 = max(tol, float(os.environ.get("MESHEDITOR_TPU_F32_TOL") or f32_floor))
    floor32 = 1e-7
    f32_max = min(max_iters, int(os.environ.get("MESHEDITOR_TPU_F32_MAX") or 64))
    need_polish = tol < f32_floor
    polish_max = min(max_iters, 40)

    def fail(iterations, ops_count, reason="noconv"):
        # Cancellation honors the JobMonitor contract (empty result). Numerical
        # non-convergence falls back to the host sparse shift-invert when the pencil is
        # host-feasible: the iterative path's preconditioner can stall on irregular CDT
        # meshes (heterogeneous element sizes weaken the Jacobi/PCG inner solve), and a
        # slow-but-exact answer beats an empty modal model — the reference never
        # returns empty for a healthy mesh, only for breakdowns (mesh2modes.cpp:399).
        if reason != "cancel":
            cap = int(os.environ.get("MESHEDITOR_TPU_HOST_FALLBACK_N", "120000"))
            if n <= cap:
                result = _small_pencil_path(op_state, n, nev, p, sigma, callback)
                return LobpcgResult(result.eigenvalues, result.eigenvectors,
                                    iterations + result.iterations,
                                    ops_count + result.op_applications,
                                    residual_norms=result.residual_norms)
        return LobpcgResult(np.zeros(0), np.zeros((n, 0)), iterations, ops_count)

    # Seed: exact rigid-body modes first (when an AMG preconditioner provides them —
    # its coarse correction deflates those directions, so the iteration could only
    # reach them at unpreconditioned rates; seeding them exactly makes them settled
    # from iteration one), then warm basis columns, then fixed-seed gaussian fill
    # (same determinism discipline as the reference's SubspaceIterate rng,
    # mesh2modes.cpp:354).
    from .amg import AmgPrecond

    rigid_cols = 0
    raw_fill = True  # gaussian fill columns remain (lambda_max-scale energy)
    with profile.scope("eig/f32_init"):
        key = jax.random.PRNGKey(seed)
        x = jax.random.normal(key, (n, p), dtype=jnp.float32)
        if isinstance(precond, AmgPrecond):
            rigid_cols = min(int(precond.rigid.shape[1]), p)
            x = x.at[:, :rigid_cols].set(precond.rigid[:, :rigid_cols])
        seeded = 0
        if x0 is not None and np.size(x0):
            seeded = min(x0.shape[1], p - rigid_cols)
            x = x.at[:, rigid_cols:rigid_cols + seeded].set(
                jnp.asarray(np.asarray(x0)[:, :seeded], jnp.float32))
        fill = p - rigid_cols - seeded
        raw_fill = fill > 0
        if (fill > 0 and isinstance(precond, AmgPrecond)
                and os.environ.get("MESHEDITOR_TPU_SEED_COARSE", "1") != "0"):
            # Coarse spectral seed: prolongated Ritz vectors of the AMG coarse
            # pencil replace the gaussian fill — the outer iteration starts at
            # coarse-grid accuracy instead of from noise (see amg.spectral_seed).
            from .amg import spectral_seed

            sp = spectral_seed(precond, fill, seed=seed)
            if sp is not None:
                x = x.at[:, rigid_cols + seeded:].set(sp)
                raw_fill = False

    engine = os.environ.get("MESHEDITOR_TPU_ENGINE", "ortho")
    if engine == "ortho" and isinstance(precond, AmgPrecond) and rigid_cols < nev:
        # The ortho engine (solve/eigs.py) solves the ELASTIC spectrum only: the
        # rigid-body modes are known in closed form (the AMG's M-orthonormal rigid
        # basis), so they are deflated out of the iteration and prepended to the
        # result with eigenvalue EXACTLY 0 — near-zero Ritz values have no relative
        # scale inside an f32-carried basis (they drift without bound and would block
        # the settling prefix), and exact zeros are what the postprocess contract
        # wants anyway (no negative near-rigid values leak to callers).
        from .eigs import ortho_lobpcg, smooth_panel

        nev_e = nev - rigid_cols
        p_e = p - rigid_cols
        x_e = x[:, rigid_cols:]
        if raw_fill:
            # The ortho engine carries K S / M S panels in f32, which requires a
            # spectrally SMOOTH basis (see solve/eigs.py); raw gaussian columns
            # carry lambda_max-scale energy, so smooth them through the
            # preconditioner.
            lo = seeded
            x_e = x_e.at[:, lo:].set(smooth_panel(shifted, inv_diag32, x_e[:, lo:]))
        tol32 = max(tol, 3e-7)
        need_polish64 = tol < 3e-7
        res, status, o_iters, o_ops = ortho_lobpcg(
            op_state, shifted, inv_diag32, x_e, n, nev_e, p_e, sigma, tol32,
            max_iters, inner_iters, rigid=precond.rigid, m_rigid=precond.m_rigid,
            callback=callback, debug=debug,
        )
        if status == "cancel":
            return fail(o_iters, o_ops, "cancel")
        if res is None:
            return fail(o_iters, o_ops, status)
        lam_e, x_full, o_iters, o_ops, res_norm_e = res
        if status == "handoff":
            need_polish64 = True  # f32 floor reached before tol; polish owns the rest
        if need_polish64:
            # The f64 polish is NOT rigid-deflated — hand it the full
            # [rigid | elastic] panel (rigid modes are exact f64 fixed points there,
            # the old engine's discipline) and re-zero the rigid prefix after.
            panel = jnp.concatenate(
                [precond.rigid[:, :rigid_cols].astype(x_full.dtype), x_full], axis=1)
            out = _polish_from_panel(
                op_state, shifted, panel, p, nev, sigma, tol, inv_diag32,
                inner_iters, callback, o_iters, o_ops, debug,
            )
            if out is None:
                return fail(o_iters, o_ops)
            lam = out.eigenvalues.copy()
            lam[:rigid_cols] = 0.0  # exact rigid zeros at the solver boundary
            return LobpcgResult(lam, out.eigenvectors, out.iterations,
                                out.op_applications,
                                residual_norms=out.residual_norms)
        lam_e = lam_e[:nev_e]
        x_vec = x_full[:, :nev_e]
        res_norm_e = res_norm_e[:nev_e]
        lam = np.concatenate([np.zeros(rigid_cols), lam_e])
        vecs = jnp.concatenate(
            [precond.rigid[:, :rigid_cols].astype(x_vec.dtype), x_vec], axis=1)
        res_norm = np.concatenate([np.zeros(rigid_cols), np.asarray(res_norm_e)])
        return LobpcgResult(lam, vecs, o_iters, o_ops, residual_norms=res_norm)

    with profile.scope("eig/f32_init"):
        x, a, b = _f32_init_stage(op_state, x)
        s_hint = jnp.asarray(0.0, jnp.float64)
        theta_d, c = _rr_device(a, b, p, eps_b32, s_hint)
        s_hint = theta_d[p - 1]
        s, c = _enter_block_layout(x, c)
        del x

    ops_count = 3
    prev = np.full(p, np.inf)
    f32_iters = 0
    res_d = None
    pending = None  # (iteration, theta device array) — checked one iteration behind
    # Vector quality: eigenVALUES settle one iteration before the eigenvectors stop
    # rotating inside near-degenerate clusters (value error is quadratic in vector
    # error). Requiring settling on two CONSECUTIVE iterations pins the vectors too.
    streak_needed = 2
    streak = 0
    streak_hand = 0
    hand_ok = False
    # f32 Rayleigh-quotient noise floors are PENCIL-DEPENDENT: on irregular CDT meshes
    # eigenvalues near the top of the wanted window fluctuate at ~1e-5..1e-4 relative
    # (eps32 basis jitter against high-energy directions) and can never meet tol32.
    # Settling the whole prefix at this coarser threshold means the SUBSPACE is as good
    # as f32 gets — hand off to the f64 polish loop, whose floor is eps64-grade.
    tol_handoff = max(tol32, 1e-4)

    import time as _time

    last_t = [_time.perf_counter()]

    hand_prefix = 0

    def check(stage, iteration, theta_dev, tol_now):
        nonlocal prev, streak, streak_hand, hand_ok, hand_prefix
        lam = np.asarray(jax.device_get(theta_dev), np.float64)
        if not np.isfinite(lam[:nev]).all():
            return "nan", lam
        settled, rel, delta, window = _settled_prefix(lam, prev, nev, tol_now, sigma, floor32)
        settled_h = nev
        if stage == "eig32":
            settled_h, _, _, _ = _settled_prefix(lam, prev, nev, tol_handoff, sigma, floor32)
            streak_hand = streak_hand + 1 if settled_h >= nev else 0
            hand_ok = hand_ok or settled_h >= nev
            hand_prefix = settled_h
        prev = lam
        streak = streak + 1 if settled >= nev else 0
        if debug:
            now = _time.perf_counter()
            dt, last_t[0] = now - last_t[0], now
            j = min(settled, nev - 1)
            jh = min(settled_h, nev - 1)
            print(
                f"[{stage}] it={iteration} settled={settled}/{nev} streak={streak} "
                f"hand={streak_hand} lam={lam[j]:.9e} rel={rel[j]:.3e} "
                f"hblk={settled_h}:rel={rel[jh]:.2e}:lam={lam[jh]:.4e} dt={dt:.2f}s",
                flush=True,
            )
            if os.environ.get("MESHEDITOR_TPU_DEBUG_EIG") == "2":
                with np.printoptions(precision=6, linewidth=200):
                    print("   lam:", lam[:min(nev, 18)], flush=True)
        if callback is not None and callback(iteration, settled):
            return "cancel", lam
        if streak >= streak_needed:
            return "done", lam
        if stage == "eig32" and streak_hand >= streak_needed:
            return "handoff", lam
        return "run", lam

    lam = None
    handoff = False
    # Stagnation detector: the fold-RR's f32 eigh carries per-value noise that GROWS
    # with the Ritz value (~eps32 * dim * (theta + s2)); mid-spectrum values on real
    # pencils fluctuate at 1e-4..1e-3 forever, so "every value settled at 1e-4" can be
    # unreachable no matter how converged the SUBSPACE is (measured on a v5e: the
    # handoff prefix plateaus in the 10-50 range while values jitter around fixed
    # points). When the handoff prefix stops improving, the subspace is at its f32
    # floor — hand off to the f64 polish, whose host Rayleigh-Ritz is noise-free and
    # whose eigenvalue error is quadratic in the remaining subspace error.
    # Carry/calibration schedule: most iterations run the cheap carry stage (no
    # emulated-f64 pencil apply — see _f32_iter_stage_carry); every `recalib`-th runs
    # the accurate stage, which re-anchors the carried X Grams AND measures true
    # relative residuals. Those residuals drive the PRIMARY exit: value-settling in
    # f32 is noise-bound (see stagnation note above), but ||r||/(||Kx||+|s|||Mx||) is
    # a monotone certificate — eigenvalue error is quadratic in it, so rel < res_exit
    # certifies the caller's tolerance directly.
    recalib = max(1, int(os.environ.get("MESHEDITOR_TPU_RECALIB", "4")))
    no_carry = bool(int(os.environ.get("MESHEDITOR_TPU_NO_CARRY", "0")))
    res_exit = float(
        os.environ.get("MESHEDITOR_TPU_RES_EXIT", "0") or max(1e-4, (tol * 0.1) ** 0.5)
    )
    sig_d = jnp.asarray(abs(sigma), jnp.float64)
    a_prev = _pad_gram(a)
    b_prev = _pad_gram(b)
    res_d = None
    res_stall_count = 0
    last_rel_q = np.inf
    res_progress = float(os.environ.get("MESHEDITOR_TPU_RES_PROGRESS", "2.0"))
    res_deep = float(os.environ.get("MESHEDITOR_TPU_RES_DEEP", "3e-5"))
    res_host = float(os.environ.get("MESHEDITOR_TPU_RES_HOST", "3e-2"))
    best_hand = -1
    hand_stall = 0
    hand_patience = 6
    host_rr_phase = False
    with profile.scope("eig/f32_loop"):
        for it in range(f32_max):
            calibrated = no_carry or ((it + 1) % recalib == 0)
            # The two sync=... scopes serialize the pipeline when profiling is ON;
            # they are free (and non-blocking) in production.
            with profile.scope("iter_stage", sync=None):
                if calibrated:
                    s, a, b, res_d, rel_d = _f32_iter_stage(
                        op_state, shifted, s, c, inv_diag32, inner_iters, sig_d,
                    )
                else:
                    s, a, b = _f32_iter_stage_carry(
                        op_state, shifted, s, c, a_prev, b_prev, inv_diag32,
                        inner_iters,
                    )
                    rel_d = None
                if profile.enabled:
                    jax.block_until_ready(b)
            with profile.scope("rr_device"):
                if host_rr_phase or os.environ.get("MESHEDITOR_TPU_HOST_RR32"):
                    # Host LAPACK Rayleigh-Ritz phase: noise-free weights at the cost
                    # of one wire round-trip (~0.9 s through the axon tunnel). Both
                    # Grams cross DOWN in f32 — X-diag entries ARE the Ritz values,
                    # but f32's 6e-8 relative is 20x inside the 1e-6 settling tol,
                    # and every other block is eps32-sourced anyway; c crosses UP in
                    # f32 (weights applied identically to panels and carried Grams
                    # stay exactly consistent).
                    ab_h = np.asarray(jax.device_get(
                        jnp.stack([a.astype(jnp.float32), b.astype(jnp.float32)])),
                        np.float64)  # one wire round trip for both Grams
                    th_h, c_h = _solve_reduced(ab_h[0], ab_h[1], p)
                    theta_d = jnp.asarray(th_h)
                    c = jnp.asarray(c_h.astype(np.float32)).astype(jnp.float64)
                else:
                    theta_d, c = _rr_device(a, b, p, eps_b32, s_hint)
                if profile.enabled:
                    jax.block_until_ready(c)
            a_prev, b_prev = a, b
            if os.environ.get("MESHEDITOR_TPU_DUMP_GRAMS"):
                d = os.environ["MESHEDITOR_TPU_DUMP_GRAMS"]
                np.save(f"{d}/gram_a_{it:02d}.npy", np.asarray(jax.device_get(a)))
                np.save(f"{d}/gram_b_{it:02d}.npy", np.asarray(jax.device_get(b)))
                np.save(f"{d}/c_{it:02d}.npy", np.asarray(jax.device_get(c)))
                np.save(f"{d}/theta_{it:02d}.npy", np.asarray(jax.device_get(theta_d)))
            s_hint = theta_d[p - 1]
            f32_iters = it + 1
            ops_count += 6 + inner_iters
            if calibrated:
                rel_h = np.asarray(jax.device_get(rel_d), np.float64)
                finite = np.isfinite(rel_h[:nev]).all()
                rel_max = float(rel_h[:nev].max()) if finite else np.inf
                # Progress metric: a high quantile rather than the max — the sort
                # boundary at the guard edge churns one or two columns between RR
                # passes, and their rel stays O(1) while the subspace underneath them
                # is converging steadily.
                rel_q = float(np.quantile(rel_h[:nev], 0.9)) if finite else np.inf
                if debug:
                    print(f"[res32] it={f32_iters} rel_max={rel_max:.3e} "
                          f"rel_q90={rel_q:.3e} "
                          f"rel_med={float(np.median(rel_h[:nev])):.3e}", flush=True)
                if rel_max < res_exit:
                    lam = np.asarray(jax.device_get(theta_d), np.float64)
                    if np.isfinite(lam[:nev]).all():
                        if callback is not None and callback(f32_iters, nev):
                            return fail(f32_iters, ops_count, "cancel")
                        if not need_polish:
                            x_out = _extract_x(s, c)
                            res_norm = np.asarray(jax.device_get(res_d))
                            return LobpcgResult(
                                lam[:nev].copy(),
                                x_out[:, :nev],  # device-resident; see LobpcgResult
                                f32_iters,
                                ops_count,
                                residual_norms=res_norm[:nev],
                            )
                        handoff = True  # residuals certify the subspace; polish
                        break           # owns the sub-f32-floor tolerance
                # Residual-stall handoff: the f32 panel noise floors the subspace at
                # rel ~ eps32 * lambda_max / (theta + |sigma|) (measured q90 ~ 7e-3
                # on the bench pencil); once a calibration window shows no >=
                # res_progress improvement, further f32 iterations only bounce on
                # the floor — hand off. rel_q < res_deep skips the wait when the
                # quantile is already deep enough that the polish settles in its
                # first couple of iterations.
                if rel_q > last_rel_q / res_progress:
                    res_stall_count += 1
                else:
                    res_stall_count = 0
                last_rel_q = rel_q
                stalled = res_stall_count >= 1 and f32_iters >= 8
                if not host_rr_phase:
                    if need_polish and (stalled or rel_q < res_deep):
                        handoff = True  # sub-f32-floor tolerance: f64 polish owns it
                        break
                    if not need_polish and (stalled or rel_q < res_host):
                        # The device-RR floor is the WEIGHT noise, not the panels
                        # (the same loop under a host RR converges 50x deeper —
                        # measured); switch the Rayleigh-Ritz to the host and keep
                        # iterating the cheap f32 stages instead of paying
                        # 2 s/iteration f64 polish. Switch as soon as the subspace
                        # is in the host phase's basin (rel_q < res_host) — device
                        # RR iterations past that point only bounce on the weight-
                        # noise floor.
                        host_rr_phase = True
                        res_stall_count = 0
                        if debug:
                            print(f"[res32] it={f32_iters} -> host-RR phase",
                                  flush=True)
            if pending is not None:
                status, lam = check("eig32", pending[0], pending[1], tol32)
                if status in ("cancel", "nan"):
                    return fail(f32_iters, ops_count, status)
                if status == "done":
                    break
                if hand_prefix > best_hand:
                    best_hand, hand_stall = hand_prefix, 0
                else:
                    hand_stall += 1
                if (status == "handoff" or (hand_stall >= hand_patience
                                            and pending[0] >= 8)) \
                        and not host_rr_phase:
                    if need_polish:
                        handoff = True
                        break
                    host_rr_phase = True  # see the residual-stall branch above
                    if debug:
                        print(f"[eig32] it={f32_iters} -> host-RR phase", flush=True)
            pending = (f32_iters, theta_d)
        else:
            status, lam = check("eig32", pending[0], pending[1], tol32)
            if status in ("cancel", "nan"):
                return fail(f32_iters, ops_count, status)
            if status != "done":
                handoff = True  # subspace at its f32 floor; polish owns the rest

    if handoff:
        need_polish = True  # f32 settling was unreachable; enforce tol in f64

    if not need_polish:
        # theta are exact f64 Rayleigh quotients of the returned basis; extract the
        # settled columns directly (lam is one RR behind c, but both sides of the
        # streak criterion settled, so the pairing is within tolerance).
        lam = np.asarray(jax.device_get(theta_d), np.float64)
        x_out = _extract_x(s, c)
        res_norm = np.asarray(jax.device_get(res_d)) if res_d is not None else None
        return LobpcgResult(
            lam[:nev].copy(),
            x_out[:, :nev],  # device-resident; see LobpcgResult
            f32_iters,
            ops_count,
            residual_norms=res_norm[:nev] if res_norm is not None else None,
        )

    # ---- f64 polish (only for tolerances below the f32-panel RQ floor) ----
    #
    # The polish Rayleigh-Ritz runs ON HOST (LAPACK f64, _solve_reduced). The device
    # fold-RR is the right tool for the f32 loop, but its final recombination weights
    # come from an f32 eigh whose second fold cannot separate eigenvalue clusters far
    # above its shift: on a degenerate-heavy pencil (icosphere quintets) the weights
    # re-scramble the cluster every iteration and the polish NEVER converges below the
    # scramble floor (~1e-4 value spread, measured). Host traffic is (3p)^2 Grams down
    # + (3p, p) weights up per polish iteration — bounded by the subspace size, not n;
    # the performance path (f32 settling at >= 3e-7 tolerances) never polishes.
    # Wire compression (the axon tunnel runs ~5-20 MB/s, so the per-iteration host RR
    # is transfer-bound): b crosses DOWN in f32 — its columns are unit-M-norm so every
    # entry is O(1) and f32 rounding (~6e-8 relative) perturbs only which
    # near-dependent directions fall below the whitening cutoff, all of which get the
    # above-window penalty parking either way. a stays f64: its entries ARE the Ritz
    # values. c crosses UP in f32 — recombination weights applied identically to s/ks/
    # ms keep the carried products exactly consistent, and an eps32 rotation WITHIN
    # the returned subspace is corrected by the next Rayleigh-Ritz.
    _b32 = jax.jit(lambda m: m.astype(jnp.float32))

    def _rr_host(a_dev, b_dev):
        a_h = np.asarray(jax.device_get(a_dev), np.float64)
        b_h = np.asarray(jax.device_get(_b32(b_dev)), np.float64)
        theta_h, c_h = _solve_reduced(a_h, b_h, p)
        return theta_h, c_h

    with profile.scope("eig/polish_init"):
        x64 = _materialize_f64(s, c)
        del s
        s64, ks64, ms64, a64, b64 = _polish_init(op_state, x64)
        del x64
        theta_h, c_h = _rr_host(a64, b64)
        theta64_d = jnp.asarray(theta_h)
        s_hint = theta64_d[p - 1]
        c64 = jnp.asarray(np.concatenate([c_h, np.zeros((2 * p, p))], 0)
                          .astype(np.float32))
        ops_count += 2
        lam = theta_h.copy()
    if not np.isfinite(lam[:nev]).all():
        return fail(f32_iters, ops_count, "nan")
    prev = lam
    streak = 0
    res_norm = None

    # Acceptance floor for budget exhaustion: the fold-RR's f32 eigh carries
    # ~eps32*(theta/s2) value noise for modes above its second-fold shift — a few 1e-5
    # relative on irregular pencils — so values can FLUCTUATE at that level forever
    # while the subspace itself is converged (measured: fluctuation amplitude matches
    # the fold noise model, and parity vs scipy holds to ~1e-5). A 1e-4-settled
    # spectrum is 20x inside the 0.1% frequency-parity gate (lambda-rel 2e-3); only a
    # pencil that cannot even reach that is a genuine failure. The loop still runs
    # toward the caller's tol while budget remains.
    tol_accept = max(tol, float(os.environ.get("MESHEDITOR_TPU_TOL_ACCEPT", "1e-4")))
    accept_streak = 0
    best_settled = -1
    since_improve = 0
    # A deeper polish inner solve does NOT raise the per-outer convergence rate
    # (measured: identical settled trajectories at 16 vs 48 inner — the f32 AMG-PCG
    # saturates its usable accuracy well before 16 steps), so the polish keeps the
    # caller's inner depth.
    polish_inner = int(os.environ.get("MESHEDITOR_TPU_POLISH_INNER", "0")) or inner_iters
    # f32 W applies in the polish are OFF by default: the polish carries K S / M S
    # through recombinations, and an eps32-relative kw pollutes the carried kx at
    # first order (eps32 * sqrt(theta_x * theta_w) ~ 1e-2 relative on the lowest
    # modes — measured as -1e26 spurious Ritz values within two polish iterations).
    # The flag remains for experiments only.
    polish_w32 = bool(int(os.environ.get("MESHEDITOR_TPU_POLISH_W32", "0")))
    with profile.scope("eig/polish_loop"):
        for pit in range(polish_max):
            with profile.scope("polish_stage"):
                s64, ks64, ms64, a64, b64, res_d = _polish_stage(
                    op_state, shifted, s64, ks64, ms64, c64, theta64_d, inv_diag32,
                    polish_inner, w_f32=polish_w32,
                )
                if profile.enabled:
                    jax.block_until_ready(b64)
            with profile.scope("rr_host"):
                theta_h, c_h = _rr_host(a64, b64)
            theta64_d = jnp.asarray(theta_h)
            s_hint = theta64_d[p - 1]
            c64 = jnp.asarray(c_h.astype(np.float32))  # see wire-compression note
            ops_count += 2 + polish_inner
            iterations = f32_iters + pit + 1
            lam_prev_snapshot = prev.copy()
            status, lam = check("eig64", iterations, theta64_d, tol)
            if status in ("cancel", "nan"):
                return fail(iterations, ops_count, status)
            settled_acc, _, _, _ = _settled_prefix(
                lam, lam_prev_snapshot, nev, tol_accept, sigma, floor32)
            accept_streak = accept_streak + 1 if settled_acc >= nev else 0
            tight, _, _, _ = _settled_prefix(lam, lam_prev_snapshot, nev, tol, sigma, floor32)
            if tight > best_settled:
                best_settled, since_improve = tight, 0
            else:
                since_improve += 1
            # Early acceptance: the tight prefix has stopped growing (the remaining
            # values fluctuate at the fold-RR noise floor) while the whole prefix is
            # stable at the accept level — more iterations only chase noise.
            stagnated = since_improve >= 8 and accept_streak >= streak_needed
            if status == "done" or stagnated or (accept_streak >= streak_needed
                                                 and pit == polish_max - 1):
                res_norm = np.asarray(jax.device_get(res_d))
                x_out = _extract_x(s64, c64)
                return LobpcgResult(
                    lam[:nev].copy(),
                    x_out[:, :nev],  # device-resident; see LobpcgResult
                    iterations,
                    ops_count,
                    residual_norms=res_norm[:nev],
                )
        if accept_streak >= 1:
            res_norm = np.asarray(jax.device_get(res_d))
            x_out = _extract_x(s64, c64)
            return LobpcgResult(
                lam[:nev].copy(),
                x_out[:, :nev],
                f32_iters + polish_max,
                ops_count,
                residual_norms=res_norm[:nev],
            )
    # Convergence failed: host fallback (or empty when host-infeasible).
    return fail(f32_iters + polish_max, ops_count)


def _polish_from_panel(op_state, shifted, x32_panel, p, nev, sigma, tol, precond32,
                       inner_iters, callback, start_iters, ops_count, debug):
    """f64 [X | W | P] Rayleigh-Ritz refinement of an f32-converged (n, p) panel —
    the polish stage as a standalone function (host LAPACK Rayleigh-Ritz per
    iteration; numerics documented on _polish_stage). Returns a LobpcgResult, or
    None on cancellation/NaN (callers decide the fallback)."""
    from .. import profile

    _b32 = jax.jit(lambda m: m.astype(jnp.float32))

    def _rr_host(a_dev, b_dev):
        a_h = np.asarray(jax.device_get(a_dev), np.float64)
        b_h = np.asarray(jax.device_get(_b32(b_dev)), np.float64)
        return _solve_reduced(a_h, b_h, p)

    polish_max = 40
    streak_needed = 2
    floor32 = 1e-7
    tol_accept = max(tol, float(os.environ.get("MESHEDITOR_TPU_TOL_ACCEPT", "1e-4")))
    polish_inner = int(os.environ.get("MESHEDITOR_TPU_POLISH_INNER", "0")) or inner_iters
    polish_w32 = bool(int(os.environ.get("MESHEDITOR_TPU_POLISH_W32", "0")))

    with profile.scope("eig/polish_init"):
        x64 = jax.jit(lambda v: v.astype(jnp.float64))(x32_panel)
        s64, ks64, ms64, a64, b64 = _polish_init(op_state, x64)
        del x64
        theta_h, c_h = _rr_host(a64, b64)
        theta64_d = jnp.asarray(theta_h)
        c64 = jnp.asarray(
            np.concatenate([c_h, np.zeros((2 * p, p))], 0).astype(np.float32))
        ops_count += 2
        lam = theta_h.copy()
    if not np.isfinite(lam[:nev]).all():
        return None
    prev = lam
    streak = 0
    accept_streak = 0
    best_settled = -1
    since_improve = 0
    res_norm = None
    with profile.scope("eig/polish_loop"):
        for pit in range(polish_max):
            with profile.scope("polish_stage"):
                s64, ks64, ms64, a64, b64, res_d = _polish_stage(
                    op_state, shifted, s64, ks64, ms64, c64, theta64_d, precond32,
                    polish_inner, w_f32=polish_w32,
                )
            with profile.scope("rr_host"):
                theta_h, c_h = _rr_host(a64, b64)
            theta64_d = jnp.asarray(theta_h)
            c64 = jnp.asarray(c_h.astype(np.float32))
            ops_count += 2 + polish_inner
            iterations = start_iters + pit + 1
            lam_prev = prev
            lam = theta_h
            if not np.isfinite(lam[:nev]).all():
                return None
            prev = lam
            settled, rel, _d, _w = _settled_prefix(lam, lam_prev, nev, tol, sigma, floor32)
            if debug:
                j = min(settled, nev - 1)
                print(f"[polish] it={iterations} settled={settled}/{nev} "
                      f"lam={lam[j]:.9e} rel={rel[j]:.3e}", flush=True)
            if callback is not None and callback(iterations, settled):
                return None
            streak = streak + 1 if settled >= nev else 0
            settled_acc, _, _, _ = _settled_prefix(
                lam, lam_prev, nev, tol_accept, sigma, floor32)
            accept_streak = accept_streak + 1 if settled_acc >= nev else 0
            if settled > best_settled:
                best_settled, since_improve = settled, 0
            else:
                since_improve += 1
            stagnated = since_improve >= 8 and accept_streak >= streak_needed
            if streak >= streak_needed or stagnated or (
                    accept_streak >= streak_needed and pit == polish_max - 1):
                res_norm = np.asarray(jax.device_get(res_d))
                x_out = _extract_x(s64, c64)
                return LobpcgResult(
                    lam[:nev].copy(), x_out[:, :nev], iterations, ops_count,
                    residual_norms=res_norm[:nev],
                )
        if accept_streak >= 1:
            res_norm = np.asarray(jax.device_get(res_d))
            x_out = _extract_x(s64, c64)
            return LobpcgResult(
                lam[:nev].copy(), x_out[:, :nev], start_iters + polish_max, ops_count,
                residual_norms=res_norm[:nev],
            )
    return None


def _lobpcg_legacy(
    kmat, mmat, k_diag, m_diag, n, nev, *, op_state, kmat_pc, mmat_pc, sigma, x0,
    guard, tol, max_iters, inner_iters, refresh_every, seed, callback,
):
    """All-f64 closure-based LOBPCG for bare-callable pencils (recompiles per call).
    Host Rayleigh-Ritz between jitted stages; used by tests and tools that construct
    pencils without ElementOperators."""
    p = min(nev + guard, n)
    dtype = k_diag.dtype

    inv_diag = 1.0 / (k_diag - sigma * m_diag)
    inv_diag_f32 = inv_diag.astype(jnp.float32)
    sigma_f32 = jnp.float32(sigma)

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

    @jax.jit
    def _recombine(s, ks, ms, c2):
        c = c2[0].astype(s.dtype)
        c_wp = c2[1].astype(s.dtype)
        return s @ c, ks @ c, ms @ c, s @ c_wp, ks @ c_wp, ms @ c_wp

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

    c_up_dtype = np.float16 if os.environ.get("MESHEDITOR_TPU_C16") else np.float32

    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (n, p), dtype=dtype)
    if x0 is not None and np.size(x0):
        seeded = min(x0.shape[1], p)
        x = x.at[:, :seeded].set(jnp.asarray(np.asarray(x0)[:, :seeded], dtype=dtype))

    x, kx, mx, a, b = init_stage_f(op_state, x)
    theta_np, c_np = _solve_reduced(np.asarray(a), np.asarray(b), p)
    s, ks, ms = _pad_basis(x, kx, mx)
    cu = np.zeros((3 * p, p))
    cu[:p] = c_np
    cu = cu.astype(c_up_dtype)
    theta_up = theta_np
    ops_count = 3
    prev = np.full(p, np.inf)
    iterations = 0
    res_norm = None

    for it in range(max_iters):
        s, ks, ms, a_d, b32, res_norm = fused_f(
            op_state, s, ks, ms, jnp.asarray(cu), jnp.asarray(theta_up)
        )
        ops_count += 2 + 2 * inner_iters
        a_h, b_h32 = jax.device_get((a_d, b32))
        theta_np, c_np = _solve_reduced(a_h, b_h32.astype(np.float64), p)
        iterations = it + 1
        lam = theta_np
        if not np.isfinite(lam[:nev]).all():
            return LobpcgResult(np.zeros(0), np.zeros((n, 0)), iterations, ops_count)
        cu = c_np.astype(c_up_dtype)
        theta_up = theta_np
        refreshed = refresh_every and (it + 1) % refresh_every == 0
        if refreshed:
            c_wp = c_np.copy()
            c_wp[:p, :] = 0.0
            c2 = np.stack([c_np, c_wp]).astype(np.float32)
            x, kx, mx, pdir, kp, mp = _recombine(s, ks, ms, jnp.asarray(c2))
            kx, mx = refresh_f(op_state, x)
            s, ks, ms = _rebuild(x, kx, mx, pdir, kp, mp)
            cu = np.zeros((3 * p, p))
            cu[:p] = np.eye(p)
            cu = cu.astype(c_up_dtype)
            ops_count += 2

        settled, rel, delta, window = _settled_prefix(lam, prev, nev, tol, sigma, 1e-9)
        prev = lam
        if os.environ.get("MESHEDITOR_TPU_DEBUG_EIG"):
            j = min(settled, nev - 1)
            print(
                f"[eig] it={iterations} settled={settled}/{nev} "
                f"blocker: lam={lam[j]:.6e} delta={delta[j]:.3e} rel={rel[j]:.3e} "
                f"window={window:.3e}",
                flush=True,
            )
        if callback is not None and callback(iterations, settled):
            return LobpcgResult(np.zeros(0), np.zeros((n, 0)), iterations, ops_count)
        if settled >= nev:
            if refreshed:
                sel = np.zeros((3 * p, p), np.float32)
                sel[:p] = np.eye(p)
                c2 = np.stack([sel, np.zeros_like(sel)])
            else:
                c2 = np.stack([c_np, np.zeros_like(c_np)]).astype(np.float32)
            x_out, _, _, _, _, _ = _recombine(s, ks, ms, jnp.asarray(c2))
            return LobpcgResult(
                lam[:nev].copy(),
                x_out[:, :nev],
                iterations,
                ops_count,
                residual_norms=np.asarray(res_norm)[:nev],
            )
    return LobpcgResult(np.zeros(0), np.zeros((n, 0)), iterations, ops_count)
