"""Orthonormal-basis blocked eigensolver for the FEM pencil (K, M) — the production
TPU path (round-3 redesign of solve/lobpcg.py's f32 stage).

Replaces the reference's sparse-Cholesky shift-invert subspace iteration
(src/audio/mesh2modes.cpp:339-512) with LOBPCG whose inner solve is AMG-preconditioned
CG on the shifted pencil. The round-2 engine whitened the [X | W | P] basis at the GRAM
level; on real pencils the W/P blocks grow near-collinear as the iteration converges, so
the mass Gram's condition number reaches ~1e11 and its f32 eigendecomposition (the only
fast eigh on TPU) mixes the recombination weights at ~1e-2..1e-1 — measured as the outer
iteration contracting at only ~0.77/iteration while the identical loop under a host f64
LAPACK Rayleigh-Ritz contracts at ~0.19/iteration. The disease was never the eigensolve
of the projected PENCIL (whose Rayleigh quotients are moderate — the AMG-preconditioned
residuals are spectrally smooth); it was whitening an ill-conditioned mass Gram.

This engine therefore keeps the BASIS M-orthonormal by construction:

- W (the preconditioned residual block) and P (momentum) are explicitly M-projected
  against X and CholQR'd against themselves (two passes) every iteration, so the mass
  Gram is I + O(1e-6) and the Rayleigh-Ritz never whitens anything ill-conditioned.
- All basis panels (S, K S, M S) are CARRIED in f32 through recombinations. Safe
  because the basis is spectrally SMOOTH: every column is either a Ritz vector, an
  AMG-preconditioned residual, or a momentum difference — Rayleigh quotients stay
  within ~20x of the wanted window (measured max ~1.5e12 against a 7e10 window top on
  the bench pencil, nothing near the 1e16 lambda_max), so the f32 recombination
  cancellation is ~eps32 * 20, not the eps32 * 1e5 catastrophe that forbade carrying
  panels in round 2 (whose random fill columns carried lambda_max-scale energy; the
  fill here is always coarse-spectral or preconditioned — see the seeding contract in
  lobpcg.lobpcg_pencil).
- The X-block Grams evolve by exact f64 congruence (c^T a c), so the settling values
  are deterministic across iterations: no per-iteration measurement noise enters the
  convergence criterion. Fresh cross/W/P Gram blocks are measured by a CHUNKED
  f32-with-f64-chunk-sum matmul (`gram64c`): full-f32 MXU products per 512-row chunk
  with the chunk partials summed in f64 — ~15x faster than the emulated-f64-accumulation
  einsum and within ~3e-6 relative of it, second-order for the wanted Ritz values.
- The Rayleigh-Ritz runs ON DEVICE as a spectral fold over the ORTHONORMAL basis:
  Cholesky-whiten (a + s*b) in f64 (pure triangular work — fast on TPU, unlike f64
  eigh which is emulated and takes minutes), f32 eigh of the folded inverse whose
  wanted modes sit at the TOP of the spectrum, Sylvester refinement against the f64
  fold, then a second fold inside the selected window. With b ~ I the fold is
  numerically clean; the returned Ritz values are exact f64 Rayleigh quotients.

Reference semantics preserved: settling criterion (mesh2modes.cpp:403-410), JobMonitor
cancellation (empty result), warm starts (mesh2modes.h:63-68), deterministic seeding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Chunk of the long (n) axis per f32 Gram product. Per-chunk f32 accumulation noise is
# ~sqrt(chunk)*eps32 relative to the entry's own term scale (~2.7e-6 at 512); the f64
# chunk-sum contributes nothing. Smaller chunks buy accuracy linearly in chunk count.
GRAM_CHUNK = 512


from .lobpcg import _precise, _refine_sym  # shared precision/refinement helpers


def gram64c(u, v):
    """u^T v for f32 (n, i), (n, j) panels, f64-grade via chunked f32 MXU products.

    Each 512-row chunk is one full-f32 einsum (exact-to-eps32 per chunk); chunk
    partials are cast and summed in f64. Replaces the emulated-f64-accumulation
    einsum (jnp.einsum(..., preferred_element_type=f64)), which cannot use the MXU's
    native accumulators and measured ~73 ms per (44k, 271)^2 Gram on a v5e — this
    form runs the same product in a few ms."""
    n = u.shape[0]
    pad = (-n) % GRAM_CHUNK
    if pad:
        u = jnp.pad(u, ((0, pad), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0)))
    uc = u.reshape(-1, GRAM_CHUNK, u.shape[1])
    vc = v.reshape(-1, GRAM_CHUNK, v.shape[1])
    parts = jnp.einsum("cni,cnj->cij", uc, vc)  # f32, one MXU pass per chunk
    return jnp.sum(parts.astype(jnp.float64), axis=0)


def _col_dots(a, b):
    """Per-column dot products at f64 grade via the gram64c trick: one full-f32
    elementwise reduce per 512-row chunk, chunk partials summed in f64. The direct
    einsum with preferred_element_type=f64 runs EMULATED f64 multiply-adds over the
    whole (n, p) panel — measured as a multi-ms cost per call at bench width, and
    this helper sits in the inner-PCG loop (3 calls/step) and every basis pass."""
    n = a.shape[0]
    pad = (-n) % GRAM_CHUNK
    if pad:
        a = jnp.pad(a, ((0, pad), (0, 0)))
        b = jnp.pad(b, ((0, pad), (0, 0)))
    ac = a.reshape(-1, GRAM_CHUNK, a.shape[1])
    bc = b.reshape(-1, GRAM_CHUNK, b.shape[1])
    parts = jnp.einsum("cnp,cnp->cp", ac, bc)  # f32 per chunk
    return jnp.sum(parts.astype(jnp.float64), axis=0)


def _ns_inv_sqrt(m, f32_iters: int = 16, f64_iters: int = 3):
    """Symmetric z with z m z = I for SPD f64 `m`, by the coupled Newton-Schulz
    (Denman-Beavers) iteration — MATMULS ONLY, no factorization.

    Why: the Rayleigh-Ritz fold's f64 Cholesky + triangular inverse are partially
    SEQUENTIAL algorithms whose emulated-f64 steps serialize — measured ~120 ms per
    _rr_fold at bench width (813^2), ~19% of the whole outer iteration. The coupled
    iteration y <- y t, z <- t z with t = (3I - z y)/2 is quadratically convergent
    for spec(m_s) in (0, 1], runs its climb in full-f32 MXU passes, and two or
    three f64 steps square the f32 floor down to ~1e-12. Frobenius pre-scaling
    m_s = m / ||m||_F guarantees the spectrum bound; the result un-scales as
    z = z_s / sqrt(||m||_F) (z_s m_s z_s = I is scale-covariant).

    Precision is NON-critical here: z only rotates the fold's eigvector basis —
    the returned Ritz values are recomputed as exact f64 Rayleigh quotients of the
    original pencil, and _refine_sym corrects the vectors against the exact fold."""
    f64 = jnp.float64
    k = m.shape[0]
    nrm = jnp.sqrt(jnp.sum(m * m))
    ms = m / nrm
    y32 = ms.astype(jnp.float32)
    z32 = jnp.eye(k, dtype=jnp.float32)
    eye3_32 = 3.0 * jnp.eye(k, dtype=jnp.float32)

    def body32(_, yz):
        y, z = yz
        t = 0.5 * (eye3_32 - z @ y)
        return y @ t, t @ z

    y32, z32 = jax.lax.fori_loop(0, f32_iters, body32, (y32, z32))
    y = y32.astype(f64)
    z = z32.astype(f64)
    eye3 = 3.0 * jnp.eye(k, dtype=f64)

    def body64(_, yz):
        y, z = yz
        t = 0.5 * (eye3 - z @ y)
        return y @ t, t @ z

    y, z = jax.lax.fori_loop(0, f64_iters, body64, (y, z))
    z = 0.5 * (z + z.T)
    return z * jax.lax.rsqrt(nrm)


def _rr_fold(a, b, p_want: int, s_hint):
    """Device Rayleigh-Ritz of the (3p)^2 f64 pencil (a, b) with b ~ I (the basis is
    M-orthonormal by construction — see module docstring). Returns (theta (p,) f64
    ascending exact Rayleigh quotients, c (3p, p) f64 b-orthonormal weights).

    Spectral fold: the wanted (lowest) modes of h = b^{-1/2} a b^{-1/2} become the TOP
    of g = (h + s)^{-1}, where f32 eigh's absolute eps32*||g|| noise is relatively
    small; refinement against the f64 g recovers the rest. A second fold inside the
    selected window re-resolves the low-frequency end. f64 eigh is never used (it is
    software-emulated on TPU and takes minutes at this size); f64 Cholesky +
    triangular solves are direct algorithms and stay fast."""
    f64 = jnp.float64
    n3 = a.shape[0]
    a = 0.5 * (a + a.T)
    b = 0.5 * (b + b.T)
    # Dead columns (zeroed by the basis construction) have b_jj = 0: park them with a
    # unit mass and an above-window stiffness so they sort far past p_want.
    db = jnp.diagonal(b)
    dead = db < 0.5
    amax = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(a))), 1.0)
    a = a + jnp.diag(jnp.where(dead, 10.0 * amax, 0.0))
    b = b + jnp.diag(jnp.where(dead, 1.0, 0.0))
    # The shift must dominate the NEGATIVE noise floor of near-rigid Rayleigh
    # quotients (f32-apply noise makes true-zero eigenvalues read ~ -eps32 * ||K x||,
    # measured -7e6 on a 5 cm ceramic sphere) or the Cholesky goes indefinite.
    neg = jnp.maximum(-jnp.min(jnp.diagonal(a)), 0.0)
    s = jnp.maximum(jnp.maximum(s_hint.astype(f64), 1e-7 * amax), 1.0)
    s = jnp.maximum(s, 8.0 * neg)
    # Whiten through the shifted pencil with the SYMMETRIC inverse square root
    # z (z (a+s b) z = I, _ns_inv_sqrt): g = z b z. Eigenpairs (mu, y) of g give
    # pencil Ritz pairs theta = 1/mu - s, c = z y — same fold algebra as the
    # Cholesky form (z^2 = (a+s b)^-1 since z commutes with its argument), but
    # built from MXU matmuls instead of sequential emulated-f64 factorizations.
    z = _ns_inv_sqrt(a + s * b)
    g = z @ (b @ z)
    g = 0.5 * (g + g.T)
    y = _refine_sym(g, jnp.linalg.eigh(g.astype(jnp.float32))[1].astype(f64))
    mu = jnp.einsum("ij,ij->j", y, g @ y)
    order1 = jnp.argsort(-mu)
    c1 = z @ y[:, order1[:p_want]]
    # Second fold inside the selected window: resolves the low-theta end that the wide
    # fold compresses (all wanted mu cluster near the top when s ~ window top).
    a2 = c1.T @ (a @ c1)
    b2 = c1.T @ (b @ c1)
    a2 = 0.5 * (a2 + a2.T)
    b2 = 0.5 * (b2 + b2.T) + 1e-12 * jnp.eye(p_want, dtype=f64)
    d2 = jnp.diagonal(a2) / jnp.diagonal(b2)
    d_max = jnp.maximum(jnp.max(d2), 1.0)
    d_min = jnp.maximum(jnp.min(d2), 1e-9 * d_max)
    s2 = jnp.sqrt(d_min * d_max)
    s2 = jnp.maximum(s2, 8.0 * jnp.maximum(-jnp.min(d2), 0.0))  # see `neg` above
    z2 = _ns_inv_sqrt(a2 + s2 * b2)
    g2 = z2 @ (b2 @ z2)
    g2 = 0.5 * (g2 + g2.T)
    y2 = _refine_sym(g2, jnp.linalg.eigh(g2.astype(jnp.float32))[1].astype(f64))
    mu2 = jnp.einsum("ij,ij->j", y2, g2 @ y2)
    c = c1 @ (z2 @ y2[:, jnp.argsort(-mu2)])
    # Exact f64 Rayleigh quotients of the returned columns, unit-b-norm, ascending.
    ac = a @ c
    bc = b @ c
    num = jnp.einsum("ij,ij->j", c, ac)
    den = jnp.maximum(jnp.einsum("ij,ij->j", c, bc), 1e-300)
    theta = num / den
    c = c * jax.lax.rsqrt(den)[None, :]
    order = jnp.argsort(theta)
    return theta[order], c[:, order]


def _project_out(x, mx, w, *tail):
    """Remove the M-projection of `w` (and its carried products in `tail`) onto the
    M-orthonormal block (x, mx). Returns (w', *tail')."""
    q = gram64c(mx, w).astype(jnp.float32)
    out = [w - x @ q]
    for t, tx in tail:
        out.append(t - tx @ q)
    return out


def _kill_collapsed(pre2, w, mw, kw):
    """Zero columns whose M-norm collapsed below sqrt(eps32)-grade of their
    pre-projection norm: they are numerically inside the projected-out span, and
    normalizing them would amplify projection noise into the basis (the same
    live_eps discipline as solve/lobpcg.py)."""
    post2 = _col_dots(w, mw)
    live = post2 > 1e-8 * jnp.maximum(pre2, 1e-300)
    live32 = live.astype(jnp.float32)[None, :]
    return w * live32, mw * live32, kw * live32


_QR_RIDGE = 3e-5  # CholQR Gram ridge; sits above the chunked-Gram noise floor

# Soft-locking schedule (see _iter_stage's `lock`): lock in steps of _LOCK_STEP
# columns (coarse buckets bound the recompile count) with a _LOCK_MARGIN safety gap
# below the observed settled prefix, so a transient settle regression never locks an
# unconverged column out of its W/P corrections.
_LOCK_STEP = 64
_LOCK_MARGIN = 16


def _chol_qr_m(w, mw, kw, passes=2):
    """M-orthonormalize the block `w` in place of its carried products: a two-pass
    CholQR against the f64-grade chunked Gram, with NO emulated-f64 factorization
    (measured 93 ms per call at bench width on a v5e, dominated by the f64
    Cholesky + triangular solve, which are software-emulated on TPU):

    - pass 0 factors the Gram in f32 (native-speed Cholesky/solve), leaving
      orthonormality slack at the f32-factorization floor (~1e-3);
    - later passes apply the SYMMETRIC inverse square root of the near-identity
      Gram by Neumann series, c = I - e/2 + 3/8 e^2 for g = I + e, computed in
      f64 from the chunked Gram — truncation O(||e||^3) ~ 1e-9, no factorization
      at all. (Any c with c^T g c = I is a valid CholQR step; triangularity is
      never used downstream.)

    Numerically dependent columns are ZEROED (the Rayleigh-Ritz parks their dead
    slots above the window) rather than normalized into noise amplifiers. All
    updates are column operations, so the carried K/M products transform exactly
    alongside.

    Dependence detection is PASS-AWARE: the first equilibration must tolerate huge
    legitimate norm ratios (converged columns' residual corrections are ~1e6x
    smaller than unconverged ones), so its kill threshold is loose; on later
    passes every live input column was unit-M-norm, so a post-whitening norm at
    the RIDGE scale (~_QR_RIDGE) means the column was inside the span and the
    CholQR produced only ridge residue — re-normalizing that residue would plant
    an amplified copy/noise column in the basis (measured: an exactly duplicated
    column re-normalizes to a full-scale repeat instead of zero)."""
    k = w.shape[1]
    f64 = jnp.float64
    for ipass in range(passes):
        # Column equilibration first: unit M-norm (dead columns -> exact zeros).
        cn = _col_dots(w, mw)
        kill_rel = 1e-12 if ipass == 0 else 10.0 * _QR_RIDGE
        live = cn > kill_rel * jnp.maximum(jnp.max(cn), 1e-300)
        d = jnp.where(live, jax.lax.rsqrt(jnp.where(live, cn, 1.0)), 0.0)
        d32 = d.astype(jnp.float32)
        w = w * d32[None, :]
        mw = mw * d32[None, :]
        kw = kw * d32[None, :]
        # Gram (f64-grade); dead rows/cols are masked out and their diagonal set to
        # 1 so the whitening stays PD and leaves them zero. The ridge sits above
        # the chunked-Gram noise floor (~3e-6 per entry): near-dependent column
        # sets would otherwise push the Gram indefinite and NaN the Cholesky. The
        # resulting orthonormality slack is carried into the Rayleigh-Ritz, which
        # solves the GENERALIZED pencil (it never assumes b=I).
        g = gram64c(w, mw)
        g = 0.5 * (g + g.T)
        livec = jnp.diagonal(g) > 0.5  # live columns have unit diagonal here
        mask = livec[:, None] & livec[None, :]
        g = jnp.where(mask, g, 0.0) + jnp.diag(jnp.where(livec, _QR_RIDGE, 1.0))
        if ipass == 0:
            ell = jnp.linalg.cholesky(g.astype(jnp.float32))
            c32 = jax.scipy.linalg.solve_triangular(
                ell, jnp.eye(k, dtype=jnp.float32), lower=True
            ).T
        else:
            e = g - jnp.eye(k, dtype=f64)
            c32 = (
                jnp.eye(k, dtype=f64) - 0.5 * e + 0.375 * (e @ e)
            ).astype(jnp.float32)
        live32 = livec.astype(jnp.float32)[None, :]
        w = (w @ c32) * live32
        mw = (mw @ c32) * live32
        kw = (kw @ c32) * live32
    return w, mw, kw


@jax.jit
@_precise
def _init_stage(ops, x):
    """Seed panel -> M-orthonormal X block with carried products, grams, and the
    first Rayleigh-Ritz. W/P slots start as dead (zero) columns; the fold parks them
    above the window."""
    kx, mx = ops.kmmat_f32(x)
    x, mx, kx = _chol_qr_m(x, mx, kx)
    z = jnp.zeros_like(x)
    s = jnp.concatenate([x, z, z], 1)
    ks = jnp.concatenate([kx, z, z], 1)
    ms = jnp.concatenate([mx, z, z], 1)
    a = gram64c(s, ks)
    b = gram64c(s, ms)
    a = 0.5 * (a + a.T)
    b = 0.5 * (b + b.T)
    p = x.shape[1]
    s_hint = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(a)[:p])), 1.0)
    theta, c = _rr_fold(a, b, p, s_hint)
    return s, ks, ms, a, b, theta, c


@partial(jax.jit, static_argnames=("inner_iters", "refresh", "lock"))
@_precise
def _iter_stage(ops, shifted, precond, s, ks, ms, a, b, c, rigid, m_rigid,
                inner_iters, abs_sigma, refresh: bool = False, lock: int = 0):
    """One full LOBPCG iteration, Rayleigh-Ritz included — a single device program.

    Recombine [X | P] from the carried f32 panels (the basis is spectrally smooth, so
    the recombination cancellation is bounded — module docstring), evolve the X Grams
    by exact f64 congruence (settling values carry no per-iteration measurement
    noise), form residuals, precondition (AMG-PCG), then rebuild an M-orthonormal
    [X | W | P] basis: W/P are M-projected against X (and P against W) and CholQR'd.
    One fused K/M apply per iteration (on W); everything else is matmuls.

    `lock` (static) is SOFT LOCKING (the reference's SubspaceIterate lock/deflate,
    mesh2modes.cpp:339-428, in LOBPCG form): the leading `lock` settled columns stay
    in X — still Rayleigh-Ritz'd every iteration, so drift keeps being corrected —
    but get no W/P columns: the inner PCG, the fused K/M apply, both CholQRs, and
    the fold all shrink to the active suffix. The driver raises `lock` in coarse
    buckets (bounded recompiles) as the settled prefix grows.
    """
    from .lobpcg import _pcg_block

    f32 = jnp.float32
    p = c.shape[1]
    c32 = c.astype(f32)
    c_wp = jnp.where((jnp.arange(c.shape[0]) >= p)[:, None], c32, jnp.zeros_like(c32))
    x = s @ c32
    kx = ks @ c32
    mx = ms @ c32
    c_wp_act = c_wp[:, lock:]  # momentum only for the unlocked suffix
    pdir = s @ c_wp_act
    kp = ks @ c_wp_act
    mp = ms @ c_wp_act

    # Exact congruence of the carried X Grams + fresh unit-M-norm scaling.
    axx = c.T @ (a @ c)
    bxx = c.T @ (b @ c)
    dbx = jnp.diagonal(bxx)
    livex = dbx > 1e-12
    dx = jnp.where(livex, jax.lax.rsqrt(jnp.where(livex, dbx, 1.0)), 0.0)
    dx32 = dx.astype(f32)
    x = x * dx32[None, :]
    kx = kx * dx32[None, :]
    mx = mx * dx32[None, :]
    axx = axx * dx[:, None] * dx[None, :]
    bxx = bxx * dx[:, None] * dx[None, :]
    if refresh:
        # Re-anchor iteration: fresh fused K/M applies on X and P replace the carried
        # panels, and the X Grams are re-measured. The f32 carry drifts slowly
        # (compounding recombination roundoff, measured ~1e-5-relative per ~10
        # iterations once converged); a refresh every few iterations caps it. The
        # fresh Gram values jitter at the f32-apply noise (~5e-5 relative on
        # converged columns), so refresh iterations reset the settling streak — the
        # schedule leaves enough clean congruence iterations in between to settle.
        kx, mx = ops.kmmat_f32(x)
        kp, mp = ops.kmmat_f32(pdir)
        axx = gram64c(x, kx)
        bxx = gram64c(x, mx)
    theta = jnp.diagonal(axx) / jnp.maximum(jnp.diagonal(bxx), 1e-300)

    r = kx - mx * theta.astype(f32)[None, :]
    res_norm = jnp.sqrt(_col_dots(r, r))
    rel = res_norm / (
        jnp.sqrt(_col_dots(kx, kx))
        + abs_sigma * jnp.sqrt(_col_dots(mx, mx))
        + 1e-300
    )

    # amat_pc: the bf16-traffic operator — the inner solve is a preconditioner, so a
    # fixed SPD perturbation of A at bf16 grade only nudges convergence rate while
    # halving the bytes of the wall-clock-dominant applies (assembly.amat_pc).
    w = _pcg_block(shifted.amat_pc, precond, r[:, lock:], inner_iters)
    # Rigid deflation: the rigid-body modes are solved EXACTLY outside this loop
    # (they are known in closed form; lobpcg_pencil prepends them with eigenvalue 0).
    # Near-zero eigenvalues have no relative scale, so inside an f32-carried basis
    # they drift without bound — measured as accelerating negative rigid Ritz values
    # blocking the settled prefix forever. Keeping them out entirely is both faster
    # (narrower panel) and the clamp VERDICT r2 #10 asked for.
    w = w - rigid @ (m_rigid.T @ w)
    # One fused K/M apply BEFORE the X-projection; kw/mw then carry through the
    # projection linearly (exact in exact arithmetic — the tails of _project_out),
    # saving the separate M apply that only measured the pre-projection norms
    # (ADVICE r3, eigs.py:338).
    kw, mw = ops.kmmat_f32(w)
    pre2_w = _col_dots(w, mw)
    w, kw, mw = _project_out(x, mx, w, (kw, kx), (mw, mx))
    w, mw, kw = _kill_collapsed(pre2_w, w, mw, kw)
    w, mw, kw = _chol_qr_m(w, mw, kw)

    pre2_p = _col_dots(pdir, mp)
    pdir, kp, mp = _project_out(x, mx, pdir, (kp, kx), (mp, mx))
    pdir, kp, mp = _project_out(w, mw, pdir, (kp, kw), (mp, mw))
    pdir, mp, kp = _kill_collapsed(pre2_p, pdir, mp, kp)
    pdir, mp, kp = _chol_qr_m(pdir, mp, kp)

    s2 = jnp.concatenate([x, w, pdir], 1)
    ks2 = jnp.concatenate([kx, kw, kp], 1)
    ms2 = jnp.concatenate([mx, mw, mp], 1)
    a2 = gram64c(s2, ks2)
    b2 = gram64c(s2, ms2)
    a2 = 0.5 * (a2 + a2.T)
    b2 = 0.5 * (b2 + b2.T)
    # The X block keeps its congruence-carried (noise-free) values.
    a2 = a2.at[:p, :p].set(axx)
    b2 = b2.at[:p, :p].set(bxx)
    s_hint = theta[p - 1]
    theta2, c2 = _rr_fold(a2, b2, p, s_hint)
    return s2, ks2, ms2, a2, b2, c2, theta2, rel, res_norm


@jax.jit
@_precise
def _extract(s, c):
    return s @ c.astype(s.dtype)


@jax.jit
@_precise
def smooth_panel(shifted, precond, z):
    """Spectrally smooth a random panel by one preconditioner application (plus a
    damped-Jacobi touch-up when the preconditioner is a bare inverse diagonal): the
    ortho engine's f32 panel carry requires basis columns with window-scale Rayleigh
    quotients, and raw gaussian noise carries lambda_max-scale energy."""
    from .amg import AmgPrecond

    if isinstance(precond, AmgPrecond):
        return precond.apply(shifted.amat_pc, z)
    inv_diag = precond
    return inv_diag[:, None] * z


def ortho_lobpcg(
    ops,
    shifted,
    precond,
    x_seed,
    n: int,
    nev: int,
    p: int,
    sigma: float,
    tol: float,
    max_iters: int,
    inner_iters: int,
    rigid=None,
    m_rigid=None,
    callback=None,
    debug: bool = False,
):
    """Driver loop: pipelined settling checks on the congruence-carried Ritz values
    (the reference's SubspaceIterate criterion, mesh2modes.cpp:403-410), with the
    relative-residual certificate as a secondary exit. Returns
    (lam (nev,), x (n, nev) device, iterations, op_count, res_norms) or None on
    cancellation / non-convergence (callers fall back per lobpcg_pencil.fail)."""
    import time as _time

    sig_d = jnp.asarray(abs(sigma), jnp.float64)
    if rigid is None:
        rigid = jnp.zeros((n, 1), jnp.float32)
        m_rigid = jnp.zeros((n, 1), jnp.float32)
    s, ks, ms, a, b, theta_d, c = _init_stage(ops, x_seed)
    ops_count = 3
    prev = np.full(p, np.inf)
    streak = 0
    streak_needed = 2
    floor_rel = 1e-7
    # The f32-carried residual panel floors around eps32 * (theta_basis_max / theta)
    # — ~2e-4 relative on the lowest modes (module docstring); the residual exit is
    # therefore bounded below at 3e-4 and settling is the primary criterion.
    # Eigenvalue error is quadratic in the relative residual, so rel < 1e-3
    # certifies ~1e-6-relative values (500x inside the 0.1% frequency-parity gate);
    # tighter tolerances tighten the certificate as sqrt.
    res_exit = min(1e-3, max(3.16e-4, (tol * 1e3) ** 0.5))
    pending = None
    rel_d = None
    res_d = None
    lam = None
    last_t = [_time.perf_counter()]
    best_settled = -1
    since_improve = 0
    refresh_every = 4
    lock = 0
    lock_cap = max(p - _LOCK_STEP, 0)

    for it in range(1, max_iters + 1):
        refresh = it % refresh_every == 0
        s, ks, ms, a, b, c, theta_d, rel_d, res_d = _iter_stage(
            ops, shifted, precond, s, ks, ms, a, b, c, rigid, m_rigid,
            inner_iters, sig_d, refresh=refresh, lock=lock,
        )
        ops_count += 2 + inner_iters + (4 if refresh else 0)
        if pending is not None:
            status, lam, settled_now = _check(
                pending, prev, nev, tol, sigma, floor_rel, res_exit, callback,
                debug, last_t,
            )
            bucket = min(
                max(settled_now - _LOCK_MARGIN, 0) // _LOCK_STEP * _LOCK_STEP,
                lock_cap,
            )
            lock = max(lock, bucket)
            prev = lam if lam is not None else prev
            if status == "cancel":
                return None, "cancel", it, ops_count
            if status == "nan":
                return None, "nan", it, ops_count
            streak = streak + 1 if status in ("settled", "certified") else 0
            if streak >= streak_needed or status == "certified":
                _pit, _th, _rl, p_res, p_s, p_c = pending
                x_out = _extract(p_s, p_c)  # full (n, p) panel; callers slice
                res = np.asarray(jax.device_get(p_res))
                return (
                    (lam.copy(), x_out, it, ops_count, res),
                    "done", it, ops_count,
                )
            if settled_now > best_settled:
                best_settled, since_improve = settled_now, 0
            else:
                since_improve += 1
            if since_improve >= 10 and it >= 16:
                # Stagnation: the f32 phase is at its floor (carry drift or a weak
                # preconditioner); hand the panel to the drift-free f64 polish.
                _pit, _th, _rl, p_res, p_s, p_c = pending
                x_out = _extract(p_s, p_c)
                res = np.asarray(jax.device_get(p_res))
                return (
                    (lam.copy(), x_out, it, ops_count, res),
                    "handoff", it, ops_count,
                )
        pending = (it, theta_d, rel_d, res_d, s, c)

    status, lam, _settled = _check(
        pending, prev, nev, tol, sigma, floor_rel, res_exit, callback, debug, last_t
    )
    if status in ("settled", "certified") and lam is not None:
        _pit, _th, _rl, p_res, p_s, p_c = pending
        x_out = _extract(p_s, p_c)
        res = np.asarray(jax.device_get(p_res))
        return (
            (lam.copy(), x_out, max_iters, ops_count, res),
            "done", max_iters, ops_count,
        )
    return None, "noconv", max_iters, ops_count


def _check(pending, prev, nev, tol, sigma, floor_rel, res_exit, callback, debug, last_t):
    """Host-side settling + residual certificate, one iteration behind the device.
    Returns (status, lam, settled_prefix)."""
    import time as _time

    from .lobpcg import _settled_prefix

    it, theta_d, rel_d, res_d, _s, _c = pending
    lam = np.asarray(jax.device_get(theta_d), np.float64)
    if not np.isfinite(lam[:nev]).all():
        return "nan", None, 0
    settled, rel_set, _delta, _window = _settled_prefix(
        lam, prev, nev, tol, sigma, floor_rel
    )
    certified = False
    if rel_d is not None:
        rel_h = np.asarray(jax.device_get(rel_d), np.float64)
        finite = np.isfinite(rel_h[:nev]).all()
        if finite and float(rel_h[:nev].max()) < res_exit:
            certified = True
    if debug:
        now = _time.perf_counter()
        dt, last_t[0] = now - last_t[0], now
        j = min(settled, nev - 1)
        relmax = float(np.asarray(jax.device_get(rel_d))[:nev].max()) if rel_d is not None else -1.0
        print(
            f"[ortho] it={it} settled={settled}/{nev} lam_j={lam[j]:.6e} "
            f"set_rel={rel_set[j]:.2e} res_max={relmax:.2e} dt={dt:.2f}s",
            flush=True,
        )
    if callback is not None and callback(it, settled):
        return "cancel", lam, settled
    if certified:
        return "certified", lam, settled
    if settled >= nev:
        return "settled", lam, settled
    return "run", lam, settled
