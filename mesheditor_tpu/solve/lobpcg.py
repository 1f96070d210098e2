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


def _normalize_cols(block, mb):
    """Scale columns to unit M-norm; columns with no mass become exact zeros."""
    cn = _col_dots(block, mb)
    live = cn > _tiny(block.dtype)
    d = jnp.where(live, jax.lax.rsqrt(jnp.where(live, cn, 1.0)), 0.0)
    return block * d[None, :], mb * d[None, :]


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


@partial(jax.jit, static_argnames=("inner_iters",))
@_precise
def _polish_stage(ops, shifted, s, ks, ms, c, theta, inv_diag32, inner_iters):
    """One [X | W | P] LOBPCG refinement step in f64, up to the Gram matrices. Full
    momentum matters in the polish too: without the P block, near-zero rigid-body
    modes descend at steepest-descent rates and never settle.

    Unlike the f32 engine, K S / M S CARRY through the linear recombinations here — in
    f64 the recombination-cancellation drift is ~eps64 * (theta_max/theta) ~ 1e-11
    relative, harmless — so the expensive emulated-f64 pencil applies only to the W
    block. The correction block W is the f32-preconditioned residual (the
    preconditioner needs no precision)."""
    c = c.astype(s.dtype)
    theta = theta.astype(s.dtype)
    p = c.shape[1]
    c_wp = jnp.where((jnp.arange(c.shape[0]) >= p)[:, None], c, jnp.zeros_like(c))
    x = s @ c
    kx = ks @ c
    mx = ms @ c
    pdir = s @ c_wp
    kp = ks @ c_wp
    mp = ms @ c_wp

    r = kx - mx * theta[None, :]
    res_norm = jnp.sqrt(_col_dots(r, r))

    w32 = _pcg_block(shifted.amat_pc, inv_diag32, r.astype(jnp.float32), inner_iters)
    w = w32.astype(s.dtype)
    mw = ops.mmat(w)
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
def _deflate_rigid_panel(x, rigid, m_rigid):
    """M-project the rigid span out of an f32 panel: x - R (M R)^T x for the
    M-orthonormal rigid basis. Used on warm-start seeds, whose leading columns ARE a
    prior solve's rigid modes (ADVICE r3: un-deflated warm panels duplicate rigid
    modes in the deflated engine and displace the top elastic modes)."""
    return x - rigid @ (m_rigid.T @ x)


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
    small_n: int = 9000,
    host_fallback_n: int = 120_000,
    tol_accept: float = 1e-4,
    debug: Optional[bool] = None,
) -> LobpcgResult:
    """Lowest `nev` eigenpairs of K x = lambda M x.

    kmat/mmat apply the operators to (n, p) panels as kmat(op_state, x) when `op_state`
    is given, or kmat(x) when not. `sigma` (negative) shifts the preconditioner pencil.
    `x0` (n, >=1) seeds the leading panel columns (warm start). Convergence mirrors the
    reference's settling criterion (SubspaceIterate, mesh2modes.cpp:403-410). `callback
    (iteration, settled)` may return True to cancel — an empty result, the JobMonitor
    contract of the reference.

    ONE production path (round-4 consolidation): `op_state` an ElementOperators and
    `precond` an AmgPrecond run the M-orthonormal-basis engine (solve/eigs.py) with the
    f64 polish (`_polish_from_panel`) for sub-f32-floor tolerances. Small pencils
    (n <= small_n) and AMG-less pencils route to the host sparse shift-invert; bare
    kmat/mmat callables keep the closure-based f64 fallback (`_lobpcg_legacy`).
    """
    from ..fem.assembly import ElementOperators, bake_shifted_f32

    p = min(nev + guard, n)

    # Small pencils route to the host shift-invert (exact, robust); the blocked TPU
    # iteration exists for the regime where factorization is impossible, not for
    # problems a sparse LU dispatches in milliseconds.
    if isinstance(op_state, ElementOperators) and n <= small_n:
        return _small_pencil_path(op_state, n, nev, p, sigma, callback)

    fast = isinstance(op_state, ElementOperators) and kmat_pc is not None
    if not fast:
        return _lobpcg_legacy(
            kmat, mmat, k_diag, m_diag, n, nev, op_state=op_state, kmat_pc=kmat_pc,
            mmat_pc=mmat_pc, sigma=sigma, x0=x0, guard=guard, tol=tol,
            max_iters=max_iters, inner_iters=inner_iters, refresh_every=refresh_every,
            seed=seed, callback=callback, debug=debug,
        )

    from .. import profile
    from .amg import AmgPrecond, spectral_seed
    from .eigs import ortho_lobpcg, smooth_panel

    if debug is None:
        debug = bool(os.environ.get("MESHEDITOR_TPU_DEBUG_EIG"))

    def fail(iterations, ops_count, reason="noconv"):
        # Cancellation honors the JobMonitor contract (empty result). Numerical
        # non-convergence falls back to the host sparse shift-invert when the pencil is
        # host-feasible: the iterative path's preconditioner can stall on irregular CDT
        # meshes (heterogeneous element sizes weaken the Jacobi/PCG inner solve), and a
        # slow-but-exact answer beats an empty modal model — the reference never
        # returns empty for a healthy mesh, only for breakdowns (mesh2modes.cpp:399).
        if reason != "cancel" and n <= host_fallback_n:
            result = _small_pencil_path(op_state, n, nev, p, sigma, callback)
            return LobpcgResult(result.eigenvalues, result.eigenvectors,
                                iterations + result.iterations,
                                ops_count + result.op_applications,
                                residual_norms=result.residual_norms)
        return LobpcgResult(np.zeros(0), np.zeros((n, 0)), iterations, ops_count)

    if not isinstance(precond, AmgPrecond):
        # The production engine requires the AMG structure (M-orthonormal rigid basis
        # + coarse correction). Without it — build failure or use_amg=False — the
        # exact host path is the honest answer where feasible.
        return fail(0, 0)

    shifted = bake_shifted_f32(op_state, sigma)
    rigid_cols = min(int(precond.rigid.shape[1]), p)

    if rigid_cols >= nev:
        # Every wanted mode is rigid: known in closed form, eigenvalue exactly 0.
        lam = np.zeros(nev)
        vecs = precond.rigid[:, :nev].astype(jnp.float32)
        return LobpcgResult(lam, vecs, 0, 0, residual_norms=np.zeros(nev))

    # Seed: exact rigid-body modes first (the AMG coarse correction deflates those
    # directions, so the iteration could only reach them at unpreconditioned rates;
    # seeding them exactly makes them settled from iteration one), then warm basis
    # columns, then coarse spectral fill — prolongated Ritz vectors of the AMG coarse
    # pencil (amg.spectral_seed) — with fixed-seed gaussian noise as the last resort
    # (same determinism discipline as the reference's SubspaceIterate rng,
    # mesh2modes.cpp:354).
    with profile.scope("eig/seed"):
        key = jax.random.PRNGKey(seed)
        x = jax.random.normal(key, (n, p), dtype=jnp.float32)
        x = x.at[:, :rigid_cols].set(precond.rigid[:, :rigid_cols])
        seeded = 0
        if x0 is not None and np.size(x0):
            seeded = min(x0.shape[1], p - rigid_cols)
            x = x.at[:, rigid_cols:rigid_cols + seeded].set(
                jnp.asarray(np.asarray(x0)[:, :seeded], jnp.float32))
        fill = p - rigid_cols - seeded
        raw_fill = fill > 0
        if fill > 0:
            sp = spectral_seed(precond, fill, seed=seed)
            if sp is not None:
                x = x.at[:, rigid_cols + seeded:].set(sp)
                raw_fill = False

        # The engine solves the ELASTIC spectrum only: rigid modes are known in
        # closed form, deflated out of the iteration, and prepended to the result
        # with eigenvalue EXACTLY 0 — near-zero Ritz values have no relative scale
        # inside an f32-carried basis (they drift without bound and would block the
        # settling prefix), and exact zeros are what the postprocess contract wants
        # anyway (no negative near-rigid values leak to callers).
        nev_e = nev - rigid_cols
        p_e = p - rigid_cols
        x_e = x[:, rigid_cols:]
        if raw_fill:
            # The engine carries K S / M S panels in f32, which requires a
            # spectrally SMOOTH basis (see solve/eigs.py); raw gaussian columns
            # carry lambda_max-scale energy, so smooth them through the
            # preconditioner.
            x_e = x_e.at[:, seeded:].set(smooth_panel(shifted, precond, x_e[:, seeded:]))
        if seeded:
            # Warm-start columns are a prior solve's [rigid | elastic] panel whose
            # leading columns SPAN the rigid space; M-project the rigid span out of
            # the whole elastic seed so it cannot re-enter the deflated iteration as
            # drifting near-zero Ritz values (ADVICE r3, lobpcg.py:949).
            x_e = _deflate_rigid_panel(x_e, precond.rigid, precond.m_rigid)

    tol32 = max(tol, 3e-7)  # the f32-carried-panel Rayleigh-quotient floor
    need_polish64 = tol < 3e-7
    res, status, o_iters, o_ops = ortho_lobpcg(
        op_state, shifted, precond, x_e, n, nev_e, p_e, sigma, tol32,
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
        # The f64 polish is NOT rigid-deflated — hand it the full [rigid | elastic]
        # panel (rigid modes are exact f64 fixed points there) and re-zero the rigid
        # prefix after.
        panel = jnp.concatenate(
            [precond.rigid[:, :rigid_cols].astype(x_full.dtype), x_full], axis=1)
        out, pstatus = _polish_from_panel(
            op_state, shifted, panel, p, nev, sigma, tol, precond,
            inner_iters, callback, o_iters, o_ops, debug, tol_accept=tol_accept,
        )
        if out is None:
            # 'cancel' must NOT run the host fallback: the user asked for the solve
            # to stop, not for a slower exact one (ADVICE r3, lobpcg.py:1441).
            return fail(o_iters, o_ops, pstatus)
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


def _polish_from_panel(op_state, shifted, x32_panel, p, nev, sigma, tol, precond32,
                       inner_iters, callback, start_iters, ops_count, debug,
                       tol_accept=1e-4):
    """f64 [X | W | P] Rayleigh-Ritz refinement of an f32-converged (n, p) panel —
    the polish stage as a standalone function (host LAPACK Rayleigh-Ritz per
    iteration; numerics documented on _polish_stage). Returns (LobpcgResult, "done")
    on success, or (None, status) with status in {"cancel", "nan", "noconv"} — the
    caller's fallback policy depends on WHY it failed (cancellation must not trigger
    the host fallback; the JobMonitor contract wants an empty result)."""
    from .. import profile

    _b32 = jax.jit(lambda m: m.astype(jnp.float32))

    def _rr_host(a_dev, b_dev):
        a_h = np.asarray(jax.device_get(a_dev), np.float64)
        b_h = np.asarray(jax.device_get(_b32(b_dev)), np.float64)
        return _solve_reduced(a_h, b_h, p)

    polish_max = 40
    streak_needed = 2
    floor32 = 1e-7
    tol_accept = max(tol, tol_accept)
    polish_inner = inner_iters

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
        return None, "nan"
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
                    polish_inner,
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
                return None, "nan"
            prev = lam
            settled, rel, _d, _w = _settled_prefix(lam, lam_prev, nev, tol, sigma, floor32)
            if debug:
                j = min(settled, nev - 1)
                print(f"[polish] it={iterations} settled={settled}/{nev} "
                      f"lam={lam[j]:.9e} rel={rel[j]:.3e}", flush=True)
            if callback is not None and callback(iterations, settled):
                return None, "cancel"
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
                ), "done"

        if accept_streak >= 1:
            res_norm = np.asarray(jax.device_get(res_d))
            x_out = _extract_x(s64, c64)
            return LobpcgResult(
                lam[:nev].copy(), x_out[:, :nev], start_iters + polish_max, ops_count,
                residual_norms=res_norm[:nev],
            ), "done"
    return None, "noconv"


def _lobpcg_legacy(
    kmat, mmat, k_diag, m_diag, n, nev, *, op_state, kmat_pc, mmat_pc, sigma, x0,
    guard, tol, max_iters, inner_iters, refresh_every, seed, callback, debug=None,
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

    if debug is None:
        debug = bool(os.environ.get("MESHEDITOR_TPU_DEBUG_EIG"))
    c_up_dtype = np.float32

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
        if debug:
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
