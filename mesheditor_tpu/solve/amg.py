"""Rigid-body-mode aggregation AMG preconditioner for the shifted pencil A = K - sigma*M.

Why this exists: the eigensolver's inner solve (lobpcg.py) approximates the reference's
sparse-Cholesky shift-invert (src/audio/CholeskyShiftInvert.cpp:26-62) with fixed-iteration
PCG. Jacobi preconditioning resolves the HIGH end of A's spectrum but is blind to the
near-kernel: for free-free elasticity, A's lowest eigenvalues are ~|sigma|*mass (the six
rigid-body modes barely lifted by the shift) while the top sits at element-stiffness scale
— a ~1e11 spread no diagonal scaling touches. On irregular CDT meshes the outer LOBPCG
then converges at ~0.85/iteration and never settles.

The fix is the textbook one for elasticity, recast TPU-first: a two-level aggregation
multigrid whose coarse space contains the rigid-body modes of every aggregate — exactly
the directions Jacobi cannot see. Host numpy builds the structure once per solve
(aggregation over the element co-occurrence graph, per-aggregate rigid-body QR); the
coarse operator is Galerkin-assembled ON DEVICE from the f64 element blocks (pulling
(E,30,30) blocks across the axon tunnel would take minutes; a device scan takes
milliseconds), and the V-cycle application is three fused device ops: damped-Jacobi
smoothing, a gather/segment-sum restriction, and one dense coarse matmul.

Precision: the coarse pencil spans |sigma|*mass .. element-stiffness — ~1e11 dynamic
range — which no f32 stage can carry directly. The resolution is the RIGID LIFT
(_lift_rigid): the rigid span is M-deflated at the fine level anyway, so the coarse
operator gets tau * Q Q^T added along its exact kernel coordinates before inversion,
compressing the dynamic range to the elastic band (~1e5). After the lift EVERYTHING
runs f32 — Galerkin assembly, the Newton-Schulz inverse's climb (with a short f64
tail), the stored inverse, and the per-inner-iteration coarse apply — worth ~7 s of
emulated-f64 time per solve on a v5e.

The V-cycle serves as the preconditioner inside the same blocked PCG the solver already
runs (lobpcg._pcg_block); each application costs two extra A-panels (the pre/post-smooth
residuals), repaid by an order-of-magnitude stronger spectral equivalence.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial, wraps

import jax
import jax.numpy as jnp
import numpy as np


def _precise(fn):
    """Trace `fn` under full-f32 matmul precision (TPU DEFAULT dots are bf16-class;
    see the precision note in solve/lobpcg.py)."""

    @wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper


@dataclass(frozen=True)
class AmgPrecond:
    """Two-level aggregation-AMG V-cycle for the shifted pencil. A jax pytree: passing
    it through the solver's module-level jitted stages retraces once per structure.

    The rigid/m_rigid pair implements the precision guard that makes the cycle f32-
    viable: A's true near-kernel is the global rigid-body space, whose coarse inverse
    amplifies by 1/(|sigma|*mass) ~ 1e9x — far beyond what the f32 residual noise floor
    (eps32 * ||A||) tolerates, so an unguarded coarse correction amplifies pure noise
    into enormous rigid displacements (measured 470x residual GROWTH per cycle). The
    eigensolver seeds those modes exactly and keeps its residuals orthogonal to them,
    so the correction may simply be M-deflated against them: what remains amplifies at
    most by 1/lambda_elastic_1, comfortably inside f32 range."""

    agg6: jax.Array  # (n_nodes, 6) int32 — coarse dof ids (aggregate*6 + component)
    w: jax.Array  # (n_nodes, 3, 6) f32 — node blocks of the rigid-body prolongator
    ac_inv: jax.Array  # (nc, nc) f32 — inverse coarse operator (see apply)
    inv_diag: jax.Array  # (n_dofs,) f32 — Jacobi of the shifted pencil
    rigid: jax.Array  # (n_dofs, 6*ncomp) f32 — M-orthonormal global rigid modes
    m_rigid: jax.Array  # (n_dofs, 6*ncomp) f32 — M @ rigid
    omega: float  # smoother damping
    nagg: int
    cycle: str = "additive"  # "additive" | "v11" (see apply)
    # Smoothed-aggregation transfer damping (0 = plain aggregation). With sa > 0
    # the transfers become P_s = (I - sa * D^-1 A) P applied ON THE FLY: the
    # restriction pre-smooths the residual (r - sa * A D^-1 r) and the
    # prolongation post-smooths the correction — two extra A-applies per coarse
    # correction, no change to the stored prolongator or the coarse inverse
    # (unsmoothed-Galerkin SA: the coarse operator stays P^T A P, which keeps the
    # cycle SPD; the smoothing buys the lost interpolation accuracy that makes
    # plain aggregation stall on irregular CDT element sizes — VERDICT r4 #2).
    sa: float = 0.0
    # Coarse mass matrix Mc = P^T M P (f32). Together with ac_inv (the inverse of the
    # LIFTED shifted coarse operator) it closes the coarse PENCIL, which the spectral
    # seed (spectral_seed below) eigensolves by inverse subspace iteration to hand the
    # outer LOBPCG a coarse-grid-accurate starting subspace instead of a random one.
    mc: object = None

    def _coarse_correct(self, r, apply_a=None):
        """Deflated coarse correction e = Pi P Ac^-1 P^T Pi^T r.

        Two-sided M-deflation Pi B Pi^T (Pi = I - R (M R)^T): one-sided deflation is
        an ASYMMETRIC operator, which silently violates PCG's SPD contract; the
        symmetric sandwich both strips rigid components from the input (so the
        near-singular coarse inverse never sees them) and from the output (so the
        amplified response never re-enters).

        The coarse APPLY runs f32. Safe because the inverse is of the RIGID-LIFTED
        coarse operator (build_amg adds tau * L L^T along the coarse rigid-response
        span before inverting): without the lift, ac_inv's entries are dominated by
        the 1/(|sigma|*mass) rigid response, ~1e9x the elastic response, so an f32
        CAST of the inverse erases the elastic correction entirely — measured as the
        outer iteration collapsing to ~0.95/iteration (Jacobi-grade) on a CDT
        icosphere. With the lift, every entry of ac_inv lives within the elastic
        dynamic range and f32 carries it at eps32-relative accuracy.

        Restriction/prolongation run at NODE granularity: one segment-sum row (and
        one gathered row) of width 6p per NODE, not per coarse dof — the TPU
        gather/scatter rate is per-ROW (~24M rows/s measured on a v5e, byte-count
        nearly irrelevant), so the former (nn*6, p) layout paid 6x the rows for the
        same bytes and made the coarse correction as expensive as the fine apply
        (profile_iter.py, round 5). The (nn, 6, p) <-> (nn, 6p) hops are pure
        reshapes; the coarse vector's (nagg, 6p) <-> (nc, p) hop likewise.

        `apply_a` powers the smoothed-aggregation transfers when self.sa > 0 (see
        the field docstring); pass None to force plain-aggregation transfers."""
        nn = self.w.shape[0]
        p = r.shape[1]
        rd = r - self.m_rigid @ (self.rigid.T @ r)
        if self.sa and apply_a is not None:
            sa = jnp.asarray(self.sa, r.dtype)
            rd = rd - sa * apply_a(self.inv_diag[:, None] * rd)
        rn = jnp.einsum("nck,ncp->nkp", self.w, rd.reshape(nn, 3, p))  # (nn, 6, p)
        agg_node = self.agg6[:, 0] // 6  # (nn,) aggregate of each node
        rc = jax.ops.segment_sum(
            rn.reshape(nn, 6 * p), agg_node, num_segments=self.nagg,
        ).reshape(self.nagg * 6, p)
        xc = self.ac_inv @ rc
        xn = xc.reshape(self.nagg, 6 * p)[agg_node].reshape(nn, 6, p)
        e = jnp.einsum("nck,nkp->ncp", self.w, xn).reshape(-1, p)
        if self.sa and apply_a is not None:
            sa = jnp.asarray(self.sa, r.dtype)
            e = e - sa * (self.inv_diag[:, None] * apply_a(e))
        return e - self.rigid @ (self.m_rigid.T @ e)

    def apply(self, apply_a, r):
        """Two-level preconditioner application for an (n, p) f32 panel.

        cycle="additive": z = omega*D^-1 r + coarse(r) — BPX/additive-Schwarz shape.
        Never applies A inside, so the only f32 hazard is the rigid-mode
        amplification, which the deflation removes. The historical default; weaker
        per application but costs zero extra A-panels.

        cycle="v11": symmetric multiplicative V(1,1) — damped-Jacobi pre-smooth,
        deflated coarse correction of the smoothed residual, damped-Jacobi
        post-smooth. Two extra A-panels per application, repaid by a far stronger
        contraction. The early f32-noise objection (intermediate residuals feeding
        the near-singular coarse inverse, measured 3.5-470x growth) predates the
        rigid LIFT + two-sided deflation, which cap the coarse amplification at the
        elastic band; re-measured with both in place the cycle is stable (see
        scripts/diag_amg.py)."""
        om = jnp.asarray(self.omega, r.dtype)
        if self.cycle == "v11":
            z1 = om * self.inv_diag[:, None] * r
            r1 = r - apply_a(z1)
            z2 = z1 + self._coarse_correct(r1, apply_a)
            r2 = r - apply_a(z2)
            return z2 + om * self.inv_diag[:, None] * r2
        return (om * self.inv_diag[:, None] * r
                + self._coarse_correct(r, apply_a if self.sa else None))


jax.tree_util.register_dataclass(
    AmgPrecond,
    data_fields=("agg6", "w", "ac_inv", "inv_diag", "rigid", "m_rigid", "mc"),
    meta_fields=("omega", "nagg", "cycle", "sa"),
)


def _components(element_nodes: np.ndarray, n_nodes: int):
    """Connected components of the element-node graph (scipy union-find). Disconnected
    meshes carry 6 rigid modes PER component; deflation and seeding must cover all."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components

    en = np.asarray(element_nodes, np.int64)
    rows = en[:, :-1].reshape(-1)
    cols = en[:, 1:].reshape(-1)
    g = sp.coo_matrix(
        (np.ones(rows.size, np.int8), (rows, cols)), shape=(n_nodes, n_nodes)
    )
    _, labels = connected_components(g, directed=False)
    labels = labels.copy()
    touched = np.zeros(n_nodes, bool)
    touched[en.reshape(-1)] = True
    # Re-label so only element-touched components count; orphans get -1.
    live = np.unique(labels[touched])
    remap = np.full(labels.max() + 1, -1, np.int64)
    remap[live] = np.arange(live.size)
    labels = np.where(touched, remap[labels], -1)
    return labels, live.size


def rigid_modes(coords: np.ndarray, comp: np.ndarray, ncomp: int, n_dofs: int):
    """Per-component rigid-body modes as (n_dofs, 6*ncomp) float64, un-normalized
    (callers M-orthonormalize against the actual mass matrix)."""
    r = np.zeros((n_dofs, 6 * ncomp))
    for c in range(ncomp):
        idx = np.where(comp == c)[0]
        if idx.size == 0:
            continue
        x = coords[idx]
        ctr = x.mean(axis=0)
        d = x - ctr
        scale = max(float(np.abs(d).max()), 1e-30)
        ds = d / scale
        base = 6 * c
        rows = 3 * idx
        r[rows + 0, base + 0] = 1.0
        r[rows + 1, base + 1] = 1.0
        r[rows + 2, base + 2] = 1.0
        r[rows + 1, base + 3], r[rows + 2, base + 3] = -ds[:, 2], ds[:, 1]
        r[rows + 0, base + 4], r[rows + 2, base + 4] = ds[:, 2], -ds[:, 0]
        r[rows + 0, base + 5], r[rows + 1, base + 5] = -ds[:, 1], ds[:, 0]
    return r


def _quad_node_coords(points: np.ndarray, kept_tets: np.ndarray, n_nodes: int):
    """Coordinates for all quadratic nodes: corners then mid-edge midpoints, in the
    exact id order build_quad_mesh assigns (same unique-key recomputation,
    fem/quad_mesh.py:26-39)."""
    from ..fem.quad_basis import EDGE_CORNERS

    points = np.asarray(points, np.float64)
    tets = np.asarray(kept_tets, np.int64)
    ec = np.asarray(EDGE_CORNERS, np.int64)
    a = tets[:, ec[:, 0]]
    b = tets[:, ec[:, 1]]
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    keys = np.unique(((lo << np.int64(32)) | hi).reshape(-1))
    coords = np.zeros((n_nodes, 3))
    npts = points.shape[0]
    coords[:npts] = points
    e_lo = (keys >> np.int64(32)).astype(np.int64)
    e_hi = (keys & np.int64(0xFFFFFFFF)).astype(np.int64)
    coords[npts : npts + keys.size] = 0.5 * (points[e_lo] + points[e_hi])
    return coords


def _aggregate(element_nodes: np.ndarray, n_nodes: int, max_aggs: int):
    """Greedy distance-1 aggregation over the element co-occurrence node graph, with
    pairwise merge rounds until the aggregate count fits the coarse-dof budget.
    Deterministic (id order). Returns (agg ids (n_nodes,), nagg); orphan nodes -1."""
    en = np.asarray(element_nodes, np.int64)
    m = en.shape[0]
    # CSR node->elements.
    counts = np.bincount(en.reshape(-1), minlength=n_nodes)
    eptr = np.zeros(n_nodes + 1, np.int64)
    np.cumsum(counts, out=eptr[1:])
    order = np.argsort(en.reshape(-1), kind="stable")
    eids = order // 10  # element of each sorted node slot
    agg = np.full(n_nodes, -1, np.int64)
    touched = counts > 0
    nagg = 0
    for v in range(n_nodes):
        if agg[v] != -1 or not touched[v]:
            continue
        neigh = en[eids[eptr[v] : eptr[v + 1]]].reshape(-1)
        members = neigh[agg[neigh] == -1]
        agg[members] = nagg
        agg[v] = nagg
        nagg += 1
    # Attach any stragglers (can't occur with distance-1 sweeps, but keep it safe).
    for v in range(n_nodes):
        if agg[v] == -1 and touched[v]:
            neigh = en[eids[eptr[v] : eptr[v + 1]]].reshape(-1)
            owned = agg[neigh]
            owned = owned[owned >= 0]
            agg[v] = owned[0] if owned.size else 0
    # Merge rounds: halve the aggregate count by merging each aggregate into a
    # neighboring one (union over member nodes' element neighborhoods).
    while nagg > max_aggs:
        merge_to = np.full(nagg, -1, np.int64)
        taken = np.zeros(nagg, bool)
        # Aggregate adjacency via element membership: for each element, its nodes'
        # aggregates are mutually adjacent; pair each aggregate with the first
        # un-taken neighbor encountered.
        ea = agg[en]  # (m, 10)
        for e in range(m):
            row = ea[e]
            base = row[0]
            for k in range(1, 10):
                a2, b2 = row[k - 1], row[k]
                if a2 != b2:
                    lo2, hi2 = (a2, b2) if a2 < b2 else (b2, a2)
                    if merge_to[hi2] == -1 and not taken[lo2] and not taken[hi2] and lo2 != hi2:
                        merge_to[hi2] = lo2
                        taken[lo2] = taken[hi2] = True
            _ = base
        relabel = np.arange(nagg)
        src = np.where(merge_to >= 0)[0]
        relabel[src] = merge_to[src]
        # Compress ids.
        uniq, inv = np.unique(relabel, return_inverse=True)
        agg = np.where(agg >= 0, inv[np.clip(agg, 0, None)], -1)
        if uniq.size == nagg:  # no merges possible; accept the size
            break
        nagg = uniq.size
    return agg, nagg


def _rigid_weights(coords: np.ndarray, agg: np.ndarray, nagg: int):
    """Per-node (3,6) blocks of the aggregate-wise rigid-body prolongator, orthonormal
    per aggregate (QR of [translations | rotations-about-centroid])."""
    n_nodes = coords.shape[0]
    w = np.zeros((n_nodes, 3, 6), np.float64)
    for a in range(nagg):
        idx = np.where(agg == a)[0]
        if idx.size == 0:
            continue
        x = coords[idx]
        c = x.mean(axis=0)
        d = x - c
        scale = max(float(np.abs(d).max()), 1e-30)
        k = idx.size
        b = np.zeros((3 * k, 6))
        b[0::3, 0] = b[1::3, 1] = b[2::3, 2] = 1.0
        # Rotation columns e_j x (x - c), scaled to O(1) for QR conditioning.
        ds = d / scale
        b[1::3, 3], b[2::3, 3] = -ds[:, 2], ds[:, 1]
        b[0::3, 4], b[2::3, 4] = ds[:, 2], -ds[:, 0]
        b[0::3, 5], b[1::3, 5] = -ds[:, 1], ds[:, 0]
        q, r = np.linalg.qr(b)
        # Degenerate aggregates (single node, collinear nodes) leave trailing R diag
        # ~0; those q columns are arbitrary-but-orthonormal, harmless under the
        # coarse-diag regularization in build_amg.
        cols = min(6, q.shape[1])
        w[idx, :, :cols] = q[:, :cols].reshape(k, 3, cols)
    return w


# Elements per coarse-assembly chunk: bounds the (S, chunk, 10, 10, 6, 6) einsum
# temporary to ~60 MB (ADVICE r4: the unchunked pass materialized ~29 KB/element —
# GB-scale near the host-fallback ceiling).
_AC_CHUNK = 2048


@partial(jax.jit, static_argnames=("nagg",))
@_precise
def _pair_block_galerkin(blocks_f32, element_nodes, w32, agg, nagg: int):
    """sum_e P_e^T A_e P_e accumulated at AGGREGATE-PAIR granularity.

    The per-element coarse contribution t[e, i, j] is a 6x6 block addressed by the
    aggregate pair (agg[node_i], agg[node_j]); flattening pairs to a linear id turns
    the accumulation into segment_sums of (chunk*100, 36) rows into nagg^2 segments —
    ~36x fewer scatter descriptors than the former per-scalar .at[].add scan, which
    measured ~0.86 s per solve at bench scale on a v5e (this form: ~tens of ms).
    A lax.scan over _AC_CHUNK-element chunks accumulates into the same nagg^2
    segment space, capping the einsum temporary (ADVICE r4).

    `blocks_f32` may carry a leading stack axis (S, E, 30, 30) to amortize the
    gather/scatter across operators (K and M share incidence); returns (S?, nc, nc)
    f32."""
    stacked = blocks_f32.ndim == 4
    if not stacked:
        blocks_f32 = blocks_f32[None]
    s = blocks_f32.shape[0]
    e = element_nodes.shape[0]
    nc = nagg * 6

    def chunk_contrib(en_c, bl_c):
        ch = en_c.shape[0]
        wn = w32[en_c]  # (ch, 10, 3, 6)
        bl = bl_c.reshape(s, ch, 10, 3, 10, 3)
        tk = jnp.einsum("seipjq,eipa,ejqb->seijab", bl, wn, wn)  # (S, ch, 10, 10, 6, 6)
        ag = agg[en_c]  # (ch, 10) aggregate ids (orphans clipped to 0, w rows 0)
        ids = (ag[:, :, None] * nagg + ag[:, None, :]).reshape(-1)  # (ch*100,)
        data = tk.transpose(1, 2, 3, 0, 4, 5).reshape(ch * 100, s * 36)
        return jax.ops.segment_sum(data, ids, num_segments=nagg * nagg)

    if e <= _AC_CHUNK:
        acc = chunk_contrib(element_nodes, blocks_f32)
    else:
        pad = (-e) % _AC_CHUNK
        # Padding elements carry zero blocks: their pair contributions are zeros
        # scattered into whatever aggregate pair node 0 maps to — a no-op.
        en_p = jnp.pad(element_nodes, ((0, pad), (0, 0)))
        bl_p = jnp.pad(blocks_f32, ((0, 0), (0, pad), (0, 0), (0, 0)))
        n_chunks = (e + pad) // _AC_CHUNK
        en_cs = en_p.reshape(n_chunks, _AC_CHUNK, 10)
        bl_cs = jnp.moveaxis(
            bl_p.reshape(s, n_chunks, _AC_CHUNK, 30, 30), 1, 0)

        def body(acc, args):
            en_c, bl_c = args
            return acc + chunk_contrib(en_c, bl_c), None

        acc0 = jnp.zeros((nagg * nagg, s * 36), blocks_f32.dtype)
        acc, _ = jax.lax.scan(body, acc0, (en_cs, bl_cs))
    acc = acc.reshape(nagg, nagg, s, 6, 6).transpose(2, 0, 3, 1, 4).reshape(s, nc, nc)
    return acc if stacked else acc[0]


@partial(jax.jit, static_argnames=("nagg",))
@_precise
def _coarse_assemble(k_blocks, rho_vol, m_unit, element_nodes, w, agg6, sigma, nagg):
    """Galerkin coarse operator Ac = P^T (K - sigma*M) P on device.

    Runs in FULL-f32 (inputs cast, f64 result): the measured f64 version cost ~6.3 s
    per solve on a v5e (emulated-f64 batched einsum + a 35M-element f64 scatter).
    Precision budget: per-entry Galerkin noise is
    ~30*eps32*||A_e|| ~ 1e-6 relative to the coarse diagonal scale. The two places
    that used to demand f64 are covered elsewhere — the rigid block (true values
    ~1e-10 relative, pure cancellation in any precision) is LIFTED to 1e-3 of the
    diagonal before inversion (_lift_rigid), and the softest genuine elastic
    directions (~1e-5 of the top) see at most ~1e-1 relative perturbation, which
    only shifts PRECONDITIONER quality, not solver correctness."""
    f32 = jnp.float32
    ab = (k_blocks.astype(f32)
          - sigma.astype(f32) * (rho_vol.astype(f32)[:, None, None]
                                 * m_unit.astype(f32)[None]))
    agg = agg6[:, 0] // 6
    ac = _pair_block_galerkin(ab, element_nodes, w.astype(f32), agg, int(nagg))
    return ac.astype(jnp.float64)


@partial(jax.jit, static_argnames=("nagg",))
@_precise
def _coarse_assemble_pencil(k_blocks, rho_vol, m_unit, element_nodes, w, agg6, nagg):
    """Galerkin coarse PENCIL (Kc, Mc) = (P^T K P, P^T M P) in one pair-block pass —
    K and M stack on a leading axis so the gather and the segment_sum are shared
    (_pair_block_galerkin). Mc closes the coarse generalized eigenproblem that the
    spectral seed (spectral_seed) inverse-iterates; Kc - sigma*Mc is the shifted
    operator the V-cycle inverts."""
    f32 = jnp.float32
    kb = k_blocks.astype(f32)
    mb = rho_vol.astype(f32)[:, None, None] * m_unit.astype(f32)[None]
    agg = agg6[:, 0] // 6
    kc, mc = _pair_block_galerkin(
        jnp.stack([kb, mb]), element_nodes, w.astype(f32), agg, int(nagg)
    )
    return kc.astype(jnp.float64), mc.astype(jnp.float64)


@jax.jit
@_precise
def _coarse_invert(ac):
    """Inverse of the regularized coarse operator via NEWTON-SCHULZ, not Cholesky.

    Why: dense f64 Cholesky + triangular inverse on TPU are partially SEQUENTIAL
    algorithms — measured 108 s at 3840^2 through the device (each blocked step pays
    the f64 emulation tax serially). Newton-Schulz X <- X (2I - A X) is nothing but
    matmuls, which the MXU runs natively; with symmetric diagonal equilibration the
    iteration count is ~log2(cond) + a quadratic tail.

    Mixed precision: Newton-Schulz is SELF-CORRECTING (each step squares the residual
    I - A X down to the working precision's floor), so the climb runs bf16 then a
    short full-f32 tail to the ~1e-6 f32 floor — which IS the target precision,
    because the inverse is returned and applied in f32 (AmgPrecond.apply); an f64
    tail would be discarded by the cast. Measured: the all-f64 70-step loop cost
    ~8 s at 4092^2 on a v5e; this runs in tens of ms. Dead coarse dofs (zero rows
    from degenerate aggregates) get unit diagonals; live dofs a relative nudge for
    PD-ness."""
    nc = ac.shape[0]
    ac = 0.5 * (ac + ac.T)
    diag = jnp.diagonal(ac)
    scale = jnp.maximum(jnp.max(diag), 1e-300)
    # Dead threshold is MATRIX-relative, not entry-relative: the non-orthonormal
    # aggregate prolongator produces near-zero columns (a two-node aggregate's
    # rotation about its own axis is f32 noise) whose diag is ~1e-12 of the top —
    # an entry-relative nudge leaves them as ~1e-12-relative eigenvalues that blow
    # up the f32 Newton-Schulz phase (and LAPACK's inverse on the host branch).
    # Parking their diagonal at the matrix scale removes them from the coarse space.
    dead = diag <= 1e-9 * scale
    ac = ac + jnp.diag(jnp.where(dead, scale, 1e-12 * diag))
    # Symmetric equilibration: As = D^-1/2 A D^-1/2 has unit diagonal; its condition
    # is within a factor nc of the best diagonal scaling (van der Sluis).
    d = jnp.diagonal(ac)
    dinv_sqrt = jax.lax.rsqrt(d)
    a_s = ac * dinv_sqrt[:, None] * dinv_sqrt[None, :]
    # X0 = I / ||As||_F guarantees mu0 = lambda/||As||_F in (0, 1] for SPD As.
    nrm = jnp.sqrt(jnp.sum(a_s * a_s))
    a_s32 = a_s.astype(jnp.float32)
    eye2_32 = 2.0 * jnp.eye(nc, dtype=jnp.float32)

    # The log2(cond) CLIMB is self-correcting, so it runs in bf16 (native MXU rate,
    # ~4x the f32 pass at this size): iterates stay bf16, products accumulate f32.
    # The bf16 residual floor (~1e-2) hands off to a short f32 tail that squares it
    # to the f32 floor (~1e-6). No f64 tail: the inverse is RETURNED AND APPLIED in
    # f32 (AmgPrecond.apply), so squaring 1e-6 down to 1e-12 in emulated f64
    # (~0.2 s at 3840^2 on a v5e) bought literally nothing past the f32 cast.
    a_bf = a_s32.astype(jnp.bfloat16)
    x0_32 = jnp.eye(nc, dtype=jnp.float32) / nrm.astype(jnp.float32)
    x_bf = x0_32.astype(jnp.bfloat16)

    def body_bf(_, x):
        ax = jnp.dot(a_bf, x, preferred_element_type=jnp.float32)
        x32 = jnp.dot(
            x, (eye2_32 - ax).astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
        x32 = 0.5 * (x32 + x32.T)  # symmetrize: keeps the iterate SPD under roundoff
        return x32.astype(jnp.bfloat16)

    x_bf = jax.lax.fori_loop(0, 48, body_bf, x_bf)
    x32 = x_bf.astype(jnp.float32)

    def body32(_, x):
        ax = a_s32 @ x
        x = x @ (eye2_32 - ax)
        return 0.5 * (x + x.T)

    x32 = jax.lax.fori_loop(0, 8, body32, x32)
    # GUARDED handoff (ADVICE r4): the bf16 climb diverges for equilibrated operators
    # with cond >= ~1e4 (its residual floor exceeds the Newton-Schulz convergence
    # ball). Real rigid-lifted operators measure cond ~8e2, but the elastic band is
    # budgeted to ~1e5 (module docstring) and a NaN/garbage inverse would silently
    # drop every solve onto the slow host fallback. Check the mean-square residual of
    # I - As X AFTER the f32 tail (any marginal direction the bf16 phase pushed
    # outside the ball has been amplified to NaN/huge by eight more squarings — the
    # check cannot be fooled by a small average hiding one bad direction); on failure
    # discard and re-run the robust 60-step f32 climb from X0 (the pre-bf16 ladder,
    # which converges through cond ~1e5; verified in test_amg.py).
    res32 = jnp.mean(jnp.square(jnp.eye(nc, dtype=jnp.float32) - a_s32 @ x32))
    bf_ok = jnp.isfinite(res32) & (res32 < 1e-3)
    x32 = jax.lax.cond(
        bf_ok,
        lambda x: x,
        lambda _: jax.lax.fori_loop(0, 60, body32, x0_32),
        x32,
    )
    # CONDITIONAL f64 tail: the f32 Newton-Schulz floor scales with conditioning
    # (~eps32 * cond — measured max-residual 9e-3 at cond 1e4, 0.56 at 1e5), so
    # well-conditioned operators (the rigid-lifted production case, cond ~8e2,
    # floor ~1e-4) skip the ~0.2 s of emulated-f64 3840^2 matmuls entirely, while
    # high-conditioning pencils square their floor down through two f64 steps
    # before the f32 cast (the cast keeps VALUES at 1e-7 relative — it cannot
    # repair an inaccurately ITERATED inverse, which is why the tail exists).
    res32b = jnp.mean(jnp.square(jnp.eye(nc, dtype=jnp.float32) - a_s32 @ x32))
    eye2 = 2.0 * jnp.eye(nc, dtype=a_s.dtype)

    def tail64(x32_in):
        x = x32_in.astype(a_s.dtype)

        def body64(_, x):
            ax = a_s @ x
            x = x @ (eye2 - ax)
            return 0.5 * (x + x.T)

        return jax.lax.fori_loop(0, 2, body64, x).astype(jnp.float32)

    x32 = jax.lax.cond(res32b > 2.5e-7, tail64, lambda x: x, x32)
    dinv32 = dinv_sqrt.astype(jnp.float32)
    return x32 * dinv32[:, None] * dinv32[None, :]


@jax.jit
@_precise
def _lift_rigid(ac, vc):
    """Lift the coarse operator's rigid-kernel span: Ac + tau * Q Q^T.

    `vc` are the coarse coordinates of the global rigid modes. The prolongator's
    per-aggregate blocks are ORTHONORMAL (host QR), so P^T P = I and the exact
    coordinates of any fine vector IN range(P) — the rigid modes are, by
    construction — are simply its restriction vc = P^T R. The basis is
    orthonormalized by a tiny device Cholesky and lifted by tau = 1e-3 * max diag.

    Why the lift exists: the rigid directions' coarse eigenvalues sit at
    |sigma|*mass, ~1e9-1e13 below the elastic top; the 1/(|sigma|*mass) response
    dominates every entry of the UNLIFTED inverse, so an f32 cast of it erases the
    elastic correction entirely (measured: outer convergence collapses to
    Jacobi-grade ~0.97/iteration), and an f32 Newton-Schulz phase can never climb
    the ~1e11 condition number either. Lifting must cover the kernel span EXACTLY —
    lifting the mass-weighted image P^T M R = Mc vc instead leaves part of vc at
    |sigma|*mass and the failure persists (also measured). The rigid directions are
    M-deflated at the fine level anyway (AmgPrecond.apply), so answering 1/tau on
    them costs nothing."""
    f64 = jnp.float64
    vc = vc.astype(f64)
    g = vc.T @ vc
    g = g + 1e-12 * jnp.trace(g) / g.shape[0] * jnp.eye(g.shape[0], dtype=f64)
    ell = jnp.linalg.cholesky(g)
    linv = jax.scipy.linalg.solve_triangular(
        ell, jnp.eye(g.shape[0], dtype=f64), lower=True)
    q = vc @ linv.T
    tau = 1e-3 * jnp.max(jnp.diagonal(ac))
    return ac + tau * (q @ q.T)


@partial(jax.jit, static_argnames=("ncomp",))
def _rigid_modes_device(coords, comp, ncomp: int):
    """Per-component rigid-body modes built ON DEVICE as (n_dofs, 6*ncomp) f32.

    The host-numpy construction + upload cost ~11 s through the axon tunnel (the
    (n_dofs, 6c) f64 panel is ~6 MB at ~1 MB/s); the inputs here are the (n_nodes, 3)
    coords and (n_nodes,) component labels — ~200 KB. Orphan nodes (comp < 0) get
    zero rows, matching rigid_modes()."""
    nn = coords.shape[0]
    cols = []
    for c in range(ncomp):
        m = (comp == c).astype(jnp.float32)
        cnt = jnp.maximum(m.sum(), 1.0)
        ctr = (coords * m[:, None]).sum(0) / cnt
        d = (coords - ctr) * m[:, None]
        scale = jnp.maximum(jnp.max(jnp.abs(d)), 1e-30)
        ds = d / scale
        z = jnp.zeros(nn, jnp.float32)
        cols += [
            jnp.stack([m, z, z], 1), jnp.stack([z, m, z], 1), jnp.stack([z, z, m], 1),
            jnp.stack([z, -ds[:, 2], ds[:, 1]], 1),
            jnp.stack([ds[:, 2], z, -ds[:, 0]], 1),
            jnp.stack([-ds[:, 1], ds[:, 0], z], 1),
        ]
    # (nn, 3, 6c) -> (3*nn, 6c): rows are dof-ordered (3*node + axis).
    return jnp.stack(cols, 2).reshape(nn * 3, 6 * ncomp)


@jax.jit
@_precise
def _rigid_gram(ops, r):
    """M r and the f64-accumulated 6c x 6c mass Gram of the raw rigid panel."""
    mr = ops.mmat_f32(r)
    return mr, jnp.einsum("nk,nj->kj", r, mr, preferred_element_type=jnp.float64)


@jax.jit
@_precise
def _rigid_orthonormalize(r, mr, linv_t):
    """Right-multiply by the inverse Cholesky factor: M-orthonormal columns. Full-f32
    precision matters here — bf16-class products would leave ~1e-3 orthonormality
    error, which the coarse-correction deflation would amplify."""
    return r @ linv_t, mr @ linv_t


@partial(jax.jit, static_argnames=("nagg",))
@_precise
def _restrict(w, agg6, nagg: int, x):
    """P^T x — coarse-space coordinates of a fine (n_dofs, p) panel. Node-granular
    rows (see AmgPrecond._coarse_correct)."""
    nn = w.shape[0]
    p = x.shape[1]
    xn = jnp.einsum("nck,ncp->nkp", w, x.reshape(nn, 3, p))
    return jax.ops.segment_sum(xn.reshape(nn, 6 * p), agg6[:, 0] // 6,
                               num_segments=nagg).reshape(nagg * 6, p)


@partial(jax.jit, static_argnames=("seed_dim",))
def _dinv_a_radius(shifted, inv_diag, seed_dim):
    """Spectral radius of D^-1 A by power iteration (device). The Jacobi smoother
    x <- x + omega*D^-1 r is contractive only for omega < 2/rho; for quadratic tets
    rho(D^-1 K) routinely exceeds 2, so a fixed textbook omega makes the V-cycle
    DIVERGENT and the PCG wrapped around it blows up. 12 iterations of power
    iteration over a small panel pin rho to a few percent, plenty for the 5%
    safety margin — which is also why the applies run through amat_pc (the
    bf16-traffic macro form, ~2ms vs ~10ms for narrow panels): a 1e-2 operator
    perturbation moves rho well inside the margin, and the f32-element version
    measured 0.58 s of the factorize budget."""
    z = jax.random.normal(jax.random.PRNGKey(7), (inv_diag.shape[0], seed_dim),
                          dtype=jnp.float32)

    def body(_, z):
        y = inv_diag[:, None] * shifted.amat_pc(z)
        return y / jnp.maximum(jnp.linalg.norm(y, axis=0, keepdims=True), 1e-30)

    z = jax.lax.fori_loop(0, 12, body, z)
    y = inv_diag[:, None] * shifted.amat_pc(z)
    return jnp.max(jnp.linalg.norm(y, axis=0))


def build_amg(
    points: np.ndarray,
    kept_tets: np.ndarray,
    quad,
    ops,
    k_diag: jax.Array,
    m_diag: jax.Array,
    sigma: float,
    *,
    max_coarse_dofs: int = 4096,
    omega: float = 0.0,
    sa="auto",
) -> AmgPrecond:
    """Build the two-level preconditioner for this solve's pencil.

    Host: aggregation + rigid-body QR (numpy, one pass). Device: Galerkin coarse
    assembly from the already-resident f64 element blocks + f64 coarse inverse."""
    from .. import profile

    n_nodes = quad.node_count
    coords = _quad_node_coords(points, kept_tets, n_nodes)
    with profile.scope("amg/aggregate"):
        agg, nagg = _aggregate(np.asarray(quad.element_nodes), n_nodes,
                               max_coarse_dofs // 6)
    # Prolongator: host per-aggregate rigid QR (orthonormal node blocks — the
    # orthonormality is what makes the lift's vc = P^T R exact and keeps the coarse
    # operator free of spurious near-zero columns), uploaded as f32 (~1 MB; the f64
    # upload cost ~6 s per solve through the axon tunnel at ~0.5 MB/s). The coarse
    # dof map and element-node table derive on device (elem_dofs is already
    # resident: every 3rd dof column // 3).
    with profile.scope("amg/rigid_weights"):
        w = _rigid_weights(coords, np.clip(agg, 0, None), nagg)
    w[agg < 0] = 0.0  # orphan nodes contribute nothing to the coarse space
    coords32_d = jnp.asarray(coords.astype(np.float32))
    agg_d = jnp.asarray(agg.astype(np.int32))
    with profile.scope("amg/weights_upload"):
        w32_d = jnp.asarray(w.astype(np.float32))
    agg_safe_d = jnp.clip(agg_d, 0, None)
    agg6_d = (agg_safe_d[:, None] * 6 + jnp.arange(6, dtype=jnp.int32)[None, :])
    element_nodes_d = ops.elem_dofs[:, ::3] // 3
    with profile.scope("amg/coarse_assemble"):
        kc, mc = _coarse_assemble_pencil(
            ops.k_blocks, ops.rho_vol, ops.m_unit,
            element_nodes_d,
            w32_d.astype(jnp.float64), agg6_d, nagg,
        )
        ac = kc - jnp.float64(sigma) * mc
        if profile.enabled:
            jax.block_until_ready(ac)

    # Global per-component rigid modes, built and M-orthonormalized on device (only
    # the tiny 6c x 6c Gram round-trips to host for its Cholesky). Built BEFORE the
    # coarse inverse: the lift below needs the coarse rigid-response span.
    with profile.scope("amg/components"):
        comp, ncomp = _components(np.asarray(quad.element_nodes), n_nodes)
    with profile.scope("amg/rigid_build"):
        r_dev = _rigid_modes_device(
            coords32_d, jnp.asarray(comp.astype(np.int32)), int(max(ncomp, 1)))
        mr, g_d = _rigid_gram(ops, r_dev)
        g = np.asarray(g_d)
    g = 0.5 * (g + g.T)
    # f32 panels carry ~eps32-relative Gram error; the regularization floor sits above
    # it so the Cholesky stays PD.
    ell = np.linalg.cholesky(g + 1e-10 * np.trace(g) / g.shape[0] * np.eye(g.shape[0]))
    linv_t = np.linalg.inv(ell).T
    r_on, mr_on = _rigid_orthonormalize(r_dev, mr, jnp.asarray(linv_t, jnp.float32))

    with profile.scope("amg/lift"):
        ac = _lift_rigid(ac, _restrict(w32_d, agg6_d, nagg, r_on))
    if jax.default_backend() == "cpu":
        # LAPACK beats emulated-matmul Newton-Schulz on host; device arrays are free
        # to round-trip here (no tunnel).
        ac_h = np.asarray(ac)
        ac_h = 0.5 * (ac_h + ac_h.T)
        dg = np.diagonal(ac_h)
        # Matrix-relative dead threshold — see _coarse_invert.
        sc_h = max(dg.max(), 1e-300)
        ac_h = ac_h + np.diag(np.where(dg <= 1e-9 * sc_h, sc_h, 1e-12 * dg))
        inv_h = np.linalg.inv(ac_h)
        # PCG requires an exactly symmetric preconditioner; LAPACK's LU inverse is
        # only symmetric to roundoff, so symmetrize. f32 like the device branch (the
        # apply contract — safe only because of the lift above).
        ac_inv = jnp.asarray((0.5 * (inv_h + inv_h.T)).astype(np.float32))
    else:
        with profile.scope("amg/coarse_invert"):
            ac_inv = _coarse_invert(ac)
            if profile.enabled:
                jax.block_until_ready(ac_inv)
    inv_diag = (1.0 / (k_diag - sigma * m_diag)).astype(jnp.float32)

    if not omega:
        from ..fem.assembly import bake_shifted_f32

        with profile.scope("amg/omega_power_iter"):
            shifted = bake_shifted_f32(ops, sigma)
            rho = float(_dinv_a_radius(shifted, inv_diag, 4))
        omega = 1.0 / (1.05 * max(rho, 1.0))
    # Smoothed-aggregation transfer damping: the textbook 4/(3 rho(D^-1 A))
    # (see AmgPrecond.sa). Costs two A-applies per coarse correction; buys the
    # interpolation accuracy plain aggregation lacks on irregular CDT meshes.
    # ADAPTIVE: measured on a v5e, SA is a 15% iterate win on the CDT torus
    # (element volume p90/p10 = 2.0) and a 20% LOSS on the uniform bench box
    # (ratio = 1.00) — the extra applies only pay where element sizes are
    # heterogeneous enough to starve plain aggregation, so the volume spread
    # picks the mode (threshold 1.5 separates the measured regimes; structured
    # grids sit at ~1.0, conforming-Delaunay output at ~2+).
    if sa == "auto":
        vols = np.asarray(ops.rho_vol_f32)
        live = vols[vols > 0]
        hetero = (float(np.percentile(live, 90)) / max(float(np.percentile(live, 10)), 1e-30)
                  if live.size else 1.0)
        sa_omega = (4.0 / 3.0) * float(omega) * 1.05 if hetero > 1.5 else 0.0
    else:
        sa_omega = float(sa)
    return AmgPrecond(
        agg6=agg6_d,
        w=w32_d,
        ac_inv=ac_inv,
        inv_diag=inv_diag,
        rigid=r_on.astype(jnp.float32),
        m_rigid=mr_on.astype(jnp.float32),
        omega=float(omega),
        nagg=int(nagg),
        mc=mc.astype(jnp.float32),
        sa=sa_omega,
    )


# ---- coarse spectral seeding ----
#
# The outer LOBPCG's iteration count is set by how far its STARTING subspace is from
# the wanted eigenspace. A random start pays ~12 preconditioned iterations at bench
# scale; the coarse pencil (Kc, Mc) — already Galerkin-assembled for the V-cycle —
# approximates the lowest fine modes with coarse-grid discretization error, and its
# eigenproblem is DENSE and small (nc <= 4096), i.e. pure MXU food. Inverse subspace
# iteration with the already-inverted lifted operator costs a few f32 matmuls per
# step; the prolongated Ritz vectors hand the fine iteration a subspace that is
# already converged to coarse-grid accuracy. (The reference has no counterpart: its
# Spectra shift-invert starts cold every solve, src/audio/mesh2modes.cpp:339-428.)


@partial(jax.jit, static_argnames=("q", "iters", "p_want"))
@_precise
def _coarse_inverse_subspace(ac_inv, mc, key, q: int, iters: int, p_want: int):
    """Top-(p_want) approximate eigenvectors of Ac_lifted^-1 in the Mc inner product,
    by inverse subspace iteration + one final Rayleigh-Ritz. Returns (yc (nc, p_want)
    f32 Mc-orthonormal-ish, mu (p_want,) f64 descending inverse-Ritz values).

    Orthonormalization is two-pass CholQR in f32 with column equilibration and a
    diagonal ridge: the iterate's Gram conditioning is bounded by one step's
    amplification spread, and any residual non-orthogonality only degrades SEED
    quality, which the fine iteration corrects."""
    f32, f64 = jnp.float32, jnp.float64
    nc = mc.shape[0]
    y = jax.random.normal(key, (nc, q), f32)
    eye_r = 1e-5 * jnp.eye(q, dtype=f32)

    def chol_qr(y):
        def one_pass(y, _):
            my = mc @ y
            d = jax.lax.rsqrt(jnp.maximum(jnp.einsum("ij,ij->j", y, my), 1e-30))
            y = y * d[None, :]
            my = my * d[None, :]
            g = y.T @ my
            g = 0.5 * (g + g.T) + eye_r
            ell = jnp.linalg.cholesky(g)
            yt = jax.scipy.linalg.solve_triangular(ell, y.T, lower=True)
            return yt.T, None

        y, _ = jax.lax.scan(one_pass, y, None, length=2)
        return y

    def body(_, y):
        return chol_qr(ac_inv @ (mc @ y))

    y = jax.lax.fori_loop(0, iters, body, y)
    y = chol_qr(y)
    # Reduced inverse operator t = Y^T Mc Ac^-1 Mc Y (symmetric PSD): its LARGEST
    # eigenvalues are the wanted (lowest-theta) modes — exactly the fold-RR
    # conditioning trick, and f32 eigh resolves the top of a spectrum fine.
    my = mc @ y
    t = jnp.einsum("ij,ik->jk", my, ac_inv @ my, preferred_element_type=f64)
    t = 0.5 * (t + t.T)
    mu, v = jnp.linalg.eigh(t.astype(f32))
    sel = v[:, ::-1][:, :p_want].astype(f32)  # descending mu = ascending theta
    return y @ sel, mu[::-1][:p_want].astype(f64)


@jax.jit
@_precise
def _prolongate_deflated(w, agg6, rigid, m_rigid, yc):
    """P yc, M-deflated against the global rigid modes (which the solver seeds
    exactly; the coarse seeds must not duplicate them). Node-granular gather rows
    (see AmgPrecond._coarse_correct)."""
    nn = w.shape[0]
    p = yc.shape[1]
    nagg = yc.shape[0] // 6
    yn = yc.reshape(nagg, 6 * p)[agg6[:, 0] // 6].reshape(nn, 6, p)
    e = jnp.einsum("nck,nkp->ncp", w, yn).reshape(-1, p)
    return e - rigid @ (m_rigid.T @ e)


def spectral_seed(amg: AmgPrecond, p: int, *, seed: int = 20260710,
                  guard: int = 128, iters: int = 32):
    """(n_dofs, p) f32 starting panel for the outer eigensolver: prolongated coarse
    Ritz vectors, rigid-deflated. None when the coarse space is too small to supply
    p useful columns (the caller falls back to a random start)."""
    if amg.mc is None:
        return None
    nc = int(amg.mc.shape[0])
    if nc < 2 * p:
        return None
    q = int(min(nc, p + guard))
    yc, _mu = _coarse_inverse_subspace(
        amg.ac_inv, amg.mc, jax.random.PRNGKey(seed), q, iters, p)
    return _prolongate_deflated(amg.w, amg.agg6, amg.rigid, amg.m_rigid, yc)
