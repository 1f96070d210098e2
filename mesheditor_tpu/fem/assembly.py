"""FEM assembly for isotropic linear elasticity over quadratic (10-node) tets, TPU-first.

Instead of the reference's triplet-assembled sparse CSC matrices consumed by a host
Cholesky (src/audio/mesh2modes.cpp:273-327), the pencil (K, M) here stays in *element form*:

- a dense (E, 30, 30) array of per-element stiffness blocks, and
- the element volumes (mass matrices are rank-one in the element: rho*V[e] * kron(mass, I3)).

Operator application y = K @ x is gather -> batched 30x30 matmul (MXU) -> segment-sum
scatter. This is the TPU-native equivalent of a sparse matvec: dense, batched, static-shaped,
and the whole eigensolver runs on it matrix-free. Multi-vector panels (n, p) make the batched
matmul genuinely MXU-shaped.

Element stiffness blocks (node pair a, c; displacement components p, q):
    K[(a,p),(c,q)] = V * (lambda * G[p,q] + mu * G[q,p] + delta_pq * mu * tr(G))
with G[p,q] = sum_{k,l} grad_tab[a,k,c,l] * Phig[k,p] * Phig[l,q], where Phig are the
linear-tet barycentric gradients in physical coordinates. Mass:
    M[(a,p),(c,q)] = rho * V * mass_tab[a,c] * delta_pq.
These are the standard quadratic-tet forms; semantics match the reference assembly
(src/audio/mesh2modes.cpp:128-327).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..types import AcousticMaterialProperties
from .quad_basis import quad_basis
from .quad_mesh import QuadMesh


def filter_degenerate(points: np.ndarray, tets: np.ndarray) -> np.ndarray:
    """Drop degenerate elements whose inverse-determinant basis gradients would poison the
    stiffness matrix (reference: src/audio/mesh2modes.cpp:42-60). Returns the kept tets."""
    points = np.asarray(points, dtype=np.float64)
    tets = np.asarray(tets, dtype=np.int64)
    v = points[tets]  # (E, 4, 3)
    r = v[:, 1:] - v[:, :1]  # (E, 3, 3)
    det = np.abs(np.einsum("ei,ei->e", r[:, 0], np.cross(r[:, 1], r[:, 2])))
    # Longest edge (squared) across all 6 vertex pairs.
    lmax_sq = np.zeros(tets.shape[0])
    for i in range(4):
        for j in range(i + 1, 4):
            d = v[:, i] - v[:, j]
            lmax_sq = np.maximum(lmax_sq, np.einsum("ei,ei->e", d, d))
    keep = det > 1e-12 * lmax_sq * np.sqrt(lmax_sq)
    return tets[keep].astype(np.uint32)


@dataclass(frozen=True)
class ElementOperators:
    """Matrix-free pencil (K, M) in element form. All arrays are device-ready.

    Fields:
      elem_dofs: (E, 30) int32 — global dof of each element-local dof (3*node + component)
      elem_nodes: (E, 10) int32 — global quadratic-node ids (= elem_dofs[:, ::3] // 3).
                 The f32 applies gather/scatter at NODE granularity: rows of width 3p
                 instead of p — same bytes, 3x fewer random rows, and the
                 (10, 3p) <-> (30, p) hop is a pure reshape because the dof layout is
                 (node, component)-major. Measured 1.5x on the whole apply on a v5e.
      k_blocks:  (E, 30, 30) f64 — per-element stiffness
      k_blocks_f32: f32 copy for the preconditioner path — inner solves are a
                    preconditioner, so bf16-class MXU matmuls are plenty, and they run
                    orders of magnitude faster than TPU's emulated f64
      k_lo:      (E, 30, 30) f32 — the split-K residue k_blocks - f64(k_blocks_f32);
                 the pair (k_blocks_f32, k_lo) represents K to ~2^-48 relative, which
                 is what `kmat_split` applies (see _apply_k_split)
      rho_vol:   (E,) — density * element volume (+ f32 copy)
      m_unit:    (30, 30) — kron(mass_tab, I3), shared by every element
      n_dofs:    int (static)
    """

    elem_dofs: jax.Array
    elem_nodes: jax.Array
    k_blocks: jax.Array
    k_blocks_f32: jax.Array
    k_lo: jax.Array
    rho_vol: jax.Array
    rho_vol_f32: jax.Array
    m_unit: jax.Array
    # Diagonal fix-up for dofs no element touches (orphan/padding vertices): a unit
    # stiffness over a vanishing mass parks their eigenvalues ~1e20, far above any
    # audible window, instead of leaving a singular 0/0 pencil block.
    k_fix: jax.Array
    m_fix: jax.Array
    # Macro-element clustering (fem/cluster.py) for the preconditioner's shifted
    # apply: None on paths that don't bake it (e.g. the element-sharded multi-chip
    # operators, whose GSPMD partition is per-element).
    macro_nodes: object = None  # (M, cap) int32, pad 0
    elem_macro: object = None  # (E,) int32
    elem_slot: object = None  # (E, 10) int32
    macro_km: object = None  # (2, M, 3cap, 3cap) f32 — [K, M] macro blocks
    n_dofs: int = 0

    def _fix(self, y, x, fix):
        return y + (fix[:, None] * x if x.ndim > 1 else fix * x)

    def kmat(self, x: jax.Array) -> jax.Array:
        return self._fix(_apply_k(self.elem_dofs, self.k_blocks, x, self.n_dofs), x, self.k_fix)

    def mmat(self, x: jax.Array) -> jax.Array:
        return self._fix(_apply_m(self.elem_dofs, self.rho_vol, self.m_unit, x, self.n_dofs), x, self.m_fix)

    def kmat_split(self, x: jax.Array) -> jax.Array:
        """K @ x for an f32 panel, accurate to ~2^-48 of K (split-K two-float apply).

        The f32 panel is the eigensolver's iterate — casting it to f64 is exact — so
        the only precision question is the OPERATOR's: k_hi + k_lo captures K to
        ~eps32^2 and both products run as f32-input einsums with f64 accumulation.
        Residual-of-a-converged-column cancellation (~1e5-6x at FEM conditioning)
        amplifies the 2^-48 operator truncation to ~3e-9 relative on the wanted
        Rayleigh quotients — two decades under the f32 subspace floor."""
        y = _apply_k_split(self.elem_dofs, self.k_blocks_f32, self.k_lo, x, self.n_dofs)
        return self._fix(y, x.astype(jnp.float64), self.k_fix)

    def kmat_f32(self, x: jax.Array) -> jax.Array:
        y = _apply_node(self.elem_nodes, self.k_blocks_f32, x, self.n_dofs)
        return self._fix(y, x, self.k_fix.astype(jnp.float32))

    def mmat_f32(self, x: jax.Array) -> jax.Array:
        mb = self.rho_vol_f32[:, None, None] * self.m_unit.astype(jnp.float32)[None]
        y = _apply_node(self.elem_nodes, mb, x, self.n_dofs)
        return self._fix(y, x, self.m_fix.astype(jnp.float32))

    def kmmat_f32(self, x: jax.Array):
        """(K x, M x) for an f32 panel through ONE gather/scatter pass.

        The element matmuls are the cheap part of the apply (MXU); the random-row
        gather + segment-sum dominate (row-rate-bound, ~24M rows/s on a v5e). K
        and M share the exact same incidence, so fusing them halves that cost:
        one gather feeds both einsums, and the two products concatenate into
        6p-wide rows for a single segment-sum. With clustering baked (macro_km),
        the pass runs at MACRO granularity — 2.4x fewer rows, MXU-filling blocks;
        the macro blocks are the same f32 sums the element segment-sum would
        compute, merely reassociated, so the f32 Gram/residual grade is
        unchanged."""
        kf = self.k_fix.astype(jnp.float32)
        mf = self.m_fix.astype(jnp.float32)
        # Element form, NOT macro: measured on the bench box, the macro-form pass
        # saves ~9 ms/iteration but its reassociated Gram roundoff shifted the
        # settling path by +1-2 outer iterations (~0.3-0.4 s) — a net loss. The
        # macro form stays where roundoff is free: the preconditioner
        # (ShiftedElementOperator.amat_pc).
        mb = self.rho_vol_f32[:, None, None] * self.m_unit.astype(jnp.float32)[None]
        kx, mx = _apply_node_pair(self.elem_nodes, self.k_blocks_f32, mb, x,
                                  self.n_dofs)
        return self._fix(kx, x, kf), self._fix(mx, x, mf)


jax.tree_util.register_dataclass(
    ElementOperators,
    data_fields=(
        "elem_dofs", "elem_nodes", "k_blocks", "k_blocks_f32", "k_lo", "rho_vol",
        "rho_vol_f32", "m_unit", "k_fix", "m_fix", "macro_nodes", "elem_macro",
        "elem_slot", "macro_km",
    ),
    meta_fields=("n_dofs",),
)


@dataclass(frozen=True)
class ShiftedElementOperator:
    """Prebaked f32 element form of A = K - sigma*M for the preconditioner's inner solve.

    The PCG preconditioner applies the shifted pencil once per inner iteration; baking the
    shift into one (E, 30, 30) block array halves the gather/matmul/scatter traffic versus
    applying K and M separately (the shift-combination is linear in the element blocks:
    A_e = K_e - sigma * rho*V_e * m_unit).

    `amat_pc` is the bf16-traffic variant for the inner-PCG hot loop: the apply is
    HBM-bandwidth-bound (gather + element products + segment-sum move ~6x the panel
    bytes; measured ~74 GB/s on the gather), so halving every byte roughly halves the
    wall. Precision budget: the blocks round to bf16 (~4e-3 relative) and the
    gathered panel rounds to bf16, while the element products ACCUMULATE in f32
    (preferred_element_type) and the segment-sum runs on f32 rows — the result is a
    fixed symmetric perturbation A~ = A + dA with ||dA|| ~ 1e-2 ||A||, i.e. a
    slightly different but still SPD operator. The inner PCG solves A~ z = r; any
    SPD A~ spectrally equivalent to A is a legitimate preconditioner — the
    perturbation only nudges the outer convergence RATE (measured end-to-end in
    bench_solve_knobs), never correctness, because every Gram/residual the
    eigensolver TRUSTS is computed with the full-f32 kmmat_f32/kmat_split paths."""

    elem_nodes: jax.Array  # (E, 10) int32 — node-granularity incidence
    a_blocks: jax.Array  # (E, 30, 30) f32
    a_blocks_bf16: jax.Array  # (E, 30, 30) bf16 — inner-PCG traffic variant
    a_fix: jax.Array  # (n_dofs,) f32 orphan-dof fixup, see ElementOperators.k_fix
    # Macro-element form (fem/cluster.py): ~2.5x fewer gather/scatter rows and
    # MXU-filling (3*cap, 3*cap) blocks. None when the operator wasn't baked with
    # clustering (sharded paths); amat_pc then falls back to the element form.
    macro_nodes: object = None  # (M, cap) int32, pad 0
    macro_blocks_bf16: object = None  # (M, 3*cap, 3*cap) bf16
    n_dofs: int = 0

    def amat(self, x: jax.Array) -> jax.Array:
        y = _apply_node(self.elem_nodes, self.a_blocks, x, self.n_dofs)
        return y + (self.a_fix[:, None] * x if x.ndim > 1 else self.a_fix * x)

    def amat_pc(self, x: jax.Array) -> jax.Array:
        """A~ @ x with bf16 gather/product traffic and f32 accumulation (see class
        docstring); macro-element form when baked. f32 in, f32 out."""
        if self.macro_blocks_bf16 is not None:
            y = _apply_node_bf16(self.macro_nodes, self.macro_blocks_bf16, x,
                                 self.n_dofs)
        else:
            y = _apply_node_bf16(self.elem_nodes, self.a_blocks_bf16, x, self.n_dofs)
        return y + (self.a_fix[:, None] * x if x.ndim > 1 else self.a_fix * x)


jax.tree_util.register_dataclass(
    ShiftedElementOperator,
    data_fields=("elem_nodes", "a_blocks", "a_blocks_bf16", "a_fix", "macro_nodes",
                 "macro_blocks_bf16"),
    meta_fields=("n_dofs",),
)


_BF16_EPS = 0.004  # bf16 unit roundoff (2^-8)


def _pd_bf16(blocks_f32):
    """Round SPD blocks to bf16 with a diagonal compensation that keeps the SUM
    positive definite.

    bf16 rounding perturbs each block by ||dB|| <= eps_bf16 * ||B||_2 — an ABSOLUTE
    error at the block's own scale. On sliver-heavy pencils (block-norm spread
    measured 2e4 on a noisy scanned bowl) that perturbation dwarfs the smallest
    eigenvalues of the assembled shifted operator and pushes it INDEFINITE, which
    breaks CG outright (measured: inner-PCG residual GROWING 4x in 10 iterations;
    the smoothed-aggregation transfers amplified it). Adding
    eps_bf16 * ||B||_F to each block's diagonal dominates its own rounding error,
    so every bf16 block stays >= its exact counterpart minus nothing — the sum is
    PD whenever the exact operator is. The preconditioner pays a ~0.4% local
    stiffening (uniform meshes) up to sliver-local inflation (exactly the
    directions Jacobi handles anyway); the eigensolver's exact paths never see it."""
    k = blocks_f32.shape[-1]
    fro = jnp.sqrt(jnp.sum(blocks_f32 * blocks_f32, axis=(-2, -1), keepdims=True))
    bump = _BF16_EPS * fro * jnp.eye(k, dtype=jnp.float32)
    return (blocks_f32 + bump).astype(jnp.bfloat16)


@jax.jit
def _bake_shifted_blocks(k_blocks_f32, rho_vol_f32, m_unit, k_fix, m_fix, sigma):
    m32 = m_unit.astype(jnp.float32)
    a = k_blocks_f32 - sigma * (rho_vol_f32[:, None, None] * m32[None])
    fix = (k_fix - sigma * m_fix).astype(jnp.float32)
    return a, _pd_bf16(a), fix


@partial(jax.jit, static_argnames=("n_macro", "cap"))
def _bake_macro_blocks(blocks, elem_macro, elem_slot, n_macro: int, cap: int):
    """Aggregate element blocks into (S?, M, 3cap, 3cap) macro blocks on device.

    `blocks` is (E, 30, 30) or stacked (S, E, 30, 30) — K and M share the slot
    incidence, so stacking shares the scatter. Scatter at NODE-PAIR granularity —
    (E*100, S*9) rows of per-pair (3,3) payloads into M*cap^2 segments — the same
    row-rate discipline as the apply itself (an entry-granular scatter would move
    9x the rows for the same bytes)."""
    stacked = blocks.ndim == 4
    if not stacked:
        blocks = blocks[None]
    s, e = blocks.shape[0], blocks.shape[1]
    pair = blocks.reshape(s, e, 10, 3, 10, 3).transpose(1, 2, 4, 0, 3, 5)
    ids = (elem_macro[:, None, None].astype(jnp.int32) * (cap * cap)
           + elem_slot[:, :, None] * cap + elem_slot[:, None, :])  # (E,10,10)
    acc = jax.ops.segment_sum(
        pair.reshape(e * 100, s * 9), ids.reshape(-1),
        num_segments=n_macro * cap * cap,
    )
    mb = acc.reshape(n_macro, cap, cap, s, 3, 3).transpose(3, 0, 1, 4, 2, 5)
    mb = mb.reshape(s, n_macro, 3 * cap, 3 * cap)
    return mb if stacked else mb[0]


def bake_shifted_f32(ops: ElementOperators, sigma: float) -> ShiftedElementOperator:
    """One fused f32 operator for (K - sigma*M), built on device (macro-element
    form included when the operators carry clustering — fem/cluster.py)."""
    a, a_bf, fix = _bake_shifted_blocks(
        ops.k_blocks_f32, ops.rho_vol_f32, ops.m_unit, ops.k_fix, ops.m_fix,
        jnp.float32(sigma),
    )
    macro_nodes = None
    macro_bf = None
    if ops.macro_nodes is not None:
        macro_nodes = ops.macro_nodes
        if ops.macro_km is not None:
            # The macro K/M pair is already baked; the shift is linear in it. The
            # bf16 cast carries the PD-preserving diagonal compensation (_pd_bf16).
            macro_bf = jax.jit(
                lambda km, s: _pd_bf16(km[0] - s * km[1])
            )(ops.macro_km, jnp.float32(sigma))
        else:
            n_macro, cap = macro_nodes.shape
            macro_bf = _bake_macro_blocks(
                a, ops.elem_macro, ops.elem_slot, int(n_macro), int(cap)
            ).astype(jnp.bfloat16)
    return ShiftedElementOperator(ops.elem_nodes, a, a_bf, fix, macro_nodes,
                                  macro_bf, ops.n_dofs)


# Elements per matvec chunk: f64 dots on TPU are emulated by algebraic expansion, whose
# temporary is O(chunk * 30 * 30 * panel) — chunking keeps it bounded (~hundreds of MB)
# instead of the full-mesh expansion that blows past HBM on corpus-sized solves.
MATVEC_CHUNK = 512


def _chunked_apply(elem_dofs, x, n_dofs, per_chunk, chunking: bool):
    """Accumulate segment-summed per-element products over element chunks.

    `per_chunk(dofs_chunk, aux_index, xe)` -> (chunk, 30[, p]) element products.
    `chunking` is False for f32 (native MXU dots need no temp bounding).
    """
    e = elem_dofs.shape[0]
    if not chunking or e <= MATVEC_CHUNK:
        ye = per_chunk(elem_dofs, 0, x[elem_dofs])
        flat = ye.reshape((-1,) + ye.shape[2:])
        return jax.ops.segment_sum(flat, elem_dofs.reshape(-1), num_segments=n_dofs)

    n_chunks = (e + MATVEC_CHUNK - 1) // MATVEC_CHUNK
    pad = n_chunks * MATVEC_CHUNK - e
    # Padding rows scatter zero products into dof 0.
    dofs_p = jnp.pad(elem_dofs, ((0, pad), (0, 0)))
    out_shape = (n_dofs,) + x.shape[1:]

    def body(c, acc):
        dofs_c = jax.lax.dynamic_slice_in_dim(dofs_p, c * MATVEC_CHUNK, MATVEC_CHUNK)
        ye = per_chunk(dofs_c, c, x[dofs_c])
        flat = ye.reshape((-1,) + ye.shape[2:])
        return acc + jax.ops.segment_sum(flat, dofs_c.reshape(-1), num_segments=n_dofs)

    return jax.lax.fori_loop(0, n_chunks, body, jnp.zeros(out_shape, dtype=x.dtype))


def _apply_node(elem_nodes, blocks, x, n_dofs):
    """y = A @ x from (E, 30, 30) element blocks, gather/scatter at NODE granularity.

    The dof layout is (node, component)-major, so x.reshape(n_nodes, 3p) has each
    node's (3, p) slab contiguous in one row: the gather pulls (E, 10) rows of width
    3p (3x fewer random rows than dof granularity for the same bytes) and the
    (E, 10, 3p) <-> (E, 30, p) hops are free reshapes. The segment-sum likewise runs
    over E*10 rows instead of E*30. Measured on a v5e at bench scale (E=9.7k,
    p=256): 14.3 ms -> 9.7 ms per apply."""
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    p = x.shape[1]
    n_nodes = n_dofs // 3
    e = elem_nodes.shape[0]
    x3 = x.reshape(n_nodes, 3 * p)
    xe = x3[elem_nodes].reshape(e, 30, p)
    ye = jnp.einsum("eij,ejp->eip", blocks, xe)
    y3 = jax.ops.segment_sum(
        ye.reshape(e * 10, 3 * p), elem_nodes.reshape(-1), num_segments=n_nodes
    )
    y = y3.reshape(n_dofs, p)
    return y[:, 0] if squeeze else y


def _apply_node_bf16(group_nodes, blocks_bf16, x, n_dofs):
    """y = A~ @ x with bf16 gather/matmul traffic, f32 accumulation and scatter.

    Works for any node-group granularity: `group_nodes` (G, K) with blocks
    (G, 3K, 3K) — K=10 for plain elements, K=cap for macro-elements
    (fem/cluster.py). The gathered panel is cast to bf16 BEFORE the gather,
    halving the dominant random-row traffic; the bf16 products accumulate in f32
    on the MXU (its native mode), and the (G*K, 3p) f32 product rows segment-sum
    in f32 so the per-dof accumulation adds no further rounding. See
    ShiftedElementOperator.amat_pc for the precision budget."""
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    p = x.shape[1]
    n_nodes = n_dofs // 3
    g, k = group_nodes.shape
    x3 = x.astype(jnp.bfloat16).reshape(n_nodes, 3 * p)
    xe = x3[group_nodes].reshape(g, 3 * k, p)
    ye = jnp.einsum("eij,ejp->eip", blocks_bf16, xe,
                    preferred_element_type=jnp.float32)
    y3 = jax.ops.segment_sum(
        ye.reshape(g * k, 3 * p), group_nodes.reshape(-1), num_segments=n_nodes
    )
    y = y3.reshape(n_dofs, p)
    return y[:, 0] if squeeze else y


def _apply_node_pair(group_nodes, k_blocks, m_blocks, x, n_dofs):
    """(K x, M x) with one gather and one segment-sum (rows of width 6p): the two
    products concatenate along the row axis before the scatter. Works at element
    (K=10) or macro-element (K=cap) granularity — see ElementOperators.kmmat_f32."""
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    p = x.shape[1]
    n_nodes = n_dofs // 3
    g, k = group_nodes.shape
    x3 = x.reshape(n_nodes, 3 * p)
    xe = x3[group_nodes].reshape(g, 3 * k, p)
    ye_k = jnp.einsum("eij,ejp->eip", k_blocks, xe).reshape(g, k, 3 * p)
    ye_m = jnp.einsum("eij,ejp->eip", m_blocks, xe).reshape(g, k, 3 * p)
    ye = jnp.concatenate([ye_k, ye_m], axis=2)  # (G, K, 6p)
    y3 = jax.ops.segment_sum(
        ye.reshape(g * k, 6 * p), group_nodes.reshape(-1), num_segments=n_nodes
    )
    kx = y3[:, : 3 * p].reshape(n_dofs, p)
    mx = y3[:, 3 * p :].reshape(n_dofs, p)
    if squeeze:
        return kx[:, 0], mx[:, 0]
    return kx, mx


def _apply_k(elem_dofs, k_blocks, x, n_dofs):
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    chunking = x.dtype == jnp.float64
    e = elem_dofs.shape[0]
    pad = (-e) % MATVEC_CHUNK if (chunking and e > MATVEC_CHUNK) else 0
    kb_p = jnp.pad(k_blocks, ((0, pad), (0, 0), (0, 0))) if pad else k_blocks

    def per_chunk(dofs_c, c, xe):
        kb = (
            jax.lax.dynamic_slice_in_dim(kb_p, c * MATVEC_CHUNK, MATVEC_CHUNK)
            if chunking and e > MATVEC_CHUNK
            else kb_p
        )
        return jnp.einsum("eij,ejp->eip", kb, xe)

    y = _chunked_apply(elem_dofs, x, n_dofs, per_chunk, chunking)
    return y[:, 0] if squeeze else y


# Elements per split-apply chunk: the f64-accumulated element products are the only
# wide temporary, (chunk, 30, p) f64 — 4096*30*271*8 ≈ 266 MB at bench panel width.
SPLIT_CHUNK = 4096


def _apply_k_split(elem_dofs, k_hi, k_lo, x, n_dofs):
    """y = (k_hi + k_lo) @ x with f32 element blocks and f64 accumulation.

    Each chunk: gather the f32 panel, run BOTH split products as f32-input einsums
    with preferred_element_type=f64 (XLA upcasts the 30-term products to f64 — exact,
    since f32*f32 is representable in f64), sum, and segment-add in f64. See
    ElementOperators.kmat_split for the accuracy budget."""
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    e = elem_dofs.shape[0]

    def chunk_sum(dofs_c, hi_c, lo_c):
        xe = x[dofs_c]  # (c, 30, p) f32
        ye = jnp.einsum("eij,ejp->eip", hi_c, xe, preferred_element_type=jnp.float64)
        ye = ye + jnp.einsum("eij,ejp->eip", lo_c, xe, preferred_element_type=jnp.float64)
        return jax.ops.segment_sum(
            ye.reshape(-1, ye.shape[2]), dofs_c.reshape(-1), num_segments=n_dofs
        )

    if e <= SPLIT_CHUNK:
        y = chunk_sum(elem_dofs, k_hi, k_lo)
    else:
        n_chunks = -(-e // SPLIT_CHUNK)
        pad = n_chunks * SPLIT_CHUNK - e
        dofs_p = jnp.pad(elem_dofs, ((0, pad), (0, 0)))  # pad rows scatter 0 into dof 0
        hi_p = jnp.pad(k_hi, ((0, pad), (0, 0), (0, 0)))
        lo_p = jnp.pad(k_lo, ((0, pad), (0, 0), (0, 0)))

        def body(c, acc):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c * SPLIT_CHUNK, SPLIT_CHUNK)  # noqa: E731
            return acc + chunk_sum(sl(dofs_p), sl(hi_p), sl(lo_p))

        y = jax.lax.fori_loop(
            0, n_chunks, body, jnp.zeros((n_dofs, x.shape[1]), jnp.float64)
        )
    return y[:, 0] if squeeze else y


def _apply_m(elem_dofs, rho_vol, m_unit, x, n_dofs):
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    chunking = x.dtype == jnp.float64
    e = elem_dofs.shape[0]
    pad = (-e) % MATVEC_CHUNK if (chunking and e > MATVEC_CHUNK) else 0
    rv_p = jnp.pad(rho_vol, (0, pad)) if pad else rho_vol

    def per_chunk(dofs_c, c, xe):
        rv = (
            jax.lax.dynamic_slice_in_dim(rv_p, c * MATVEC_CHUNK, MATVEC_CHUNK)
            if chunking and e > MATVEC_CHUNK
            else rv_p
        )
        return rv[:, None, None] * jnp.einsum("ij,ejp->eip", m_unit, xe)

    y = _chunked_apply(elem_dofs, x, n_dofs, per_chunk, chunking)
    return y[:, 0] if squeeze else y


def _element_basis(points: jax.Array, tets: jax.Array):
    """Per-element volume and linear barycentric gradients Phig (E, 4, 3)."""
    v = points[tets]  # (E, 4, 3)
    d1 = v[:, 1] - v[:, 0]
    d2 = v[:, 2] - v[:, 0]
    d3 = v[:, 3] - v[:, 0]
    det = jnp.einsum("ei,ei->e", d1, jnp.cross(d2, d3))  # signed 6V
    inv_det = 1.0 / det
    g1 = jnp.cross(d2, d3) * inv_det[:, None]
    g2 = jnp.cross(d3, d1) * inv_det[:, None]
    g3 = jnp.cross(d1, d2) * inv_det[:, None]
    g0 = -(g1 + g2 + g3)
    phig = jnp.stack([g0, g1, g2, g3], axis=1)  # (E, 4, 3)
    volume = jnp.abs(det) / 6.0
    return volume, phig


@partial(jax.jit, static_argnames=("n_dofs", "chunk"))
def _build_k_blocks(points, tets, grad_tab, lam, mu, n_dofs, chunk=4096):
    volume, phig = _element_basis(points, tets)

    def one_chunk(args):
        vol_c, phig_c = args
        # G[e, a, c, p, q] = sum_kl grad_tab[a,k,c,l] phig[e,k,p] phig[e,l,q]
        g = jnp.einsum("akcl,ekp,elq->eacpq", grad_tab, phig_c, phig_c)
        tr = jnp.einsum("eacpp->eac", g)
        eye3 = jnp.eye(3, dtype=g.dtype)
        k = lam * g + mu * jnp.swapaxes(g, -1, -2) + mu * tr[..., None, None] * eye3
        k = k * vol_c[:, None, None, None, None]
        # (e, a, c, p, q) -> (e, a, p, c, q) -> (e, 30, 30); dof layout is 3*node + component
        k = jnp.transpose(k, (0, 1, 3, 2, 4))
        return k.reshape(k.shape[0], 30, 30)

    e = tets.shape[0]
    pad = (-e) % chunk
    vol_p = jnp.pad(volume, (0, pad))
    phig_p = jnp.pad(phig, ((0, pad), (0, 0), (0, 0)))
    vol_b = vol_p.reshape(-1, chunk)
    phig_b = phig_p.reshape(-1, chunk, 4, 3)
    k_all = jax.lax.map(one_chunk, (vol_b, phig_b))
    return k_all.reshape(-1, 30, 30)[:e], volume


def _build_k_blocks_host(points, tets, grad_tab, lam, mu):
    """numpy fallback for the CPU backend, where XLA executes the tiny-dimension einsums
    pathologically slowly. Same math as `_build_k_blocks`."""
    v = points[tets]
    d1, d2, d3 = v[:, 1] - v[:, 0], v[:, 2] - v[:, 0], v[:, 3] - v[:, 0]
    det = np.einsum("ei,ei->e", d1, np.cross(d2, d3))
    inv_det = 1.0 / det
    g1 = np.cross(d2, d3) * inv_det[:, None]
    g2 = np.cross(d3, d1) * inv_det[:, None]
    g3 = np.cross(d1, d2) * inv_det[:, None]
    phig = np.stack([-(g1 + g2 + g3), g1, g2, g3], axis=1)
    volume = np.abs(det) / 6.0
    g = np.einsum("akcl,ekp,elq->eacpq", grad_tab, phig, phig, optimize=True)
    tr = np.einsum("eacpp->eac", g)
    eye3 = np.eye(3)
    k = lam * g + mu * np.swapaxes(g, -1, -2) + mu * tr[..., None, None] * eye3
    k *= volume[:, None, None, None, None]
    k = np.transpose(k, (0, 1, 3, 2, 4)).reshape(-1, 30, 30)
    return k, volume


@partial(jax.jit, static_argnames=("n_dofs",))
def _orphan_fixes(k_blocks, rho_vol, m_unit, elem_dofs, n_dofs: int):
    """Orphan-dof parking diagonals, computed ON DEVICE (the round-4 host version
    downloaded the (E, 30) diagonal panel through the tunnel every solve).

    Parking must be SCALE-AWARE: parking at k/m = 1e20 (round 1) made the parked
    directions' Gram entries ~1e20, whose float32 rounding noise (~1e13) is the
    size of the real spectrum and poisons the f32 Rayleigh-Ritz with huge spurious
    negative Ritz values. Parking at ~100x the pencil's own lambda_max keeps
    orphans sorted far above the audible window at healthy f32 magnitudes."""
    ids = elem_dofs.reshape(-1)
    k_diag_e = jnp.diagonal(k_blocks, axis1=1, axis2=2).reshape(-1)
    m_diag_e = (rho_vol[:, None] * jnp.diagonal(m_unit)[None, :]).reshape(-1)
    k_diag = jax.ops.segment_sum(k_diag_e, ids, num_segments=n_dofs)
    m_diag = jax.ops.segment_sum(m_diag_e, ids, num_segments=n_dofs)
    touched = jax.ops.segment_sum(jnp.ones_like(ids, jnp.float32), ids,
                                  num_segments=n_dofs) > 0
    live = touched & (m_diag > 0)
    any_live = jnp.any(live)
    ratio = jnp.where(live, k_diag / jnp.where(live, m_diag, 1.0), 0.0)
    lam_est = jnp.where(any_live, jnp.max(ratio), 1.0)
    m_scale = jnp.where(
        any_live,
        jnp.nanmedian(jnp.where(live, m_diag, jnp.nan)),
        1.0,
    )
    k_fix = jnp.where(touched, 0.0, 100.0 * lam_est * m_scale)
    m_fix = jnp.where(touched, 0.0, m_scale)
    return k_fix, m_fix


def assemble_element_matrices(
    points: np.ndarray,
    tets: np.ndarray,
    material: AcousticMaterialProperties,
    quad: QuadMesh,
    dtype=jnp.float64,
) -> ElementOperators:
    """Build the element-form pencil operators for a (filtered) tet mesh."""
    mass_tab, grad_tab = quad_basis()
    lam = material.lame_lambda()
    mu = material.lame_mu()
    n_dofs = 3 * quad.node_count
    tets_i32 = np.asarray(tets, dtype=np.int32)
    if jax.default_backend() == "cpu":
        k_blocks, volume = _build_k_blocks_host(
            np.asarray(points, dtype=np.float64), tets_i32, grad_tab, lam, mu
        )
        k_blocks, volume = jnp.asarray(k_blocks), jnp.asarray(volume)
    else:
        k_blocks, volume = _build_k_blocks(
            jnp.asarray(points, dtype=jnp.float64),
            jnp.asarray(tets_i32),
            jnp.asarray(grad_tab),
            lam,
            mu,
            n_dofs,
        )
    m_unit = jnp.kron(jnp.asarray(mass_tab), jnp.eye(3))  # (30, 30)
    nodes = jnp.asarray(quad.element_nodes.astype(np.int32))
    elem_dofs = (3 * nodes[:, :, None] + jnp.arange(3, dtype=jnp.int32)).reshape(-1, 30)
    rho_vol = (material.density * volume).astype(dtype)
    k_fix, m_fix = _orphan_fixes(k_blocks, rho_vol, m_unit, elem_dofs, n_dofs)
    k_fix = k_fix.astype(dtype)
    m_fix = m_fix.astype(dtype)
    k_hi = k_blocks.astype(jnp.float32)
    # Macro-element clustering for the preconditioner apply (fem/cluster.py): a
    # 50 ms host pass that buys ~2.5x fewer gather/scatter rows per inner-PCG step.
    from .cluster import cluster_tets

    macro_nodes_np, elem_macro_np, elem_slot_np = cluster_tets(
        np.asarray(quad.element_nodes))
    elem_macro_d = jnp.asarray(elem_macro_np)
    elem_slot_d = jnp.asarray(elem_slot_np)
    # Macro K/M blocks for the fused kmmat pass (same f32 sums the element
    # segment-sum computes, reassociated — see kmmat_f32).
    m_blocks_f32 = (rho_vol.astype(jnp.float32)[:, None, None]
                    * m_unit.astype(jnp.float32)[None])
    macro_km = _bake_macro_blocks(
        jnp.stack([k_hi, m_blocks_f32]), elem_macro_d, elem_slot_d,
        int(macro_nodes_np.shape[0]), int(macro_nodes_np.shape[1]))
    return ElementOperators(
        elem_dofs=elem_dofs,
        elem_nodes=nodes,
        k_blocks=k_blocks.astype(dtype),
        k_blocks_f32=k_hi,
        k_lo=(k_blocks.astype(jnp.float64) - k_hi.astype(jnp.float64)).astype(jnp.float32),
        rho_vol=rho_vol,
        rho_vol_f32=rho_vol.astype(jnp.float32),
        m_unit=m_unit.astype(dtype),
        k_fix=k_fix,
        m_fix=m_fix,
        macro_nodes=jnp.asarray(macro_nodes_np),
        elem_macro=elem_macro_d,
        elem_slot=elem_slot_d,
        macro_km=macro_km,
        n_dofs=n_dofs,
    )


def pencil_diagonals(ops: ElementOperators):
    """diag(K) and diag(M), scattered from the element blocks (for Jacobi preconditioning)."""
    e = ops.elem_dofs.shape[0]
    k_diag_e = jnp.diagonal(ops.k_blocks, axis1=1, axis2=2)  # (E, 30)
    m_diag_e = ops.rho_vol[:, None] * jnp.diagonal(ops.m_unit)[None, :]  # (E, 30)
    flat_ids = ops.elem_dofs.reshape(-1)
    k_diag = jax.ops.segment_sum(k_diag_e.reshape(-1), flat_ids, num_segments=ops.n_dofs)
    m_diag = jax.ops.segment_sum(m_diag_e.reshape(-1), flat_ids, num_segments=ops.n_dofs)
    return k_diag + ops.k_fix, m_diag + ops.m_fix
