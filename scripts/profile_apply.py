"""Profile the FEM K/M apply at bench scale on the live backend.

Dissects one `ElementOperators.kmmat_f32` into its stages (gather, element matmul,
scatter) and times candidate restructurings, to direct optimization of the
eigensolver's wall-clock dominant op.

ROUND-5 FINDINGS (from the since-deleted probe_* scripts; kept here as the apply
perf playbook):
- The apply is ROW-RATE-bound, not byte-bound: v5e gather AND segment-sum both run
  ~24M rows/s nearly independent of row width (bf16 rows bought ~12%, not 2x).
  The wins that worked cut ROWS: node-granularity rows (r3, 1.5x), macro-element
  clustering (r5, fem/cluster.py, 2.4x fewer rows -> amat_pc 8.7 -> 4.6 ms), and
  node-granular AMG transfers (r5, 6x fewer restriction/prolongation rows).
- Pallas cannot help here today: Mosaic's gather lowering (tpu.dynamic_gather)
  rejects tables with multiple vregs along the gather dimension, so arbitrary
  in-kernel row gathers are unsupported; usable VMEM measured ~16 MB.
- Dense-tile (BCSR) reformulations lose: 3D meshes at 128-512-dof tiles fill
  2-4% -> 9-36x flop/storage waste even under RCM ordering.
- The (C,30,30)@(C,30,p) batched matmul runs ~1.4 TFLOP/s (tiny contraction);
  macro blocks at (144,144) fill the MXU far better.

Run on the TPU: `python scripts/profile_apply.py [panel_width]`;
see also scripts/profile_iter.py for the whole-iteration breakdown.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mesheditor_tpu.fem.assembly import assemble_element_matrices, filter_degenerate
from mesheditor_tpu.fem.quad_mesh import build_quad_mesh
from mesheditor_tpu.materials import CERAMIC
from mesheditor_tpu.mesh import box_tets


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    mesh = box_tets((0.3, 0.16, 0.15), (18, 10, 9))
    tets = filter_degenerate(mesh.points, mesh.tets)
    quad = build_quad_mesh(tets, mesh.points.shape[0])
    ops = assemble_element_matrices(mesh.points, tets, CERAMIC.properties, quad)
    e = ops.elem_nodes.shape[0]
    n_dofs = ops.n_dofs
    n_nodes = n_dofs // 3
    print(f"E={e} n_dofs={n_dofs} n_nodes={n_nodes} p={p}")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n_dofs, p)), jnp.float32)
    x3 = x.reshape(n_nodes, 3 * p)
    nodes = ops.elem_nodes
    blocks = ops.k_blocks_f32

    flops = 2 * e * 30 * 30 * p
    ms = timeit(jax.jit(ops.kmat_f32), x)
    print(f"kmat_f32 (full apply):       {ms:7.3f} ms  {flops/ms/1e9:.0f} GFLOP/s")
    ms2 = timeit(jax.jit(ops.kmmat_f32), x)
    print(f"kmmat_f32 (fused K+M):       {ms2:7.3f} ms")

    # Stage 1: gather only
    gather = jax.jit(lambda x3: x3[nodes])
    msg = timeit(gather, x3)
    gb = e * 10 * 3 * p * 4 / 1e9
    print(f"gather (E,10,3p):            {msg:7.3f} ms  {gb/ (msg/1e3):.0f} GB/s ({gb*1e3:.0f} MB)")

    # Stage 2: element matmul only (pre-gathered input)
    xe = x3[nodes].reshape(e, 30, p)
    mm = jax.jit(lambda xe: jnp.einsum("eij,ejp->eip", blocks, xe))
    msm = timeit(mm, xe)
    print(f"einsum (E,30,30)x(E,30,p):   {msm:7.3f} ms  {flops/msm/1e9:.0f} GFLOP/s")

    # Stage 2b: einsum reshaped as one big (30, 30) x ... impossible; try bf16
    mmb = jax.jit(lambda xe: jnp.einsum("eij,ejp->eip", blocks.astype(jnp.bfloat16),
                                        xe.astype(jnp.bfloat16)))
    msb = timeit(mmb, xe)
    print(f"einsum bf16:                 {msb:7.3f} ms  {flops/msb/1e9:.0f} GFLOP/s")

    # Stage 3: segment-sum scatter only (pre-computed products)
    ye = np.asarray(mm(xe)).reshape(e * 10, 3 * p)
    ye = jnp.asarray(ye)
    seg_ids = nodes.reshape(-1)
    seg = jax.jit(lambda ye: jax.ops.segment_sum(ye, seg_ids, num_segments=n_nodes))
    mss = timeit(seg, ye)
    print(f"segment_sum (E*10 rows):     {mss:7.3f} ms")

    # Variant A: pre-sorted contributions -> permutation gather + sorted segment_sum
    order = np.argsort(np.asarray(seg_ids), kind="stable")
    order_j = jnp.asarray(order.astype(np.int32))
    ids_sorted = jnp.asarray(np.asarray(seg_ids)[order])
    segs = jax.jit(lambda ye: jax.ops.segment_sum(
        ye[order_j], ids_sorted, num_segments=n_nodes, indices_are_sorted=True))
    msas = timeit(segs, ye)
    print(f"perm-gather + sorted segsum: {msas:7.3f} ms")

    # Variant B: CSR transpose (node -> contributions) as gather + masked sum
    ids_np = np.asarray(seg_ids)
    counts = np.bincount(ids_np, minlength=n_nodes)
    maxdeg = int(counts.max())
    csr = np.zeros((n_nodes, maxdeg), np.int32)
    fill = np.zeros(n_nodes, np.int32)
    for row, nid in enumerate(ids_np):
        csr[nid, fill[nid]] = row
        fill[nid] += 1
    mask = (np.arange(maxdeg)[None, :] < counts[:, None])
    # Dead slots point at row 0 with mask 0 -> gather garbage then zero it.
    csr_j = jnp.asarray(csr)
    mask_j = jnp.asarray(mask.astype(np.float32))[:, :, None]
    csrsum = jax.jit(lambda ye: (ye[csr_j] * mask_j).sum(1))
    msc = timeit(csrsum, ye)
    print(f"CSR gather-sum (maxdeg={maxdeg}): {msc:7.3f} ms")

    # Variant C: full fused apply with sorted segment sum
    def apply_sorted(x3):
        xe = x3[nodes].reshape(e, 30, p)
        ye = jnp.einsum("eij,ejp->eip", blocks, xe).reshape(e * 10, 3 * p)
        return jax.ops.segment_sum(ye[order_j], ids_sorted, num_segments=n_nodes,
                                   indices_are_sorted=True)
    msf = timeit(jax.jit(apply_sorted), x3)
    print(f"fused apply (sorted segsum): {msf:7.3f} ms")

    # Variant D: fused apply with CSR gather-sum
    def apply_csr(x3):
        xe = x3[nodes].reshape(e, 30, p)
        ye = jnp.einsum("eij,ejp->eip", blocks, xe).reshape(e * 10, 3 * p)
        return (ye[csr_j] * mask_j).sum(1)
    msd = timeit(jax.jit(apply_csr), x3)
    print(f"fused apply (CSR):           {msd:7.3f} ms")


if __name__ == "__main__":
    main()
