"""Microbench the primitives inside the outer iteration: where do the milliseconds go?

Run on the real chip: python scripts/diag_prims.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mesheditor_tpu.fem.assembly import (
    assemble_element_matrices, filter_degenerate,
)
from mesheditor_tpu.fem.quad_mesh import build_quad_mesh
from mesheditor_tpu.materials import CERAMIC
from mesheditor_tpu.mesh import box_tets


def timeit(label, fn, *args, n=10, **kwargs):
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:46s} {dt * 1e3:9.3f} ms")
    return out, dt


def main():
    mesh = box_tets((0.3, 0.16, 0.15), (18, 10, 9))
    kept = filter_degenerate(mesh.points, mesh.tets)
    quad = build_quad_mesh(kept, mesh.points.shape[0])
    ops = assemble_element_matrices(mesh.points, kept, CERAMIC.properties, quad)
    n = ops.n_dofs
    n_nodes = n // 3
    e = ops.elem_nodes.shape[0]
    p = 256
    print(f"n={n} n_nodes={n_nodes} E={e} p={p}")

    key = jax.random.PRNGKey(0)
    x3 = jax.random.normal(key, (n_nodes, 3 * p), dtype=jnp.float32)
    elem_nodes = ops.elem_nodes
    blocks = ops.k_blocks_f32

    with jax.default_matmul_precision("highest"):
        g = jax.jit(lambda x: x[elem_nodes])
        xe, _ = timeit("gather x3[elem_nodes] (E,10,3p)", g, x3)

        ein = jax.jit(lambda xe: jnp.einsum(
            "eij,ejp->eip", blocks, xe.reshape(e, 30, p)))
        ye, _ = timeit("einsum blocks @ xe", ein, xe)

        seg = jax.jit(lambda ye: jax.ops.segment_sum(
            ye.reshape(e * 10, 3 * p), elem_nodes.reshape(-1), num_segments=n_nodes))
        timeit("segment_sum (unsorted)", seg, ye)

        # sorted variant
        flat = np.asarray(elem_nodes).reshape(-1)
        order = np.argsort(flat, kind="stable")
        order_d = jnp.asarray(order)
        sorted_ids = jnp.asarray(flat[order])
        seg_s = jax.jit(lambda ye: jax.ops.segment_sum(
            ye.reshape(e * 10, 3 * p)[order_d], sorted_ids, num_segments=n_nodes,
            indices_are_sorted=True))
        timeit("perm + segment_sum (sorted)", seg_s, ye)

        # gather-gather: pad contributions per node to C buckets
        counts = np.bincount(flat, minlength=n_nodes)
        cmax = int(counts.max())
        print(f"contribution counts: mean={counts.mean():.1f} max={cmax}")
        pad_idx = np.full((n_nodes, cmax), e * 10, np.int32)  # points at zero row
        pos = np.zeros(n_nodes, np.int64)
        for row, node in enumerate(flat):
            pad_idx[node, pos[node]] = row
            pos[node] += 1
        pad_idx_d = jnp.asarray(pad_idx)

        def gg(ye):
            rows = jnp.concatenate(
                [ye.reshape(e * 10, 3 * p),
                 jnp.zeros((1, 3 * p), ye.dtype)], 0)
            return rows[pad_idx_d].sum(1)

        timeit(f"gather-gather (C={cmax})", jax.jit(gg), ye)

        # dense eigh sizes
        for m in (265, 795):
            a = jax.random.normal(key, (m, m), jnp.float32)
            a = a @ a.T + m * jnp.eye(m)
            timeit(f"f32 eigh ({m})", jax.jit(jnp.linalg.eigh), a, n=3)
            a64 = a.astype(jnp.float64)
            timeit(f"f64 cholesky ({m})", jax.jit(jnp.linalg.cholesky), a64, n=3)
            ell = jnp.linalg.cholesky(a64)
            st = jax.jit(lambda l: jax.scipy.linalg.solve_triangular(
                l, jnp.eye(l.shape[0], dtype=l.dtype), lower=True))
            timeit(f"f64 tri-inverse ({m})", st, ell, n=3)
            st32 = jax.jit(lambda l: jax.scipy.linalg.solve_triangular(
                l.astype(jnp.float32),
                jnp.eye(l.shape[0], dtype=jnp.float32), lower=True))
            timeit(f"f32 tri-inverse ({m})", st32, ell, n=3)

        # host round-trip of the 3p Gram (RR-on-host option through the tunnel)
        a795 = jax.random.normal(key, (795, 795), jnp.float64)
        jax.block_until_ready(a795)

        def roundtrip():
            ah = np.asarray(jax.device_get(a795))
            return jnp.asarray(ah).block_until_ready()

        timeit("host roundtrip 795^2 f64 (5MB each way)", roundtrip, n=5)

        th = np.zeros((795, 265))

        def host_eigh():
            ah = np.asarray(jax.device_get(a795))
            w, v = np.linalg.eigh(ah)
            return jnp.asarray(v[:, :265]).block_until_ready()

        timeit("host eigh 795 + roundtrip", host_eigh, n=3)

        # small matmul dispatch floor
        sm = jax.jit(lambda u, v: u @ v)
        u = jax.random.normal(key, (795, 795), jnp.float32)
        timeit("f32 matmul 795^2 (dispatch floor)", sm, u, u)
        timeit("recombine (n,795)@(795,265) f32", sm,
               jax.random.normal(key, (n, 795), jnp.float32),
               jax.random.normal(key, (795, 265), jnp.float32))


if __name__ == "__main__":
    main()
