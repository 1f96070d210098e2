"""Split-K two-float operator apply: accuracy against the true f64 element apply.

The eigensolver's f32 iteration stage applies K to the f32 panel through
`ElementOperators.kmat_split` (k_hi + k_lo, f64 accumulation) instead of the chunked
emulated-f64 `kmat`. The wanted Rayleigh quotients see the difference amplified by the
residual-cancellation factor (~1e5-6 at FEM conditioning), so the apply itself must be
~2^-48-grade, not just eps32-grade. Reference role: the exactness the C++ path gets for
free from Eigen's f64 sparse matvec (src/audio/mesh2modes.cpp:273-327).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mesheditor_tpu.fem.assembly import assemble_element_matrices, filter_degenerate
from mesheditor_tpu.fem.quad_mesh import build_quad_mesh
from mesheditor_tpu.materials import CERAMIC
from mesheditor_tpu.mesh import box_tets


def _ops(res=(5, 4, 3)):
    mesh = box_tets((0.3, 0.16, 0.15), res)
    kept = filter_degenerate(mesh.points, mesh.tets)
    quad = build_quad_mesh(kept, mesh.points.shape[0])
    return assemble_element_matrices(mesh.points, kept, CERAMIC.properties, quad)


def test_kmat_split_matches_f64_apply():
    ops = _ops()
    x = jax.random.normal(jax.random.PRNGKey(3), (ops.n_dofs, 7), dtype=jnp.float32)
    y_split = np.asarray(ops.kmat_split(x))
    y_true = np.asarray(ops.kmat(x.astype(jnp.float64)))
    assert y_split.dtype == np.float64
    # Relative to the panel's K-image magnitude: the split truncation is ~2^-48 of
    # ||K|| |x|, far below 1e-11 of the result norm for a random (non-cancelling) panel.
    denom = np.linalg.norm(y_true)
    assert np.linalg.norm(y_split - y_true) / denom < 1e-11


def test_kmat_split_chunked_path():
    # Force the fori_loop chunking branch by shrinking the chunk size.
    from mesheditor_tpu.fem import assembly

    ops = _ops()
    x = jax.random.normal(jax.random.PRNGKey(4), (ops.n_dofs, 3), dtype=jnp.float32)
    y_ref = np.asarray(ops.kmat_split(x))
    orig = assembly.SPLIT_CHUNK
    try:
        assembly.SPLIT_CHUNK = 64
        y_chunked = np.asarray(ops.kmat_split(x))
    finally:
        assembly.SPLIT_CHUNK = orig
    np.testing.assert_allclose(y_chunked, y_ref, rtol=1e-13, atol=0)


def test_kmat_split_vector_input():
    ops = _ops((3, 3, 3))
    x = jax.random.normal(jax.random.PRNGKey(5), (ops.n_dofs,), dtype=jnp.float32)
    y = np.asarray(ops.kmat_split(x))
    y_true = np.asarray(ops.kmat(x.astype(jnp.float64)))
    assert y.shape == (ops.n_dofs,)
    assert np.linalg.norm(y - y_true) / np.linalg.norm(y_true) < 1e-11
