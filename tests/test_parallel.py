"""Sharding-invariance properties over the virtual 8-device CPU mesh (the §4 discipline:
the reference proves renderer-count invariance, ModalRenderTest.cpp:245-255; here the
device count must be just as invisible — sharded results equal single-device results)."""

import jax
import jax.numpy as jnp
import numpy as np

from mesheditor_tpu.fem import (
    assemble_element_matrices, build_quad_mesh, filter_degenerate,
)
from mesheditor_tpu.materials import CERAMIC
from mesheditor_tpu.mesh import bar_tets
from mesheditor_tpu.parallel import (
    batched_render_step, make_mesh, shard_elements, sharded_pencil_ops,
    sharded_subspace_step,
)


def _pencil():
    bar = bar_tets(0.2, 0.05, 0.05, 4, 2, 2)
    kept = filter_degenerate(bar.points, bar.tets)
    quad = build_quad_mesh(kept, bar.points.shape[0])
    ops = assemble_element_matrices(bar.points, kept, CERAMIC.properties, quad)
    return ops


class TestShardedPencil:
    def test_sharded_matvecs_match_single_device(self):
        ops = _pencil()
        mesh = make_mesh(8)
        assert mesh.shape["dp"] * mesh.shape["tp"] == 8
        ed, kb, rv = shard_elements(
            np.asarray(ops.elem_dofs), np.asarray(ops.k_blocks),
            np.asarray(ops.rho_vol), mesh)
        kmat, mmat = sharded_pencil_ops(mesh, ed, kb, rv, ops.m_unit, ops.n_dofs)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((ops.n_dofs, 6)))
        np.testing.assert_allclose(np.asarray(kmat(x)), np.asarray(ops.kmat(x)),
                                   rtol=1e-12, atol=1e-6)
        np.testing.assert_allclose(np.asarray(mmat(x)), np.asarray(ops.mmat(x)),
                                   rtol=1e-12, atol=1e-20)

    def test_mesh_size_invariance(self):
        """2-device and 8-device meshes produce identical pencil products."""
        ops = _pencil()
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((ops.n_dofs, 4)))
        outs = []
        for n in (2, 8):
            mesh = make_mesh(n)
            ed, kb, rv = shard_elements(
                np.asarray(ops.elem_dofs), np.asarray(ops.k_blocks),
                np.asarray(ops.rho_vol), mesh)
            kmat, _ = sharded_pencil_ops(mesh, ed, kb, rv, ops.m_unit, ops.n_dofs)
            outs.append(np.asarray(kmat(x)))
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-12, atol=1e-6)

    def test_subspace_step_refines_rayleigh_quotients(self):
        ops = _pencil()
        mesh = make_mesh(8)
        ed, kb, rv = shard_elements(
            np.asarray(ops.elem_dofs), np.asarray(ops.k_blocks),
            np.asarray(ops.rho_vol), mesh)
        kmat, mmat = sharded_pencil_ops(mesh, ed, kb, rv, ops.m_unit, ops.n_dofs)
        step = sharded_subspace_step(mesh, kmat, mmat)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((ops.n_dofs, 8)))
        sigma = -((2 * np.pi * 20.0) ** 2)
        x1, theta1 = step(x, sigma)
        x2, theta2 = step(x1, sigma)
        t1 = np.sort(np.asarray(theta1))
        t2 = np.sort(np.asarray(theta2))
        assert np.isfinite(t1).all() and np.isfinite(t2).all()
        # Rayleigh-Ritz refinement is monotone on the smallest Ritz value.
        assert t2[0] <= t1[0] + 1e-6 * abs(t1[0])


class TestShardedRender:
    def _bank(self, n_obj=16, k=8, s=64):
        rng = np.random.default_rng(3)
        z = jnp.zeros((n_obj, k))
        c_re = jnp.asarray(np.full((n_obj, k), 0.995))
        c_im = jnp.asarray(rng.uniform(0.01, 0.1, (n_obj, k)))
        gains = jnp.asarray(rng.uniform(0.5, 1.5, n_obj))
        excite = jnp.asarray(rng.standard_normal(s))
        return z, c_re, c_im, gains, excite

    def _reference_mix(self, z, c_re, c_im, gains, excite):
        z_re = np.asarray(z).copy()
        z_im = np.asarray(z).copy()
        out = []
        for e in np.asarray(excite):
            new_re = z_re * np.asarray(c_re) - z_im * np.asarray(c_im) + e
            new_im = z_re * np.asarray(c_im) + z_im * np.asarray(c_re)
            z_re, z_im = new_re, new_im
            out.append((np.asarray(gains)[:, None] * new_im).sum())
        return np.asarray(out)

    def test_sharded_mix_matches_reference(self):
        mesh = make_mesh(8)
        step = batched_render_step(mesh)
        z, c_re, c_im, gains, excite = self._bank()
        _, _, out = step(z, z, c_re, c_im, gains, excite)
        np.testing.assert_allclose(np.asarray(out),
                                   self._reference_mix(z, c_re, c_im, gains, excite),
                                   rtol=1e-10, atol=1e-10)

    def test_device_count_invariance(self):
        """The dp width must not change the mix (the renderer-count invariance of
        ModalRenderTest, device edition)."""
        z, c_re, c_im, gains, excite = self._bank(n_obj=8)
        outs = []
        for n in (1, 2, 8):
            mesh = make_mesh(n)
            step = batched_render_step(mesh)
            _, _, out = step(z, z, c_re, c_im, gains, excite)
            outs.append(np.asarray(out))
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(outs[0], outs[2], rtol=1e-12, atol=1e-12)
