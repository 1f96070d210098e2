"""Bisect the fused LOBPCG stage's on-device cost at bench shapes (TPU diagnostics).

Rebuilds fused_stage from the same pieces as solve/lobpcg.py with parts toggled, so the
per-piece cost is measured in situ (fusion context included), not as isolated kernels.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import mesheditor_tpu  # noqa: F401  (x64 config)
from mesheditor_tpu.mesh import box_tets
from mesheditor_tpu.fem import (
    assemble_element_matrices, build_quad_mesh, filter_degenerate, pencil_diagonals,
)
from mesheditor_tpu.materials import CERAMIC
from mesheditor_tpu.solve.lobpcg import _col_dots, _pcg_block


def main():
    mesh = box_tets((0.3, 0.16, 0.15), (18, 10, 9))
    kept = filter_degenerate(mesh.points, mesh.tets)
    quad = build_quad_mesh(kept, mesh.points.shape[0])
    ops = assemble_element_matrices(mesh.points, kept, CERAMIC.properties, quad)
    n, p = ops.n_dofs, 271
    q = 3 * p
    sigma = -((2 * np.pi * 20.0) ** 2)
    kd, md = pencil_diagonals(ops)
    inv32 = (1.0 / (kd - sigma * md)).astype(jnp.float32)
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.standard_normal((n, q)))
    ks = jnp.asarray(rng.standard_normal((n, q)))
    ms = jnp.asarray(rng.standard_normal((n, q)))
    cu = jnp.asarray(rng.standard_normal((q + 1, p)).astype(np.float32))

    def normalize_cols(block, mb):
        cn = _col_dots(block, mb)
        live = cn > 1e-300
        d = jnp.where(live, 1.0 / jnp.sqrt(jnp.where(live, cn, 1.0)), 0.0)
        return block * d[None, :], mb * d[None, :]

    def precond(r):
        def apply_shifted(x):
            return ops.kmat_f32(x) - np.float32(sigma) * ops.mmat_f32(x)

        z = _pcg_block(apply_shifted, inv32, r.astype(jnp.float32), 24)
        return z.astype(r.dtype)

    def stage(s_in, ks_in, ms_in, cu, *, do_pcg=True, do_kwmw=True, do_p=True,
              do_gram=True):
        c = cu[:-1].astype(s_in.dtype)
        theta = cu[-1].astype(s_in.dtype)
        c_wp = jnp.where((jnp.arange(c.shape[0]) >= p)[:, None], c, 0.0)
        x = s_in @ c
        kx = ks_in @ c
        mx = ms_in @ c
        pdir = s_in @ c_wp
        kp = ks_in @ c_wp
        mp = ms_in @ c_wp
        r = kx - mx * theta[None, :]
        w = precond(r) if do_pcg else inv32[:, None].astype(r.dtype) * r
        mw_pre = ops.mmat_f32(w.astype(jnp.float32)).astype(w.dtype)
        pre2 = _col_dots(w, mw_pre)
        w = w - x @ (mx.T @ w)
        if do_kwmw:
            mw = ops.mmat(w)
        else:
            mw = mw_pre
        post2 = _col_dots(w, mw)
        live = post2 > 1e-14 * jnp.maximum(pre2, 1e-300)
        w = jnp.where(live[None, :], w, 0.0)
        mw = jnp.where(live[None, :], mw, 0.0)
        w, mw = normalize_cols(w, mw)
        kw = ops.kmat(w) if do_kwmw else kx
        if do_p:
            pre2p = _col_dots(pdir, mp)
            qq = mx.T @ pdir
            pdir = pdir - x @ qq
            mp = mp - mx @ qq
            kp = kp - kx @ qq
            post2p = _col_dots(pdir, mp)
            livep = post2p > 1e-14 * jnp.maximum(pre2p, 1e-300)
            pdir = jnp.where(livep[None, :], pdir, 0.0)
            mp = jnp.where(livep[None, :], mp, 0.0)
            kp = jnp.where(livep[None, :], kp, 0.0)
            cn = _col_dots(pdir, mp)
            livec = cn > 1e-300
            d = jnp.where(livec, 1.0 / jnp.sqrt(jnp.where(livec, cn, 1.0)), 0.0)
            pdir = pdir * d[None, :]
            mp = mp * d[None, :]
            kp = kp * d[None, :]
        s2 = jnp.concatenate([x, w, pdir], axis=1)
        ks2 = jnp.concatenate([kx, kw, kp], axis=1)
        ms2 = jnp.concatenate([mx, mw, mp], axis=1)
        if do_gram:
            a = s2.T @ ks2
            b = s2.T @ ms2
        else:
            a = jnp.zeros((q, q), s2.dtype)
            b = jnp.zeros((q, q), s2.dtype)
        return s2, ks2, ms2, a, b.astype(jnp.float32)

    variants = {
        "full": dict(),
        "no_pcg": dict(do_pcg=False),
        "no_kwmw": dict(do_kwmw=False),
        "no_p": dict(do_p=False),
        "no_gram": dict(do_gram=False),
    }
    for name, kw in variants.items():
        fn = jax.jit(lambda s, ks, ms, cu, _kw=kw: stage(s, ks, ms, cu, **_kw))
        out = fn(s, ks, ms, cu)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(s, ks, ms, cu)
        jax.block_until_ready(out)
        print(f"{name:10s} {(time.perf_counter() - t0) / 3 * 1e3:8.0f} ms", flush=True)


if __name__ == "__main__":
    main()
