"""Dense-algebra microbench: eigh/cholesky/tri-inverse at RR sizes, default vs highest
precision, f32 vs f64, plus tunnel round-trip cost (host-RR option)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, *args, n=5, **kwargs):
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:52s} {dt * 1e3:9.3f} ms", flush=True)
    return out, dt


def main():
    key = jax.random.PRNGKey(0)
    for m in (128, 256, 384, 512, 768):
        a = jax.random.normal(key, (m, m), jnp.float32)
        a = a @ a.T + m * jnp.eye(m)

        def eigh_default(a):
            return jnp.linalg.eigh(a)

        def eigh_highest(a):
            with jax.default_matmul_precision("highest"):
                return jnp.linalg.eigh(a)

        timeit(f"f32 eigh({m}) default-precision", jax.jit(eigh_default), a, n=3)
        timeit(f"f32 eigh({m}) highest-precision", jax.jit(eigh_highest), a, n=3)

        a64 = a.astype(jnp.float64)
        timeit(f"f64 cholesky({m})", jax.jit(jnp.linalg.cholesky), a64, n=3)
        ell = jnp.linalg.cholesky(a64)
        timeit(f"f64 tri-inv({m})", jax.jit(
            lambda l: jax.scipy.linalg.solve_triangular(
                l, jnp.eye(l.shape[0], dtype=l.dtype), lower=True)), ell, n=3)
        ell32 = ell.astype(jnp.float32)
        timeit(f"f32 cholesky({m})", jax.jit(jnp.linalg.cholesky),
               a.astype(jnp.float32), n=3)
        timeit(f"f32 tri-inv({m})", jax.jit(
            lambda l: jax.scipy.linalg.solve_triangular(
                l, jnp.eye(l.shape[0], dtype=l.dtype), lower=True)), ell32, n=3)

        # tunnel roundtrip at this size
        def rt():
            h = np.asarray(jax.device_get(a64))
            return jnp.asarray(h).block_until_ready()

        timeit(f"tunnel roundtrip {m}^2 f64 ({m*m*8/1e6:.1f}MB x2)", rt, n=3)

        def host_rr():
            h = np.asarray(jax.device_get(a64))
            w, v = np.linalg.eigh(h)
            return jnp.asarray(v).block_until_ready()

        timeit(f"host eigh({m}) incl roundtrip", host_rr, n=3)
    # pure latency
    s = jnp.zeros((8,), jnp.float32)

    def ping():
        h = np.asarray(jax.device_get(s))
        return jnp.asarray(h).block_until_ready()

    timeit("tunnel ping (tiny)", ping, n=10)


if __name__ == "__main__":
    main()
