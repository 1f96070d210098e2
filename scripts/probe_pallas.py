"""Probe Mosaic/Pallas capabilities on this chip: VMEM size, dynamic gather support,
scatter options, and timings for candidate K-apply kernel primitives.

Throwaway diagnostic; results feed the fused-apply kernel design (VERDICT r3 #1a).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices())


def timeit(fn, *args, n=20):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


# ---- 1. VMEM capacity probe ----
def vmem_probe(mb):
    n = mb * 1024 * 1024 // 4 // 128

    def kernel(x_ref, o_ref, scratch):
        scratch[:] = x_ref[:] * 2.0
        o_ref[0, 0] = scratch[0, 0]

    x = jnp.ones((n, 128), jnp.float32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.VMEM((n, 128), jnp.float32)],
        )(x)
        jax.block_until_ready(out)
        return True
    except Exception as e:
        return str(e).splitlines()[0][:120]


for mb in (8, 16, 24, 32, 48, 56, 60):
    r = vmem_probe(mb)
    print(f"vmem 2x{mb}MB:", r)
    if r is not True:
        break

# ---- 2. dynamic gather inside kernel ----
N, P = 16384, 128
C = 4096
x = jnp.asarray(np.random.randn(N, P), jnp.float32)
idx = jnp.asarray(np.random.randint(0, N, size=(C,)), jnp.int32)


def try_kernel(name, kernel, out_shape, *args, interpret=False):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            interpret=interpret,
        )
        r = jax.jit(f)(*args)
        jax.block_until_ready(r)
        print(f"{name}: OK")
        return f
    except Exception as e:
        print(f"{name}: FAIL -> {str(e).splitlines()[0][:160]}")
        return None


def g_take(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)


f = try_kernel("jnp.take axis=0", g_take, jax.ShapeDtypeStruct((C, P), jnp.float32), x, idx)
if f is not None:
    ref = np.asarray(x)[np.asarray(idx)]
    got = np.asarray(jax.jit(f)(x, idx))
    print("  correct:", np.array_equal(got, ref), " time:", timeit(jax.jit(f), x, idx) * 1e6, "us")


def g_fancy(x_ref, idx_ref, o_ref):
    o_ref[:] = x_ref[idx_ref[:], :]


try_kernel("ref[idx, :]", g_fancy, jax.ShapeDtypeStruct((C, P), jnp.float32), x, idx)


def g_takealong(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:][:, None].astype(jnp.int32) * jnp.ones((1, P), jnp.int32), axis=0)


try_kernel("take_along_axis bcast", g_takealong, jax.ShapeDtypeStruct((C, P), jnp.float32), x, idx)

# ---- 3. scatter-add inside kernel ----
vals = jnp.asarray(np.random.randn(C, P), jnp.float32)


def s_segsum(vals_ref, idx_ref, o_ref):
    o_ref[:] = jax.ops.segment_sum(vals_ref[:], idx_ref[:], num_segments=N)


try_kernel("segment_sum", s_segsum, jax.ShapeDtypeStruct((N, P), jnp.float32), vals, idx)


def s_scatteradd(vals_ref, idx_ref, o_ref):
    o_ref[:] = jnp.zeros_like(o_ref)
    o_ref[idx_ref[:], :] += vals_ref[:]


try_kernel("o_ref[idx] +=", s_scatteradd, jax.ShapeDtypeStruct((N, P), jnp.float32), vals, idx)
