"""Measure tpu.dynamic_gather (take_along_axis form) throughput inside a Pallas kernel,
plus pltpu.roll, to size the fused K-apply kernel design."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(f, *args, n=50):
    r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


R, P = 8192, 128
x = jnp.asarray(np.random.randn(R, P), jnp.float32)
idx_np = np.random.randint(0, R, size=(R,)).astype(np.int32)
idx = jnp.asarray(idx_np)


def g_kernel(x_ref, idx_ref, o_ref):
    idx2 = jnp.broadcast_to(idx_ref[:][:, None], (R, P))
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx2, axis=0)


gather = jax.jit(pl.pallas_call(
    g_kernel,
    out_shape=jax.ShapeDtypeStruct((R, P), jnp.float32),
))
got = np.asarray(gather(x, idx))
print("gather correct:", np.array_equal(got, np.asarray(x)[idx_np]))
t = bench(gather, x, idx)
print(f"dynamic_gather (8192,128) f32: {t*1e6:.1f} us  ({R*P*4*2/t/1e9:.0f} GB/s eff)")


# repeated gather: 8x inside one kernel to amortize call overhead
def g8_kernel(x_ref, idx_ref, o_ref):
    acc = jnp.zeros((R, P), jnp.float32)
    for i in range(8):
        idx2 = jnp.broadcast_to((idx_ref[:] + i) % R, (P, R)).T
        acc = acc + jnp.take_along_axis(x_ref[:], idx2, axis=0)
    o_ref[:] = acc


gather8 = jax.jit(pl.pallas_call(
    g8_kernel,
    out_shape=jax.ShapeDtypeStruct((R, P), jnp.float32),
))
t = bench(gather8, x, idx)
print(f"8x dynamic_gather in one kernel: {t*1e6:.1f} us -> {t/8*1e6:.1f} us each")


# roll (for prefix-sum scatter idea)
def roll_kernel(x_ref, o_ref):
    acc = x_ref[:]
    for s in (1, 2, 4, 8, 16, 32, 64, 128):
        acc = acc + pltpu.roll(acc, s, 0)
    o_ref[:] = acc


rollk = jax.jit(pl.pallas_call(
    roll_kernel,
    out_shape=jax.ShapeDtypeStruct((R, P), jnp.float32),
))
t = bench(rollk, x)
print(f"8x roll+add (8192,128): {t*1e6:.1f} us -> {t/8*1e6:.1f} us each")


# matmul reference at apply-like shapes: (C,30,30) @ (C,30,96)
C = 1024
blocks = jnp.asarray(np.random.randn(C, 30, 30), jnp.float32)
xe = jnp.asarray(np.random.randn(C, 30, 96), jnp.float32)


def mm_kernel(b_ref, x_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        b_ref[:], x_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


mmk = jax.jit(pl.pallas_call(
    mm_kernel,
    out_shape=jax.ShapeDtypeStruct((C, 30, 96), jnp.float32),
))
t = bench(mmk, blocks, xe)
print(f"batched (1024,30,30)@(1024,30,96) in-kernel: {t*1e6:.1f} us ({2*C*30*30*96/t/1e12:.2f} TFLOP/s)")
