"""Probe the primitives for the fused Pallas K/M apply at bench-realistic shapes.

Mosaic's gather lowering (jax/_src/pallas/mosaic/lowering.py:_gather_lowering_rule)
supports ONLY table-shaped take-along-axis: tpu.dynamic_gather with
input.shape == indices.shape == output.shape, axis 0 or 1. So every in-kernel row
gather processes table-row-count rows per call; designs must batch work so output
rows ~= table rows. This probe measures, on the live chip:
  1. VMEM capacity ladder
  2. tpu.dynamic_gather throughput at (44640, 128) f32
  3. in-kernel batched (C,30,30)@(C,30,128) matmul throughput (f32 + bf16)
  4. pltpu.roll and masked add throughput (for sorted-segment reduction)
  5. a dynamic-slice window accumulate
Run on the TPU: python scripts/probe_fused_apply.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 44640         # table rows (bench n_dofs 44289 padded)
PT = 128          # panel-tile lanes
C = 1488          # elements per chunk: C*30 = 44640 = R


def bench(f, *args, n=30):
    r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # ---- 1. VMEM capacity ----
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
            return str(e).splitlines()[0][:100]

    for mb in (4, 8, 12, 16, 20, 24, 28, 32, 40, 48, 56, 62):
        r = vmem_probe(mb)
        print(f"vmem in+scratch 2x{mb}MB: {r}", flush=True)
        if r is not True:
            break

    # ---- 2. table-shaped dynamic_gather ----
    x = jnp.asarray(rng.standard_normal((R, PT)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, R, size=(R,)), np.int32)

    def g_kernel(idx_ref, x_ref, o_ref):
        idx2 = jnp.broadcast_to(idx_ref[:][:, None], (R, PT))
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx2, axis=0)

    gather = jax.jit(pl.pallas_call(
        g_kernel,
        out_shape=jax.ShapeDtypeStruct((R, PT), jnp.float32),
    ))
    got = np.asarray(gather(idx, x))
    ok = np.array_equal(got, np.asarray(x)[np.asarray(idx)])
    t = bench(gather, idx, x)
    print(f"dynamic_gather ({R},{PT}) f32: {t*1e6:.0f} us ok={ok} "
          f"({R*PT*4*2/t/1e9:.0f} GB/s rd+wr, {R/t/1e6:.0f} M rows/s)", flush=True)

    # 4 gathers in one kernel (amortize call overhead)
    def g4_kernel(idx_ref, x_ref, o_ref):
        acc = jnp.zeros((R, PT), jnp.float32)
        for i in range(4):
            idx2 = jnp.broadcast_to(
                ((idx_ref[:] + i) % R)[:, None], (R, PT))
            acc = acc + jnp.take_along_axis(x_ref[:], idx2, axis=0)
        o_ref[:] = acc

    g4 = jax.jit(pl.pallas_call(
        g4_kernel,
        out_shape=jax.ShapeDtypeStruct((R, PT), jnp.float32),
    ))
    t = bench(g4, idx, x)
    print(f"4x dynamic_gather in one kernel: {t*1e6:.0f} us -> {t/4*1e6:.0f} us each",
          flush=True)

    # bf16 gather
    xb = x.astype(jnp.bfloat16)

    def gb_kernel(idx_ref, x_ref, o_ref):
        idx2 = jnp.broadcast_to(idx_ref[:][:, None], (R, PT))
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx2, axis=0)

    gb = jax.jit(pl.pallas_call(
        gb_kernel,
        out_shape=jax.ShapeDtypeStruct((R, PT), jnp.bfloat16),
    ))
    try:
        t = bench(gb, idx, xb)
        print(f"dynamic_gather bf16: {t*1e6:.0f} us", flush=True)
    except Exception as e:
        print(f"dynamic_gather bf16: FAIL {str(e).splitlines()[0][:100]}", flush=True)

    # ---- 3. in-kernel batched matmul ----
    CB = 1024
    blocks = jnp.asarray(rng.standard_normal((CB, 30, 30)), jnp.float32)
    xe = jnp.asarray(rng.standard_normal((CB, 30, PT)), jnp.float32)

    def mm_kernel(b_ref, x_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            b_ref[:], x_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    mm = jax.jit(pl.pallas_call(
        mm_kernel,
        out_shape=jax.ShapeDtypeStruct((CB, 30, PT), jnp.float32),
    ))
    t = bench(mm, blocks, xe)
    fl = 2 * CB * 30 * 30 * PT
    print(f"in-kernel mm ({CB},30,30)@(30,{PT}) f32: {t*1e6:.0f} us "
          f"({fl/t/1e12:.2f} TFLOP/s)", flush=True)

    bb = blocks.astype(jnp.bfloat16)
    xbm = xe.astype(jnp.bfloat16)
    mmb = jax.jit(pl.pallas_call(
        mm_kernel,
        out_shape=jax.ShapeDtypeStruct((CB, 30, PT), jnp.float32),
    ))
    t = bench(mmb, bb, xbm)
    print(f"in-kernel mm bf16 in / f32 out: {t*1e6:.0f} us ({fl/t/1e12:.2f} TFLOP/s)",
          flush=True)

    # padded to 32 (tile-aligned sublanes)
    b32p = jnp.asarray(rng.standard_normal((CB, 32, 32)), jnp.float32)
    xe32 = jnp.asarray(rng.standard_normal((CB, 32, PT)), jnp.float32)
    mmp = jax.jit(pl.pallas_call(
        mm_kernel,
        out_shape=jax.ShapeDtypeStruct((CB, 32, PT), jnp.float32),
    ))
    t = bench(mmp, b32p, xe32)
    flp = 2 * CB * 32 * 32 * PT
    print(f"in-kernel mm ({CB},32,32)@(32,{PT}) f32: {t*1e6:.0f} us "
          f"({flp/t/1e12:.2f} TFLOP/s)", flush=True)

    # wide-stationary form: (CB,60,32)@(32,PT) for fused K+M
    b60 = jnp.asarray(rng.standard_normal((CB, 64, 32)), jnp.float32)
    mm60 = jax.jit(pl.pallas_call(
        mm_kernel,
        out_shape=jax.ShapeDtypeStruct((CB, 64, PT), jnp.float32),
    ))
    t = bench(mm60, b60, xe32)
    fl60 = 2 * CB * 64 * 32 * PT
    print(f"in-kernel mm ({CB},64,32)@(32,{PT}) f32: {t*1e6:.0f} us "
          f"({fl60/t/1e12:.2f} TFLOP/s)", flush=True)

    # ---- 4. roll + masked add (sorted-segment reduction ladder) ----
    y = jnp.asarray(rng.standard_normal((R, PT)), jnp.float32)
    masks = jnp.asarray(rng.random((6, R, 1)) < 0.5, jnp.float32)

    def roll_kernel(y_ref, m_ref, o_ref):
        acc = y_ref[:]
        for s in range(5):
            acc = acc + pltpu.roll(acc, 1 << s, 0) * m_ref[s]
        o_ref[:] = acc

    rollf = jax.jit(pl.pallas_call(
        roll_kernel,
        out_shape=jax.ShapeDtypeStruct((R, PT), jnp.float32),
    ))
    t = bench(rollf, y, masks)
    print(f"5x roll+mask+add ({R},{PT}): {t*1e6:.0f} us -> {t/5*1e6:.0f} us each",
          flush=True)

    # ---- 5. dynamic-slice window accumulate ----
    W = 2048

    def win_kernel(w_ref, y_ref, o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)
        for c in range(4):
            o_ref[pl.ds(w_ref[c], W), :] += y_ref[pl.ds(c * W, W), :]

    wstarts = jnp.asarray([0, 1024, 4096, 9000], np.int32)
    yw = jnp.asarray(rng.standard_normal((4 * W, PT)), jnp.float32)
    try:
        winf = jax.jit(pl.pallas_call(
            win_kernel,
            out_shape=jax.ShapeDtypeStruct((R, PT), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))
        jax.block_until_ready(winf(wstarts, yw))
        t = bench(winf, wstarts, yw)
        print(f"4x windowed dense add ({W} rows): {t*1e6:.0f} us", flush=True)
    except Exception as e:
        print(f"windowed add: FAIL {str(e).splitlines()[0][:100]}", flush=True)


if __name__ == "__main__":
    main()
