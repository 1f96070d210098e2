"""Measure XLA gather/scatter throughput on the live chip with CHAINED iterations
(each call consumes the previous call's output), so neither XLA nor the async
dispatch pipeline can skip or overlap the work being measured. The first unchained
version of this probe reported ~10 TB/s — physically impossible — because identical
queued calls measured dispatch, not execution."""
import time

import jax
import jax.numpy as jnp
import numpy as np

P3 = 768  # 3*p at p=256
N = 44640


def bench_chain(f, x0, *args, n=20):
    x = jax.block_until_ready(f(x0, *args))
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x, *args)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # 1. table-shaped gather chain: y = y[idx] (output == table shape)
    x = jnp.asarray(rng.standard_normal((N, P3)), jnp.float32)
    idx = jnp.asarray(rng.permutation(N).astype(np.int32))  # permutation keeps values healthy
    f = jax.jit(lambda x, i: x[i])
    t = bench_chain(f, x, idx)
    gb = N * P3 * 4 / 1e9
    print(f"chained gather ({N},{P3}) f32: {t*1e3:7.2f} ms {gb/t:6.1f} GB/s(out)",
          flush=True)

    idx_s = jnp.asarray(np.sort(np.asarray(idx)).astype(np.int32))  # = iota; locality best-case
    near = np.clip(np.arange(N) + rng.integers(-64, 64, N), 0, N - 1).astype(np.int32)
    t = bench_chain(f, x, jnp.asarray(near))
    print(f"chained gather near-sorted:    {t*1e3:7.2f} ms {gb/t:6.1f} GB/s(out)",
          flush=True)

    xb = x.astype(jnp.bfloat16)
    t = bench_chain(f, xb, idx)
    print(f"chained gather bf16:           {t*1e3:7.2f} ms {gb/2/t:6.1f} GB/s(out)",
          flush=True)

    # width sweep (constant bytes out)
    for w, ro in ((256, N * 3), (768, N), (1536, N // 2)):
        xw = jnp.asarray(rng.standard_normal((ro, w)), jnp.float32)
        iw = jnp.asarray(rng.permutation(ro).astype(np.int32))
        t = bench_chain(f, xw, iw)
        gbw = ro * w * 4 / 1e9
        print(f"chained gather w={w:5d} rows={ro}: {t*1e3:7.2f} ms {gbw/t:6.1f} GB/s(out)",
              flush=True)

    # 2. expanding gather: (E*10 rows of 768) from 14880-row node table, chained by
    # reducing back: y_next = segsum(gathered) — the REAL apply shape (gather+scatter).
    nn = 14880
    e10 = 97200
    nodes = jnp.asarray(rng.integers(0, nn, size=(e10,)).astype(np.int32))
    nodes_srt = jnp.asarray(np.sort(np.asarray(nodes)).astype(np.int32))
    xn = jnp.asarray(rng.standard_normal((nn, P3)), jnp.float32)

    @jax.jit
    def gs(x, nd):
        g = x[nd]
        return jax.ops.segment_sum(g, nd, num_segments=nn) * 0.15

    t = bench_chain(gs, xn, nodes)
    mv = e10 * P3 * 4 / 1e9
    print(f"chained gather+segsum (97.2k rows, random): {t*1e3:7.2f} ms "
          f"{2*mv/t:6.1f} GB/s(moved)", flush=True)

    @jax.jit
    def gs_sorted(x, nd):
        g = x[nd]
        return jax.ops.segment_sum(g, nd, num_segments=nn,
                                   indices_are_sorted=True) * 0.15

    t = bench_chain(gs_sorted, xn, nodes_srt)
    print(f"chained gather+segsum (sorted ids):        {t*1e3:7.2f} ms "
          f"{2*mv/t:6.1f} GB/s(moved)", flush=True)

    # gather only at the real shape, chained via cheap reduce
    @jax.jit
    def gonly(x, nd):
        g = x[nd]  # (97200, 768)
        return x + 1e-9 * g[:nn]

    t = bench_chain(gonly, xn, nodes)
    print(f"chained gather-only (97.2k rows):          {t*1e3:7.2f} ms "
          f"{mv/t:6.1f} GB/s(out)", flush=True)

    # segsum only (input produced once)
    ge = jnp.asarray(rng.standard_normal((e10, P3)), jnp.float32)

    @jax.jit
    def sonly(x, g, nd):
        return jax.ops.segment_sum(g + x[nd[:1] * 0, :] * 0, nd, num_segments=nn) * 0.1

    # simpler: chain through a scalar scale to keep dependency
    @jax.jit
    def sonly2(x, g, nd):
        s = x[0, 0] * 1e-9 + 1.0
        return jax.ops.segment_sum(g * s, nd, num_segments=nn)

    t = bench_chain(lambda x, g, nd: sonly2(x, g, nd), xn, ge, nodes)
    print(f"chained segsum-only (97.2k rows, random):  {t*1e3:7.2f} ms "
          f"{mv/t:6.1f} GB/s(in)", flush=True)
    t = bench_chain(lambda x, g, nd: sonly2(x, g, nd), xn,
                    jnp.asarray(rng.standard_normal((e10, P3)), jnp.float32), nodes_srt)
    print(f"chained segsum-only (sorted):              {t*1e3:7.2f} ms "
          f"{mv/t:6.1f} GB/s(in)", flush=True)


if __name__ == "__main__":
    main()
