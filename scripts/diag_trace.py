"""Capture a jax.profiler trace of the ortho-engine iteration and print the top device
ops by self time (parses the xplane with tensorboard_plugin_profile, no tensorboard)."""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mesheditor_tpu import SolverConfig
from mesheditor_tpu.fem.assembly import (
    assemble_element_matrices, bake_shifted_f32, filter_degenerate, pencil_diagonals,
)
from mesheditor_tpu.fem.quad_mesh import build_quad_mesh
from mesheditor_tpu.materials import CERAMIC
from mesheditor_tpu.mesh import box_tets
from mesheditor_tpu.solve.amg import build_amg
from mesheditor_tpu.solve import eigs


def main():
    mesh = box_tets((0.3, 0.16, 0.15), (18, 10, 9))
    cfg = SolverConfig(num_modes=256, num_fem_modes=256, max_mode_freq=48_000.0,
                       tolerance=1e-6)
    kept = filter_degenerate(mesh.points, mesh.tets)
    quad = build_quad_mesh(kept, mesh.points.shape[0])
    ops = assemble_element_matrices(mesh.points, kept, CERAMIC.properties, quad)
    n = ops.n_dofs
    sigma = -((2 * np.pi * cfg.min_mode_freq) ** 2)
    k_diag, m_diag = pencil_diagonals(ops)
    precond = build_amg(mesh.points, kept, quad, ops, k_diag, m_diag, sigma)
    shifted = bake_shifted_f32(ops, sigma)
    p_e = cfg.num_fem_modes + 15 - precond.rigid.shape[1]

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, p_e), dtype=jnp.float32)
    x = eigs.smooth_panel(shifted, precond, x)
    s, ks, ms, a0, b0, theta, c = eigs._init_stage(ops, x)
    jax.block_until_ready(s)
    sig_d = jnp.asarray(abs(sigma), jnp.float64)

    def step(s, ks, ms, a0, b0, c):
        return eigs._iter_stage(ops, shifted, precond, s, ks, ms, a0, b0, c,
                                precond.rigid, precond.m_rigid, 16, sig_d,
                                refresh=False)

    out = step(s, ks, ms, a0, b0, c)
    jax.block_until_ready(out)
    tdir = "/tmp/jax_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(3):
            out = step(s, ks, ms, a0, b0, c)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = step(s, ks, ms, a0, b0, c)
    jax.block_until_ready(out)
    print(f"iter wall: {(time.perf_counter() - t0)/3*1e3:.1f} ms", flush=True)

    xplane = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    print("xplane:", xplane, flush=True)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplane, "framework_op_stats^", {})
    import csv
    import io

    rows = list(csv.reader(io.StringIO(data.decode() if isinstance(data, bytes) else data)))
    hdr = rows[0]
    print(hdr, flush=True)
    icat = hdr.index("category") if "category" in hdr else None
    iname = hdr.index("operation") if "operation" in hdr else 1
    itime = None
    for cand in ("total_self_time", "self_time_us", "total_self_time_us",
                 "avg_self_time_us"):
        if cand in hdr:
            itime = hdr.index(cand)
            break
    body = rows[1:]
    try:
        body.sort(key=lambda r: -float(r[itime]))
    except Exception:
        pass
    for r in body[:40]:
        print(r, flush=True)


if __name__ == "__main__":
    main()
