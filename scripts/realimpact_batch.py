"""RealImpact corpus batch solve: every object directory under a root, solved through
the full pipeline with per-object SolveProfile rows, then one OBJECT-SHARDED
verification render over the device mesh.

The reference's corpus bench walks 50 RealImpact + 60 Thingi10k scans and prints
per-case rows (/root/reference/tests/ModalSolverBench.cpp:28-80). Here the per-object
solves run sequentially (each solve is itself device-parallel), and the final check —
strike every object's first impact vertex and render one block — batches ALL objects
into one bank and shards them across a jax Mesh dp axis, the DealObjects analog
(SURVEY.md §2.8).

Usage: python scripts/realimpact_batch.py <corpus_root> [--tet-resolution N]
       [--modes N] [--devices N]
With --devices N on CPU it forces an N-virtual-device mesh (the dryrun discipline).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def batch_solve(root, tet_resolution=10, n_modes=30, progress=print):
    """Solve every RealImpact object dir under `root`. Returns (rows, results)."""
    from mesheditor_tpu.api import solve_surface
    from mesheditor_tpu.io.realimpact import load_realimpact_scan, validate_directory
    from mesheditor_tpu.materials import find_material
    from mesheditor_tpu.types import ModalSolveSettings

    dirs = sorted(d for d in (os.path.join(root, x) for x in os.listdir(root))
                  if os.path.isdir(d) and validate_directory(d))
    rows, results = [], []
    for d in dirs:
        scan = load_realimpact_scan(d)
        mat = find_material(scan.material_name or "Ceramic")
        t0 = time.perf_counter()
        res = solve_surface(
            scan.positions, scan.triangles, mat.properties,
            excite_positions=scan.impact_positions,
            settings=ModalSolveSettings(num_modes=n_modes, num_vertices=10,
                                        max_mode_freq=20_000.0),
            tet_resolution=tet_resolution,
        )
        wall = time.perf_counter() - t0
        p = res.profile
        row = {
            "object": scan.object_name, "material": scan.material_name,
            "dofs": p.dofs, "k_nnz": p.stiffness_nonzeros,
            "modes": res.modes.num_modes,
            "f1_hz": float(res.modes.freqs[0]) if res.modes.num_modes else 0.0,
            "solve_s": round(wall, 2),
            "stage_s": {"mesh": round(p.quad_mesh, 2), "assemble": round(p.assemble, 2),
                        "factorize": round(p.factorize, 2), "iterate": round(p.iterate, 2),
                        "extract": round(p.extract, 2)},
            "eig_iterations": p.restarts,
        }
        rows.append(row)
        results.append(res)
        if progress:
            progress(f"{row['object']}: {row['dofs']} dofs, "
                     f"{row['modes']} modes, f1={row['f1_hz']:.1f} Hz, "
                     f"{row['solve_s']}s {row['stage_s']}")
    return rows, results


def sharded_verification_render(results, n_devices=None, block=512):
    """One block of audio with every solved object struck at its first sample point,
    objects sharded over the mesh dp axis (z/c arrays split across devices, mono mix
    psum-reduced). Returns the (block,) mono mix as float32."""
    import jax
    import jax.numpy as jnp

    from mesheditor_tpu.parallel.sharding import batched_render_step, make_mesh
    from mesheditor_tpu.synth.bank import build_bank

    mesh = make_mesh(n_devices, axis_names=("dp",))
    ndev = mesh.devices.size
    params, _state = build_bank([r.modes for r in results], sample_rate=48_000.0)
    n_obj = params.coeff_re.shape[0]
    pad = (-n_obj) % ndev

    def padded(x):
        x = np.asarray(x)
        width = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
        return jnp.asarray(np.pad(x, width))

    c_re, c_im = padded(params.coeff_re), padded(params.coeff_im)
    gain = padded(params.out_gain)
    # Strike projection: unit impulse through each object's first sample point shapes.
    z_re = jnp.zeros_like(c_re)
    z_im = jnp.zeros_like(c_im)
    excite = jnp.zeros((block,), jnp.float32).at[0].set(1.0)
    step = batched_render_step(mesh, axis="dp")
    z_re, z_im, out = step(z_re, z_im, c_re, c_im, gain, excite)
    return np.asarray(out, np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--tet-resolution", type=int, default=10)
    ap.add_argument("--modes", type=int, default=30)
    ap.add_argument("--devices", type=int, default=None)
    args = ap.parse_args()
    if args.devices:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}").strip()
        os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")

    rows, results = batch_solve(args.root, args.tet_resolution, args.modes)
    if results:
        mix = sharded_verification_render(results, args.devices)
        ok = bool(np.isfinite(mix).all() and np.abs(mix).max() > 0)
        print(f"sharded verification render: {len(results)} objects, "
              f"|mix|max={np.abs(mix).max():.3e}, ok={ok}")
    import json

    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
