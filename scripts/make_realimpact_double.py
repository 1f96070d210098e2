"""Generate a bit-faithful synthetic double of a RealImpact object directory.

The real dataset (128 GB; 2.3 GiB of deconvolved audio per object) cannot ship in this
environment, so this writes an object directory with the exact npy layout the loader
and the reference consume (/root/reference/src/audio/RealImpact.cpp:12-23, npy row
order RealImpact.h:9-23):

  <out>/<id>_<Name>/preprocessed/
    angle.npy distance.npy micID.npy listenerXYZ.npy   (600 listener rows: mic-major,
                                                        then distance, then angle)
    vertexXYZ.npy vertexID.npy                         (3000 rows; impact-vertex value
                                                        repeats every 600 rows)
    deconvolved_0db.npy                                (3000, 209715) float32 @48 kHz
                                                        = 2.34 GiB at full scale
    transformed.obj                                    (Z-up scan mesh)

Ground truth: the "recordings" are damped sinusoids at the modal frequencies of the
SCIPY shift-invert reference solve of the same mesh (the independent LAPACK path), with
per-impact-vertex excitation amplitudes from the eigenvector displacements, per-listener
distance gain, and a -60 dB noise floor. The harness (io/realimpact_harness.py) solving
this mesh through the framework's own pipeline must then find the recorded spectral
peaks at the rendered peaks — a full-scale, end-to-end, non-circular check of loader,
mmap, ordering, axis convention, vertex matching, solve, synthesis, and scoring.

Usage: python scripts/make_realimpact_double.py [outdir] [--frames N] [--full]
  (default writes a CI-sized 2 s clip set; --full writes the 2.34 GiB real-scale file)
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import mesheditor_tpu  # noqa: F401, E402
from mesheditor_tpu.materials import find_material  # noqa: E402
from mesheditor_tpu.mesh import bowl_surface  # noqa: E402
from mesheditor_tpu.mesh.obj_io import save_obj  # noqa: E402

SR = 48_000
FULL_FRAMES = 209_715  # ~4.37 s, the real dataset's clip length
NUM_LISTENERS = 600
NUM_IMPACTS = 5


def scipy_reference_modes(points, tris, material, tet_resolution=20, n_modes=25):
    """Modal frequencies/shapes from the scipy shift-invert path over the framework's
    mesher+assembly — the independent eigensolver the parity gate compares against."""
    import scipy.sparse.linalg as spla

    from mesheditor_tpu.fem.assembly import assemble_element_matrices, filter_degenerate
    from mesheditor_tpu.fem.quad_mesh import build_quad_mesh
    from mesheditor_tpu.mesh.cdt import generate_tets_delaunay
    from mesheditor_tpu.solve.lobpcg import _pencil_csr

    h = float(np.ptp(np.asarray(points), axis=0).max()) / tet_resolution
    tm = generate_tets_delaunay(points, tris, lattice_h=h)
    kept = filter_degenerate(tm.points, tm.tets)
    quad = build_quad_mesh(kept, tm.points.shape[0])
    ops = assemble_element_matrices(tm.points, kept, material, quad)
    k, m = _pencil_csr(ops)
    sigma = -((2 * np.pi * 20.0) ** 2)
    vals, vecs = spla.eigsh(k, k=n_modes + 6, M=m, sigma=sigma, which="LM")
    order = np.argsort(vals)
    vals, vecs = vals[order], vecs[:, order]
    live = vals > (2 * np.pi * 20.0) ** 2  # drop rigid-body modes
    vals, vecs = vals[live][:n_modes], vecs[:, live][:, :n_modes]
    freqs = np.sqrt(vals) / (2 * np.pi)
    return tm, freqs, vals, vecs, quad


def synth_recordings(freqs, vals, vecs, tm, impact_positions, material, frames):
    """(5, frames) base clips: per-vertex modal excitation, Rayleigh-damped sinusoids."""
    t = np.arange(frames) / SR
    alpha, beta = material.alpha, material.beta
    omega = 2 * np.pi * freqs
    c = alpha + beta * vals  # Rayleigh damping (reference: mesh2modes.cpp:515-588)
    clips = np.zeros((NUM_IMPACTS, frames), np.float32)
    pts = np.asarray(tm.points)
    for v in range(NUM_IMPACTS):
        # Physical impulse-response weighting: modal velocity response to an impulse
        # at the struck vertex is ~ phi_k(v)^2 / omega_k (mass-normalized modes) —
        # the same law the resonator bank's gain bake embodies, so a real recording's
        # partial balance looks like this, not like raw |phi|.
        vid = int(np.argmin(((pts - impact_positions[v]) ** 2).sum(1)))
        phi = np.linalg.norm(vecs[3 * vid : 3 * vid + 3, :], axis=0)
        amp = phi * phi / np.maximum(omega, 1.0)
        amp = amp / max(amp.max(), 1e-30)
        sig = np.zeros(frames)
        for k in range(freqs.size):
            sig += amp[k] * np.sin(omega[k] * t) * np.exp(-0.5 * c[k] * t)
        clips[v] = (sig / max(np.abs(sig).max(), 1e-30)).astype(np.float32)
    return clips


def make_double(outdir, name="53_CeramicKoiBowl", frames=2 * SR, detune=0.0,
                tet_resolution=10, n_modes=25, bowl_kw=None, seed=11):
    """Write one synthetic object directory; returns its path."""
    d = Path(outdir) / name / "preprocessed"
    d.mkdir(parents=True, exist_ok=True)

    # Scan-like mesh: hemispherical bowl shell, 5% wall, vertex-jittered. Z-up —
    # bowl_surface's axis is already z. OBJ units: meters (the loader does not scale
    # mesh/impacts, only listener mm -> m).
    bowl_kw = bowl_kw or dict(radius=0.06, thickness=0.003, n_lat=8, n_lon=20,
                              noise=0.08)
    pts, tris = bowl_surface(seed=seed, **bowl_kw)
    save_obj(d / "transformed.obj", pts, tris)

    material = find_material("Ceramic").properties
    print("solving scipy reference modes...", flush=True)
    tm, freqs, vals, vecs, _ = scipy_reference_modes(
        pts, tris, material, tet_resolution=tet_resolution, n_modes=n_modes)
    print(f"  {freqs.size} modes, f1={freqs[0]:.1f} Hz, fmax={freqs[-1]:.1f} Hz")
    if detune:
        freqs = freqs * (1.0 + detune)
        vals = (2 * np.pi * freqs) ** 2

    # Listener geometry: mic-major, then distance, then angle (RealImpact.h:9-23).
    mics = np.repeat(np.arange(15), 40)
    distances = np.tile(np.repeat(np.array([250, 500, 750, 1000]), 10), 15)
    angles = np.tile(np.arange(10) * 36, 60)
    heights = 40.0 * np.arange(15) + 100.0  # mic stack, mm
    az = np.deg2rad(angles)
    listener = np.stack([distances * np.cos(az), distances * np.sin(az),
                         heights[mics]], 1).astype(np.float64)  # Z-up, mm
    np.save(d / "angle.npy", angles.astype(np.int64))
    np.save(d / "distance.npy", distances.astype(np.int64))
    np.save(d / "micID.npy", mics.astype(np.int64))
    np.save(d / "listenerXYZ.npy", listener)

    # Impact vertices: 5 outer-surface points spread in latitude and azimuth — the
    # real rig's solenoid strikes reachable outer-skin spots (RealImpact.h:25-38);
    # vertexXYZ rows repeat every 600. Outer hemisphere rings come first in
    # bowl_surface's vertex order (rings of n_lon from rim toward pole).
    n_lat, n_lon = bowl_kw.get("n_lat", 8), bowl_kw.get("n_lon", 20)
    # Stop short of the bottom pole: the rig cannot strike the face the object rests
    # on, and pole-adjacent points carry near-zero fundamental shape.
    rings = np.linspace(0, n_lat - 3, NUM_IMPACTS).astype(np.int64)
    ids = np.asarray([r * n_lon + (r * 7) % n_lon for r in rings], np.int64)
    impact_xyz = pts[ids]  # Z-up, obj units
    np.save(d / "vertexXYZ.npy", np.repeat(impact_xyz, NUM_LISTENERS, axis=0))
    np.save(d / "vertexID.npy", np.repeat(ids, NUM_LISTENERS))

    print("synthesizing base clips...", flush=True)
    clips = synth_recordings(freqs, vals, vecs, tm, impact_xyz, material, frames)

    # Full matrix, written block-wise through a memmap: row = listener + 600*impact.
    path = d / "deconvolved_0db.npy"
    out = np.lib.format.open_memmap(path, mode="w+", dtype=np.float32,
                                    shape=(NUM_LISTENERS * NUM_IMPACTS, frames))
    rng = np.random.default_rng(2026)
    gain = (250.0 / distances).astype(np.float32)  # inverse-distance level
    for i in range(NUM_IMPACTS):
        block = gain[:, None] * clips[i][None, :]
        block = block + 1e-3 * rng.standard_normal(block.shape).astype(np.float32)
        out[NUM_LISTENERS * i : NUM_LISTENERS * (i + 1)] = block
        print(f"  impact {i}: rows {NUM_LISTENERS * i}..{NUM_LISTENERS * (i + 1) - 1}",
              flush=True)
    out.flush()
    size = os.path.getsize(path)
    print(f"wrote {path} ({size / 2**30:.2f} GiB)")
    print(f"object dir: {d.parent}")
    return d.parent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", nargs="?", default="/tmp/realimpact_double")
    ap.add_argument("--frames", type=int, default=2 * SR)
    ap.add_argument("--full", action="store_true",
                    help=f"real-scale clips ({FULL_FRAMES} frames, 2.34 GiB)")
    ap.add_argument("--detune", type=float, default=0.0,
                    help="fractional frequency detune of the recordings (control runs)")
    ap.add_argument("--tet-resolution", type=int, default=10)
    args = ap.parse_args()
    name = "53_CeramicKoiBowl" if not args.detune else "54_CeramicKoiBowlDetuned"
    make_double(args.outdir, name=name,
                frames=FULL_FRAMES if args.full else args.frames,
                detune=args.detune, tet_resolution=args.tet_resolution)


if __name__ == "__main__":
    main()
