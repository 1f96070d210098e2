"""RealImpact comparison harness: recorded impacts vs the modal model (BASELINE config 3).

For each object directory under REALIMPACT_DATASET_DIR (or the --dataset path):
  1. load the scan (mesh, impact vertices, material),
  2. simplify -> tetrahedralize (native Delaunay mesher, voxel fallback) -> modal solve,
  3. retune the solve so its fundamental matches the recording's dominant partial
     (the reference's FundamentalFreq workflow, AudioSystem.cpp:827-866),
  4. render a strike at each recorded impact vertex and report the spectral match:
     fraction of the recording's top partials that land within `--cents` of a synthesized
     partial, plus T60-scale agreement.

Writes a wav pair (recorded vs modal) per impact when --out is given. Skips silently when
the dataset is absent (the reference's dataset-gated test discipline).
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu.api import make_synth, solve_surface, strike
from mesheditor_tpu.io import write_wav
from mesheditor_tpu.io.realimpact import (
    SAMPLE_RATE,
    load_realimpact_scan,
    load_samples,
    validate_directory,
)
from mesheditor_tpu.materials import find_material
from mesheditor_tpu.solve.orchestration import estimate_fundamental
from mesheditor_tpu.types import ModalSolveSettings, SolverConfig


def top_partials(signal, sr, k=8, fmin=60.0, fmax=12000.0):
    spec = np.abs(np.fft.rfft(signal * np.hanning(len(signal))))
    freqs = np.fft.rfftfreq(len(signal), 1 / sr)
    band = (freqs >= fmin) & (freqs <= fmax)
    spec = np.where(band, spec, 0)
    # Peak picking: local maxima, strongest first.
    peaks = np.flatnonzero((spec[1:-1] > spec[:-2]) & (spec[1:-1] > spec[2:])) + 1
    peaks = peaks[np.argsort(spec[peaks])[::-1]][: k * 3]
    out = []
    for p in peaks:
        if all(abs(freqs[p] - f) > 20 for f in out):
            out.append(float(freqs[p]))
        if len(out) >= k:
            break
    return out


def run_object(obj_dir, listener, cents, out_dir, tet_resolution):
    scan = load_realimpact_scan(obj_dir)
    mat = find_material(scan.material_name or "Ceramic")
    print(f"== {scan.object_name} ({mat.name}) "
          f"{scan.positions.shape[0]} verts {scan.triangles.shape[0]} tris", flush=True)
    settings = ModalSolveSettings(num_modes=60, solve_resolution=0.5, max_mode_freq=16000.0)
    result = solve_surface(
        scan.positions, scan.triangles, mat.properties,
        excite_positions=scan.impact_positions, settings=settings,
        tet_resolution=tet_resolution,
    )
    if result.modes.num_modes == 0:
        print("   solve failed", flush=True)
        return None
    samples = load_samples(obj_dir, listener)
    scores = []
    for imp in range(samples.shape[0]):
        rec = samples[imp]
        f0 = estimate_fundamental(rec, SAMPLE_RATE, min_freq=60.0)
        # Retune the model to the recording's fundamental (material/mesh approximations
        # shift the absolute pitch; the reference offers the same workflow).
        from mesheditor_tpu.solve.postprocess import postprocess_modes

        cfg = SolverConfig(num_modes=60, max_mode_freq=16000.0,
                           fundamental_freq=f0 if f0 > 0 else None)
        modes = postprocess_modes(
            result.summary.eigenvalues, result.summary.shapes, 1.0,
            mat.properties, cfg, result.modes.positions,
        )
        synth = make_synth([modes])
        expos = int(result.sample_point_of_excitation[imp]) if result.sample_point_of_excitation.size > imp else 0
        strike(synth, 0, expos, result, direction=(0, 1, 0), impulse_mag=0.05,
               material=mat.properties)
        model_audio = synth.render_seconds(min(len(rec) / SAMPLE_RATE, 2.0))
        rec_partials = top_partials(rec[: len(model_audio)], SAMPLE_RATE)
        model_partials = top_partials(model_audio, SAMPLE_RATE)
        hits = 0
        for rp in rec_partials:
            if any(abs(1200 * np.log2(mp / rp)) < cents for mp in model_partials if mp > 0):
                hits += 1
        score = hits / max(len(rec_partials), 1)
        scores.append(score)
        print(f"   impact {imp}: f0={f0:7.1f} Hz match {hits}/{len(rec_partials)} partials "
              f"(within {cents} cents)", flush=True)
        if out_dir:
            out_dir = Path(out_dir)
            out_dir.mkdir(parents=True, exist_ok=True)
            peak = max(np.abs(model_audio).max(), 1e-9)
            write_wav(out_dir / f"{scan.object_name}_{imp}_modal.wav", model_audio / peak)
            write_wav(out_dir / f"{scan.object_name}_{imp}_recorded.wav",
                      rec[: len(model_audio)] / max(np.abs(rec).max(), 1e-9))
    return float(np.mean(scores)) if scores else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default=os.environ.get("REALIMPACT_DATASET_DIR", ""))
    ap.add_argument("--listener", type=int, default=263)  # front-center
    ap.add_argument("--cents", type=float, default=60.0)
    ap.add_argument("--out", default="")
    ap.add_argument("--tet-resolution", type=int, default=28)
    ap.add_argument("--objects", nargs="*", default=[])
    args = ap.parse_args()
    root = Path(args.dataset)
    if not args.dataset or not root.exists():
        print("RealImpact dataset not found; skipping (set REALIMPACT_DATASET_DIR)")
        return
    dirs = [d for d in sorted(root.iterdir()) if d.is_dir() and validate_directory(d)]
    if args.objects:
        dirs = [d for d in dirs if any(o in d.name for o in args.objects)]
    results = {}
    for d in dirs:
        try:
            score = run_object(d, args.listener, args.cents, args.out, args.tet_resolution)
            if score is not None:
                results[d.name] = score
        except Exception as e:  # noqa: BLE001 — corpus harness reports and continues
            print(f"   {d.name}: FAILED {e}", flush=True)
    if results:
        print("\nmean partial-match score:", round(float(np.mean(list(results.values()))), 3))


if __name__ == "__main__":
    main()
