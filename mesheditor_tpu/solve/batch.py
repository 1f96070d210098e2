"""Corpus-scale batch solving: many objects -> modal dataset (BASELINE config 5).

TPU-first shape discipline: jitted stages recompile per (n_elements, n_dofs, panel)
shape, so meshes are padded up to BUCKET boundaries — every object in a bucket reuses the
same compiled solver. Padding elements are zero-volume blocks scattering into dof 0 with
zero coefficients (exactly inert, matching the degenerate-filter semantics), and padding
dofs get unit diagonal mass/stiffness far above the audible band so they never enter the
wanted window.

Results stream into the content-addressed model store (write-once, so an interrupted
corpus run resumes for free — the reference's .modal-file discipline).

Multi-chip: shard the corpus over processes/devices (dp) — each chip runs its slice with
this same bucketed solver; `parallel/sharding.py` covers the tp sharding of one large
solve instead.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from ..io.model_store import save_modal_model
from ..types import AcousticMaterialProperties, SolverConfig, TetMesh
from .mesh2modes import ModalResult, mesh2modes
from .orchestration import ModalWarmStart, hash_solve_inputs


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_tetmesh(mesh: TetMesh, n_points: int, n_tets: int) -> TetMesh:
    """Pad a tet mesh to bucket sizes with degenerate (zero-volume) tets on a far-away
    dummy point — FilterDegenerate drops them before assembly, so padded solves produce
    identical modes to unpadded ones while sharing compiled shapes."""
    pts = np.asarray(mesh.points, np.float64)
    tets = np.asarray(mesh.tets, np.uint32)
    if pts.shape[0] > n_points or tets.shape[0] > n_tets:
        raise ValueError("mesh exceeds bucket")
    extent = float(np.abs(pts).max()) + 1.0
    pad_pts = np.full((n_points - pts.shape[0], 3), extent * 10.0)
    dummy = pts.shape[0]  # first padding point
    pad_tets = np.full((n_tets - tets.shape[0], 4), dummy, np.uint32)
    return TetMesh(points=np.concatenate([pts, pad_pts]), tets=np.concatenate([tets, pad_tets]))


@dataclass
class CorpusItem:
    name: str
    mesh: TetMesh
    material: AcousticMaterialProperties
    excite_positions: np.ndarray
    baked_scale: tuple = (1.0, 1.0, 1.0)


@dataclass
class CorpusResult:
    name: str
    path: Optional[Path]
    num_modes: int
    f1_hz: float
    solve_seconds: float
    iterations: int


def batch_solve(
    items: Sequence[CorpusItem],
    out_dir,
    config: SolverConfig = SolverConfig(),
    point_bucket: int = 2048,
    tet_bucket: int = 4096,
    progress=None,
) -> list[CorpusResult]:
    """Solve a corpus into the content-addressed store. Buckets pad (points, tets) so the
    compiled eigensolver stages are shared across every object in a bucket; items are
    processed largest-first per bucket so each bucket compiles once."""
    out_dir = Path(out_dir)
    buckets: dict[tuple[int, int], list[CorpusItem]] = {}
    for item in items:
        key = (
            _round_up(item.mesh.points.shape[0], point_bucket),
            _round_up(item.mesh.tets.shape[0], tet_bucket),
        )
        buckets.setdefault(key, []).append(item)

    results: list[CorpusResult] = []
    warm = ModalWarmStart()
    for (np_bucket, nt_bucket), group in sorted(buckets.items()):
        for item in group:
            import time

            padded = pad_tetmesh(item.mesh, np_bucket, nt_bucket)
            t0 = time.perf_counter()
            res: ModalResult = mesh2modes(
                padded, item.material, item.excite_positions, item.baked_scale, config
            )
            dt = time.perf_counter() - t0
            path = None
            if res.modes.num_modes:
                path = save_modal_model(out_dir, res.modes, res.mass_props)
            results.append(
                CorpusResult(
                    name=item.name,
                    path=path,
                    num_modes=res.modes.num_modes,
                    f1_hz=float(res.modes.freqs[0]) if res.modes.num_modes else 0.0,
                    solve_seconds=dt,
                    iterations=res.profile.restarts,
                )
            )
            if progress:
                progress(results[-1])
    return results
