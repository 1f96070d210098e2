"""High-level API: the reference's solve-input pipeline and strike-render surface.

mesh in (obj/primitive/RealImpact + material) -> modal model -> rendered waveform:

    tets   = generate_tets(positions, tris)                       # or a structured mesh
    result = mesh2modes(tets, material.properties, excite_positions)
    synth  = make_synth([result])
    synth.strike(0, 0, impulse, contact_time)
    wav    = synth.render_seconds(1.0)

Mirrors the reference's LaunchModalSolve pipeline (simplify -> tets -> solve -> postprocess,
src/audio/AudioSystem.cpp:1066-1152) and the strike dispatch (TriggerModalStrike,
:709-768), minus the interactive scene layer (see scene/).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from .materials import ACOUSTIC_MATERIALS, find_material
from .mesh.simplify import simplify_surface
from .mesh.voxel_tets import generate_tets
from .solve.mesh2modes import ModalResult, SolveReuse, mesh2modes
from .synth.contact import (
    ContactDynamics,
    Striker,
    estimate_contact_time,
    inverse_inertia_tensor,
    striker_impactor,
)
from .synth.engine import ModalSynth
from .types import (
    AcousticMaterialProperties,
    MassProperties,
    ModalModes,
    ModalSolveSettings,
    SolverConfig,
    TetMesh,
)


def solve_surface(
    positions: np.ndarray,
    tris: np.ndarray,
    material: AcousticMaterialProperties,
    excite_positions: Optional[np.ndarray] = None,
    settings: ModalSolveSettings = ModalSolveSettings(),
    baked_scale=(1.0, 1.0, 1.0),
    tet_resolution: int = 24,
    reuse: SolveReuse = SolveReuse(),
    cancelled=None,
    progress=None,
    verbose=None,
) -> ModalResult:
    """The full solve-input pipeline: simplify -> tetrahedralize -> FEM modal solve.

    Tetrahedralization prefers the native conforming-Delaunay mesher (surface vertices
    and skin preserved exactly; `settings.quality_tets` enables circumradius/edge <= 2
    refinement, the reference's optional -q mode, Tetrahedralize.h:18-21) and falls
    back to the voxel mesher where the native library is unavailable."""
    from . import profile

    if settings.solve_resolution < 1.0:
        with profile.scope("solve/simplify"):
            positions, tris = simplify_surface(positions, tris,
                                               settings.solve_resolution)
    tets = None
    with profile.scope("solve/tetrahedralize"):
        try:
            from .mesh.cdt import generate_tets_delaunay, native_available

            if native_available():
                lo = np.asarray(positions, np.float64).min(axis=0)
                hi = np.asarray(positions, np.float64).max(axis=0)
                h = float((hi - lo).max()) / max(tet_resolution, 1)
                tets = generate_tets_delaunay(
                    positions, tris, lattice_h=h,
                    quality_bound=2.0 if settings.quality_tets else 0.0)
        except Exception:
            tets = None
        if tets is None:
            try:
                tets = generate_tets(positions, tris, resolution=tet_resolution)
            except ValueError as exc:
                # Diagnose the failure with topology before re-raising (the reference
                # returns tetrahedralization error strings, Tetrahedralize.h:44-60):
                # open boundaries are the usual cause of "no interior".
                try:
                    from .mesh.halfedge import build_halfedge

                    he = build_halfedge(positions, tris)
                    nb = int(np.asarray(he.boundary_halfedges()).size)
                    if nb:
                        raise ValueError(
                            f"tetrahedralization failed: surface is not closed "
                            f"({nb} boundary half-edges); {exc}") from exc
                except ValueError:
                    raise
                except Exception:
                    pass
                raise
    if excite_positions is None:
        # Evenly spaced surface vertices, as the reference picks when none are assigned
        # (AudioSystem.cpp:953-957).
        idx = np.linspace(0, positions.shape[0] - 1, settings.num_vertices).astype(int)
        excite_positions = positions[idx]
    config = SolverConfig(
        min_mode_freq=settings.min_mode_freq,
        max_mode_freq=settings.max_mode_freq,
        num_modes=settings.num_modes,
        num_fem_modes=max(settings.num_modes + 15, settings.num_modes * 3 // 2),
    )
    with profile.scope("solve/mesh2modes"):
        return mesh2modes(
            tets, material, excite_positions, baked_scale, config, reuse, cancelled,
            progress, verbose=verbose
        )


def make_synth(
    results: Sequence[ModalResult | ModalModes],
    gains: Optional[Sequence[float]] = None,
    sample_rate: float = 48_000.0,
    modal_level: float = 0.5,
    **kwargs,
) -> ModalSynth:
    """A synth over solved models. Per-object output gain defaults to the reference's
    mass-normalized scale: modal_level / mode_count (AudioSystem.cpp:576-579)."""
    modes_list = [r.modes if isinstance(r, ModalResult) else r for r in results]
    if gains is None:
        gains = [
            modal_level / max(m.num_modes, 1) * 1e3  # 1e3: mass-normalized shapes are tiny
            for m in modes_list
        ]
    return ModalSynth(modes_list, gains, sample_rate, **kwargs)


def contact_dynamics_for(result: ModalResult, scale_ratio: float = 1.0) -> ContactDynamics:
    """Per-object contact dynamics from solved mass properties + sample positions
    (reference: UpdateContactDynamics, src/audio/ContactDynamics.cpp:14-50)."""
    mp = result.mass_props
    positions = np.asarray(result.modes.positions, dtype=np.float64)
    arm = (positions - mp.center_of_mass) * scale_ratio
    return ContactDynamics(
        mass=mp.mass * scale_ratio**3,
        inverse_inertia=inverse_inertia_tensor(mp) / max(scale_ratio**5, 1e-30),
        contact_arm=arm,
    )


def strike(
    synth: ModalSynth,
    obj: int,
    expos: int,
    result: ModalResult,
    direction: np.ndarray,
    impulse_mag: float = 0.05,
    speed: float = 1.0,
    striker: Striker = Striker(),
    material: Optional[AcousticMaterialProperties] = None,
    object_curvature: float = 0.0,
    accel_amp: float = 0.0,
) -> float:
    """Hertz-modeled strike: derives the contact time from the virtual mallet and enqueues
    the impact (reference: TriggerModalStrike, AudioSystem.cpp:709-768). Returns tau."""
    dyn = contact_dynamics_for(result)
    imp = striker_impactor(striker)
    mat = material or AcousticMaterialProperties(2700, 7.2e10, 0.19)
    direction = np.asarray(direction, dtype=np.float64)
    direction = direction / max(np.linalg.norm(direction), 1e-30)
    tau = estimate_contact_time(dyn, expos, direction, speed, mat, object_curvature, imp)
    synth.strike(obj, expos, direction * impulse_mag, tau, accel_amp)
    return tau
