"""mesheditor_tpu — a TPU-native (JAX/XLA/Pallas) modal physical-audio framework.

From-scratch rebuild of the capabilities of khiner/MeshEditor (reference mounted at
/root/reference), designed TPU-first:

- FEM modal analysis over quadratic (10-node) tetrahedral elements, assembled as batched
  element matrices driving matrix-free pencil operators (reference: src/audio/mesh2modes.cpp).
- A generalized block eigensolver (LOBPCG with inexact shift-invert preconditioning) replacing
  the reference's sparse-Cholesky shift-invert Lanczos (src/audio/CholeskyShiftInvert.cpp).
- A modal resonator bank — per-mode complex one-pole filters — batched across (objects, modes)
  and rendered with `lax.scan`/Pallas at 48 kHz, with impact and sustained-contact (scrape/roll)
  excitation (reference: src/audio/ModalAudio.cpp).
- Hertz/Hunt-Crossley contact models, self-affine surface roughness tracks, and the host
  orchestration layer (events, voices, content-addressed model files).

The solve path runs in float64 (enabled below); the render path is explicit float32.
"""

import jax

# The FEM assembly and eigensolve require double precision (the reference solves in double;
# frequencies must match a shift-invert Lanczos path to 0.1%). Render code pins float32.
jax.config.update("jax_enable_x64", True)

from .types import (  # noqa: E402
    AcousticMaterialProperties,
    AcousticMaterial,
    MassProperties,
    ModalModes,
    ModalSolveSettings,
    ModalSoundControls,
    SolverConfig,
    SolveProfile,
    TetMesh,
)
from .materials import ACOUSTIC_MATERIALS, find_material  # noqa: E402
from .solve.mesh2modes import mesh2modes, ModalResult, SolveReuse  # noqa: E402
from .solve.postprocess import postprocess_modes, rescale_modes  # noqa: E402

__all__ = [
    "AcousticMaterialProperties",
    "AcousticMaterial",
    "MassProperties",
    "ModalModes",
    "ModalSolveSettings",
    "ModalSoundControls",
    "SolverConfig",
    "SolveProfile",
    "TetMesh",
    "ACOUSTIC_MATERIALS",
    "find_material",
    "mesh2modes",
    "ModalResult",
    "SolveReuse",
    "postprocess_modes",
    "rescale_modes",
]
