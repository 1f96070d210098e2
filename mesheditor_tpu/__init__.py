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

import os

import jax

# The FEM assembly and eigensolve require double precision (the reference solves in double;
# frequencies must match a shift-invert Lanczos path to 0.1%). Render code pins float32.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the solver/renderer stages compile in tens of seconds
# at production shapes; caching them on disk makes every process after the first start
# warm (the reference has no compile step to amortize — this is the XLA-model cost and
# the XLA-model fix). Opt out with MESHEDITOR_TPU_NO_COMPILE_CACHE=1.
if not os.environ.get("MESHEDITOR_TPU_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "MESHEDITOR_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/mesheditor_tpu_xla")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without the knobs; in-memory cache still applies
        pass

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
