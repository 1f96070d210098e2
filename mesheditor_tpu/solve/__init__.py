from .lobpcg import lobpcg_pencil, LobpcgResult
from .mesh2modes import mesh2modes, ModalResult, SolveReuse
from .postprocess import postprocess_modes, rescale_modes

__all__ = [
    "lobpcg_pencil",
    "LobpcgResult",
    "mesh2modes",
    "ModalResult",
    "SolveReuse",
    "postprocess_modes",
    "rescale_modes",
]
