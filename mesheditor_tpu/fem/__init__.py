from .quad_basis import EDGE_CORNERS, NUM_QUAD_NODES, quad_basis
from .quad_mesh import build_quad_mesh, QuadMesh
from .assembly import (
    assemble_element_matrices,
    ElementOperators,
    filter_degenerate,
    pencil_diagonals,
)
from .mass_properties import compute_mass_properties

__all__ = [
    "EDGE_CORNERS",
    "NUM_QUAD_NODES",
    "quad_basis",
    "build_quad_mesh",
    "QuadMesh",
    "assemble_element_matrices",
    "ElementOperators",
    "filter_degenerate",
    "pencil_diagonals",
    "compute_mass_properties",
]
