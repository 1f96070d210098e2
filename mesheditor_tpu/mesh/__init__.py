from .primitives import (
    bar_tets,
    box_tets,
    cuboid_surface,
    cylinder_surface,
    grid_box_surface,
    icosphere_surface,
    plane_surface,
    torus_surface,
    uv_sphere_surface,
)
from .obj_io import load_obj, save_obj

__all__ = [
    "bar_tets",
    "box_tets",
    "cuboid_surface",
    "cylinder_surface",
    "grid_box_surface",
    "icosphere_surface",
    "plane_surface",
    "torus_surface",
    "uv_sphere_surface",
    "load_obj",
    "save_obj",
]
