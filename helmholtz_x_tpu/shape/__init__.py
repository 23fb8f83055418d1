from .ffd import FFDCylindrical, deform_mesh, surface_normals
from .derivatives import derivatives_normalize, shape_derivatives_ffd

__all__ = [
    "FFDCylindrical",
    "deform_mesh",
    "surface_normals",
    "derivatives_normalize",
    "shape_derivatives_ffd",
]
