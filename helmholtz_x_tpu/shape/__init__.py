from .derivatives import (
    derivatives_normalize,
    nonaxisymmetric_derivatives_normalize,
    shape_derivatives_ffd,
)
from .ffd import (
    FFDCylindrical,
    deform_mesh,
    deform_mesh_local,
    ffd_displacement_vector,
    surface_normals,
    write_ffd_points,
)

__all__ = [
    "FFDCylindrical",
    "deform_mesh",
    "deform_mesh_local",
    "ffd_displacement_vector",
    "surface_normals",
    "write_ffd_points",
    "derivatives_normalize",
    "nonaxisymmetric_derivatives_normalize",
    "shape_derivatives_ffd",
]
