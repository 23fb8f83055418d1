from .core import Mesh, locate_cells, locate_dofs_on_facets
from .builders import one_dimensional_setup, rectangle_setup, square_setup

__all__ = [
    "Mesh",
    "locate_cells",
    "locate_dofs_on_facets",
    "one_dimensional_setup",
    "rectangle_setup",
    "square_setup",
]
