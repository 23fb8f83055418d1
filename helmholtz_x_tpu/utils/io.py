"""Result persistence (reference: helmholtz_x/io_utils.py:10-38) plus
re-exports of the XDMF/VTK writers and the .msh conversion helper."""

from __future__ import annotations

import ast
import json
import os

from ..mesh.xdmf import (  # noqa: F401  (re-exports, reference io_utils.py)
    XDMFReader,
    vtk_writer,
    write_function_xdmf,
    write_xdmf_mesh,
)
from ..utils.logging import info

xdmf_writer = write_function_xdmf  # reference name (io_utils.py:40)


def dict_writer(filename: str, dictionary: dict, extension: str = ".txt"):
    """Write an eigenvalue-result dict as the reference's JSON-of-repr format
    so downstream tooling (and dict_loader) stay compatible."""
    parent = os.path.dirname(filename)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(filename + extension, "w") as f:
        f.write(json.dumps(str(dictionary)))
    info(f"{filename}{extension}  is saved.")


def dict_loader(filename: str, extension: str = ".txt") -> dict:
    with open(filename + extension) as f:
        data = json.load(f)
    data = ast.literal_eval(data)
    info(f"{filename}{extension}  is loaded.")
    return data
