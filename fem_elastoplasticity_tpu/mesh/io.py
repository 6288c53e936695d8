"""Mesh I/O: CSV loaders for unstructured triangle meshes (host-side).

Format parity with the reference (`tsx-tunnel/pythonFEM.py:1687-1688`):
`coord.csv` holds node coordinates as 2 comma-separated rows (x-row, y-row);
`elem.csv` holds P1 connectivity as 3 rows of 1-based node indices.
"""
from __future__ import annotations

import numpy as np

from ..ops.elements import ElementType
from .structured import Mesh


def load_csv_mesh(coord_path: str, elem_path: str) -> Mesh:
    """Load a P1 triangle mesh from the reference CSV format.

    Returns a `Mesh` with 0-based int32 connectivity.
    """
    coords = np.genfromtxt(coord_path, delimiter=",", dtype=np.float64)
    elems = np.genfromtxt(elem_path, delimiter=",", dtype=np.int64) - 1
    if coords.shape[0] == 2:  # rows are x / y
        coords = coords.T
    if elems.shape[0] == 3:
        elems = elems.T
    return Mesh(np.ascontiguousarray(coords), elems.astype(np.int32), ElementType.P1)


def save_csv_mesh(mesh: Mesh, coord_path: str, elem_path: str) -> None:
    """Write a P1 mesh back out in the reference CSV format (1-based)."""
    np.savetxt(coord_path, mesh.coords.T, delimiter=",")
    np.savetxt(elem_path, (mesh.elems.T + 1).astype(np.int64), delimiter=",", fmt="%d")
