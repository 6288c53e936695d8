"""Uniform (red) refinement of P1 triangle meshes (host-side, vectorized).

Each triangle is split into 4 congruent children through its edge midpoints.
This is the scaling axis of the benchmark suite (BASELINE.md: refinement
sweep 10k -> 1M elements on the tsx-tunnel mesh); the reference delegated the
equivalent operation to MATLAB's `refinement_uniform`
(`Elasticity2D/comparison_assembly_P1_2D_elasticity.py:48`).
"""
from __future__ import annotations

import numpy as np

from ..ops.elements import ElementType
from .midpoints import insert_midpoints_p2
from .structured import Mesh


def refine_uniform(coords: np.ndarray, elems: np.ndarray):
    """One level of red refinement.

    Args:
      coords: (n_n, 2); elems: (n_e, 3).

    Returns:
      (coords', elems') with 4*n_e elements.  Child order per parent:
      corner(V1), corner(V2), corner(V3), center — children are consistently
      oriented with the parent.
    """
    coords_ext, e6 = insert_midpoints_p2(coords, elems)
    v0, v1, v2 = e6[:, 0], e6[:, 1], e6[:, 2]
    m23, m31, m12 = e6[:, 3], e6[:, 4], e6[:, 5]
    children = np.stack(
        [
            np.stack([v0, m12, m31], axis=1),
            np.stack([v1, m23, m12], axis=1),
            np.stack([v2, m31, m23], axis=1),
            np.stack([m12, m23, m31], axis=1),
        ],
        axis=1,
    ).reshape(-1, 3)
    return coords_ext, children.astype(np.int32)


def refine_mesh(mesh: Mesh, levels: int = 1) -> Mesh:
    """Return `mesh` (P1) uniformly refined `levels` times."""
    assert mesh.etype == ElementType.P1, "refinement operates on P1 meshes"
    coords, elems = mesh.coords, mesh.elems
    for _ in range(levels):
        coords, elems = refine_uniform(coords, elems)
    return Mesh(coords, elems, ElementType.P1)
