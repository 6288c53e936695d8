"""Structured mesh generators (host-side, NumPy — runs once).

Two domain families, matching the reference benchmarks:

* `square_mesh` — the unit-square-times-`size_xy` footing domain
  (reference `Plasticity2D_DP/pythonFEM.py:63-343`).
* `square_with_hole_mesh` — square with a square hole in the lower-left
  corner (reference `Elasticity2D/pythonFEM.py:481-922`).

Node numbering convention (identical to the reference): nodes are numbered
0-based in (y-major, x-minor) order over the kept grid nodes.  For quadratic
elements the grid is refined 2x and, for Q2, cell-center nodes are dropped.

All outputs are 0-based integer connectivity; the mesh is returned as a
`Mesh` dataclass with per-problem boundary data attached by the problem
modules (`models/`).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..ops.elements import ElementType


@dataclass
class Mesh:
    """Unstructured 2D mesh container (host-side).

    Attributes:
      coords:    (n_n, 2) float64 node coordinates
      elems:     (n_e, n_p) int32 element connectivity, 0-based
      etype:     element family
      surface:   (n_s, n_p_s) boundary edge connectivity (all boundary edges)
      neumann:   (n_t, n_p_s) edges carrying traction (may be empty)
      dirichlet: (n_n, 2) float64 inhomogeneous Dirichlet magnitudes
      free:      (n_n, 2) bool mask of free (unknown) DOFs
    """

    coords: np.ndarray
    elems: np.ndarray
    etype: ElementType
    surface: Optional[np.ndarray] = None
    neumann: Optional[np.ndarray] = None
    dirichlet: Optional[np.ndarray] = None
    free: Optional[np.ndarray] = None

    @property
    def n_nodes(self) -> int:
        return self.coords.shape[0]

    @property
    def n_elems(self) -> int:
        return self.elems.shape[0]

    @property
    def n_free_dofs(self) -> int:
        return int(self.free.sum()) if self.free is not None else 2 * self.n_nodes


def _grid_numbering(nx: int, ny: int, keep: np.ndarray) -> np.ndarray:
    """Number kept grid nodes 0-based in (y-major, x-minor) order.

    `keep` is a boolean array of shape (nx+1, ny+1) indexed [ix, iy].
    Returns int array `num` of same shape with -1 at dropped nodes.
    """
    num = -np.ones((nx + 1, ny + 1), dtype=np.int64)
    # y-major, x-minor: iterate y outer — vectorized via transposed C-order
    keep_t = keep.T  # (iy, ix)
    idx = np.cumsum(keep_t.ravel()).reshape(keep_t.shape) - 1
    num.T[keep_t] = idx[keep_t]
    return num


def square_mesh(level: int, etype: ElementType, size_xy: float) -> Mesh:
    """Structured mesh of the [0, size_xy]^2 square (footing domain).

    Parity: node/element numbering matches `Plasticity2D_DP/pythonFEM.py`
    `get_nodes_1` (P1/Q1, :63-186) and `get_nodes_2` (P2/Q2, :189-343).
    """
    N = int(size_xy * 2**level)
    if etype in (ElementType.P1, ElementType.Q1):
        g = N  # grid segments per side
        step = 1
    elif etype in (ElementType.P2, ElementType.Q2):
        g = 2 * N
        step = 2
    else:
        raise NotImplementedError(f"{etype} structured square mesh")

    keep = np.ones((g + 1, g + 1), dtype=bool)
    if etype == ElementType.Q2:
        keep[1::2, 1::2] = False  # drop cell centers (serendipity)
    num = _grid_numbering(g, g, keep)

    xs = np.linspace(0.0, size_xy, g + 1)
    # coordinates in numbering order: (y-major, x-minor)
    iy_t, ix_t = np.nonzero(keep.T)  # C-order over (iy, ix) = y-major
    coords = np.stack([xs[ix_t], xs[iy_t]], axis=1)

    elems = _cells_to_elems(num, N, step, etype, hole=None)
    surface, neumann = _square_surface(num, N, step, etype)
    return Mesh(coords, elems, etype, surface=surface, neumann=neumann)


def square_with_hole_mesh(
    level: int, etype: ElementType, size_xy: float, size_hole: float
) -> Mesh:
    """Square with square hole in the lower-left corner (elasticity domain).

    Parity: `Elasticity2D/pythonFEM.py` `get_nodes_1` (:481-660) /
    `get_nodes_2` (:663-922).  Nodes with (x < size_hole and y < size_hole)
    are removed; numbering is (y-major, x-minor) over kept nodes.
    """
    N = int(size_xy * 2**level)
    N1 = int(size_hole * 2**level)
    if etype in (ElementType.P1, ElementType.Q1):
        g, step, h1 = N, 1, N1
    elif etype in (ElementType.P2, ElementType.Q2):
        g, step, h1 = 2 * N, 2, 2 * N1
    else:
        raise NotImplementedError(f"{etype} structured hole mesh")

    keep = np.ones((g + 1, g + 1), dtype=bool)
    keep[:h1, :h1] = False  # the hole: x < size_hole and y < size_hole
    if etype == ElementType.Q2:
        centers = np.zeros_like(keep)
        centers[1::2, 1::2] = True
        keep &= ~centers
    num = _grid_numbering(g, g, keep)

    xs = np.linspace(0.0, size_xy, g + 1)
    iy_t, ix_t = np.nonzero(keep.T)
    coords = np.stack([xs[ix_t], xs[iy_t]], axis=1)

    elems = _cells_to_elems(num, N, step, etype, hole=N1)
    surface, neumann = _hole_surface(num, N, N1, step, etype)
    return Mesh(coords, elems, etype, surface=surface, neumann=neumann)


def _cells_to_elems(num, N, step, etype, hole):
    """Build element connectivity from the grid numbering.

    Cells are visited (cy-major, cx-minor); each quad cell has corners
    V1=(cx,cy) V2=(cx+1,cy) V3=(cx+1,cy+1) V4=(cx,cy+1) (in cell units).
    P1 splits each cell into triangles (V1,V2,V4), (V2,V3,V4) — in that
    order, matching the reference.
    """
    cy, cx = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    if hole is not None:
        mask = ~((cx < hole) & (cy < hole))
        cx, cy = cx[mask], cy[mask]
    else:
        cx, cy = cx.ravel(), cy.ravel()

    gx, gy = step * cx, step * cy  # lower-left grid index of the cell
    s = step

    def at(dx, dy):
        return num[gx + dx, gy + dy]

    if etype == ElementType.P1:
        t1 = np.stack([at(0, 0), at(1, 0), at(0, 1)], axis=1)
        t2 = np.stack([at(1, 0), at(1, 1), at(0, 1)], axis=1)
        elems = np.stack([t1, t2], axis=1).reshape(-1, 3)
    elif etype == ElementType.Q1:
        elems = np.stack([at(0, 0), at(1, 0), at(1, 1), at(0, 1)], axis=1)
    elif etype == ElementType.P2:
        # triangle (V1,V2,V4) with midpoints (m24, m14, m12) and
        # triangle (V2,V3,V4) with midpoints (m34, m24, m23);
        # P2 local order: [a, b, c, mid(b,c), mid(c,a), mid(a,b)]
        t1 = np.stack(
            [at(0, 0), at(2, 0), at(0, 2), at(1, 1), at(0, 1), at(1, 0)], axis=1
        )
        t2 = np.stack(
            [at(2, 0), at(2, 2), at(0, 2), at(1, 2), at(1, 1), at(2, 1)], axis=1
        )
        elems = np.stack([t1, t2], axis=1).reshape(-1, 6)
    elif etype == ElementType.Q2:
        elems = np.stack(
            [
                at(0, 0),
                at(2, 0),
                at(2, 2),
                at(0, 2),
                at(1, 0),
                at(2, 1),
                at(1, 2),
                at(0, 1),
            ],
            axis=1,
        )
    else:  # pragma: no cover
        raise NotImplementedError(etype)
    assert (elems >= 0).all(), "element references dropped node"
    return elems.astype(np.int32)


def _edge_nodes(num, fixed_axis, fixed_idx, lo, hi, step, reverse=False):
    """Edges along one side of the grid between grid indices [lo, hi].

    Returns (n_edges, n_p_s) with columns [end0, end1, interior nodes...].
    """
    idx = np.arange(lo, hi + 1)
    if fixed_axis == 0:  # fixed ix, varying iy
        line = num[fixed_idx, idx]
    else:
        line = num[idx, fixed_idx]
    if step == 1:
        e = np.stack([line[:-1], line[1:]], axis=1)
    else:
        e = np.stack([line[:-1:2], line[2::2], line[1::2]], axis=1)
    return e.astype(np.int32)


def _square_surface(num, N, step, etype):
    g = step * N
    bottom = _edge_nodes(num, 1, 0, 0, g, step)
    right = _edge_nodes(num, 0, g, 0, g, step)
    top = _edge_nodes(num, 1, g, 0, g, step)
    left = _edge_nodes(num, 0, 0, 0, g, step)
    surface = np.concatenate([bottom, right, top, left], axis=0)
    neumann = top
    return surface, neumann


def _hole_surface(num, N, N1, step, etype):
    g, h = step * N, step * N1
    face1 = _edge_nodes(num, 1, 0, h, g, step)  # y=0, x in [hole, L]
    face2 = _edge_nodes(num, 0, g, 0, g, step)  # x=L
    face3 = _edge_nodes(num, 1, g, 0, g, step)  # y=L (top) — Neumann
    face4 = _edge_nodes(num, 0, 0, h, g, step)  # x=0, y in [hole, L]
    face5 = _edge_nodes(num, 1, h, 0, h, step)  # y=hole, x in [0, hole]
    face6 = _edge_nodes(num, 0, h, 0, h, step)  # x=hole, y in [0, hole]
    surface = np.concatenate([face1, face2, face3, face4, face5, face6], axis=0)
    neumann = face3
    return surface, neumann
