"""Boundary-edge extraction for unstructured triangle meshes (host-side).

The reference's midpoint-insertion routines emit the boundary edge list as
a side product (`create_midpoints_P2` surf rows [V3,V2,mid] etc.,
`tsx-tunnel/pythonFEM.py:1556-1616`); here boundary extraction is a
standalone vectorized pass usable on any P1/P2/P4 triangle mesh, so
traction loads (`ops.assembly.traction_force_vector`) work on unstructured
meshes too.
"""
from __future__ import annotations

import numpy as np

from ..ops.elements import ElementType


def boundary_edges(elems: np.ndarray, etype: ElementType = ElementType.P1):
    """Edges belonging to exactly one triangle, with higher-order nodes.

    Args:
      elems: (n_e, n_p) connectivity — P1 (3), P2 (6) or P4 (15) triangle
        layout as produced by `mesh.midpoints.promote`.

    Returns (n_b, n_p_s) int32: [end0, end1] (P1), [end0, end1, mid] (P2),
    or [end0, end1, mid, quarter-near-end0, quarter-near-end1] (P4), with
    the edge oriented as in its owning element.
    """
    elems = np.asarray(elems)
    v = elems[:, :3]
    # local edges in element orientation: (V1,V2), (V2,V3), (V3,V1)
    directed = np.stack(
        [v[:, [0, 1]], v[:, [1, 2]], v[:, [2, 0]]], axis=1
    ).reshape(-1, 2)
    lo = directed.min(axis=1).astype(np.int64)
    hi = directed.max(axis=1).astype(np.int64)
    keys = lo * (hi.max() + 1) + hi
    _, inverse, counts = np.unique(keys, return_inverse=True, return_counts=True)
    on_boundary = counts[inverse] == 1  # (3*n_e,)

    slot = np.nonzero(on_boundary)[0]
    e_idx, l_idx = slot // 3, slot % 3
    ends = directed[slot]

    if etype == ElementType.P1 or elems.shape[1] == 3:
        return ends.astype(np.int32)
    if elems.shape[1] == 6:  # P2: mid rows 3..5 are m23, m31, m12
        mid_col = np.array([5, 3, 4])  # edge (V1,V2)->m12, (V2,V3)->m23, (V3,V1)->m31
        mids = elems[e_idx, mid_col[l_idx]]
        return np.concatenate([ends, mids[:, None]], axis=1).astype(np.int32)
    if elems.shape[1] == 15:  # P4 layout (see mesh/midpoints.py)
        mid_col = np.array([3, 4, 5])
        qa_col = np.array([6, 8, 10])  # quarter near the edge's first vertex
        qb_col = np.array([7, 9, 11])
        extra = np.stack(
            [
                elems[e_idx, mid_col[l_idx]],
                elems[e_idx, qa_col[l_idx]],
                elems[e_idx, qb_col[l_idx]],
            ],
            axis=1,
        )
        return np.concatenate([ends, extra], axis=1).astype(np.int32)
    raise NotImplementedError(f"boundary extraction for n_p={elems.shape[1]}")
