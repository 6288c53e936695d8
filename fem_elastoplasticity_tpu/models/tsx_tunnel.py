"""TSX tunnel excavation: Drucker-Prager elastoplasticity on an unstructured
triangle mesh (benchmark C).

Parity target: `tsx-tunnel/pythonFEM.py:1637-1851`.  Behavioral anchors
(SURVEY.md §8.1): 17 accepted load steps / 28 Newton iterations, plastic
onset at step 14, final tunnel-wall displacement U[0, 40] = -1.979450e-03.

The mesh (476 nodes / 887 P1 triangles, from the TU Liberec team) ships with
the package as `data/tsx_tunnel_mesh.npz` (converted from the reference's
`coord.csv`/`elem.csv`).
"""
from __future__ import annotations

import pathlib
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..mesh.midpoints import promote
from ..mesh.refine import refine_uniform
from ..mesh.structured import Mesh
from ..ops.elements import ElementType
from .config import TsxTunnelConfig

_DATA = pathlib.Path(__file__).parent.parent / "data" / "tsx_tunnel_mesh.npz"


def tsx_mesh(
    etype: ElementType = ElementType.P1, refine_levels: int = 0
) -> Mesh:
    """Load the TSX mesh, optionally refine (P1), then promote to `etype`.

    Dirichlet BCs (`tsx-tunnel/pythonFEM.py:1695-1699`): normal displacement
    clamped on the +-50 box, i.e. u_x fixed where |x| > 49.99 and u_y fixed
    where |y| > 49.99 (homogeneous).
    """
    raw = np.load(_DATA)
    coords, elems = raw["coords"].astype(np.float64), raw["elems"]
    for _ in range(refine_levels):
        coords, elems = refine_uniform(coords, elems)
    coords, elems = promote(etype, coords, elems)

    free = np.ones((coords.shape[0], 2), dtype=bool)
    free[np.abs(coords[:, 0]) > 49.99, 0] = False
    free[np.abs(coords[:, 1]) > 49.99, 1] = False
    dirichlet = np.zeros_like(coords)
    return Mesh(coords, elems, etype, dirichlet=dirichlet, free=free)


def initial_state(cfg: TsxTunnelConfig):
    """Initial stress and the derived initial strain (inverse plane-strain
    Hooke), `tsx-tunnel/pythonFEM.py:1675-1681`."""
    s0 = np.asarray(cfg.init_stress, dtype=np.float64)
    tr = s0[0] + s0[1] + s0[3]
    nu, E = cfg.poisson, cfg.young
    e0 = (
        np.array(
            [
                -nu * tr + (1 + nu) * s0[0],
                -nu * tr + (1 + nu) * s0[1],
                0.0,
                -nu * tr + (1 + nu) * s0[3],
            ]
        )
        / E
    )
    return s0, e0
