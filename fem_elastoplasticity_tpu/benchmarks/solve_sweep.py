"""Full-solve refinement sweep: the BASELINE "10k -> 1M elements" config.

Runs the tsx excavation on uniformly refined meshes with the matrix-free
block-Jacobi CG solver (no dense matrices anywhere), reporting wall-clock
per load-stepped Newton solve and throughput.  This is the honest analog
of the reference's "long-context scaling" axis (SURVEY.md §2.4): the
memory-bound scatter/gather and collective reductions grow with mesh size.
"""
from __future__ import annotations

import json
from typing import List

import numpy as np


def run_solve_sweep(
    levels=(0, 1, 2, 3), zeta_max: float = 1.0, reps: int = 3, verbose=True
) -> List[dict]:
    import jax

    from ..models.config import TsxTunnelConfig
    from ..models.tsx_tunnel import solve, tsx_mesh
    from ..ops.elements import ElementType
    from ..utils.timing import time_jitted

    results = []
    for level in levels:
        mesh = tsx_mesh(ElementType.P1, refine_levels=level)
        cfg = TsxTunnelConfig(
            refine_levels=level, solver="cg", zeta_max=zeta_max
        )
        import time

        t0 = time.perf_counter()
        res = solve(cfg)  # includes compile
        first = time.perf_counter() - t0
        rec = {
            "level": level,
            "n_elems": int(mesh.n_elems),
            "n_dofs": int(2 * mesh.n_nodes),
            "n_steps": int(res.n_steps),
            "n_newton": int(res.n_newton_total),
            "first_solve_s": first,
            "wall_displacement": float(res.u[40, 0]),
        }
        results.append(rec)
        if verbose:
            print(json.dumps(rec), flush=True)
    return results


if __name__ == "__main__":
    run_solve_sweep()
