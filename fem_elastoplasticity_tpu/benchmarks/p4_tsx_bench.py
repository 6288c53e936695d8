"""Full-schedule P4 TSX excavation benchmark (the reference's entry point).

The reference's actual driver config is `elasticity_fem(P4, level=1)`
(`tsx-tunnel/sandbox.py:4`, `tsx-tunnel/pythonFEM.py:1637`): 15-node
quartic triangles on the unstructured tunnel mesh, full excavation to
zeta = 1.  This runs it end-to-end (matrix-free CG tangent solves — the
P4 system has ~14k free DOFs) and reports wall clock + trajectory facts.

Run on TPU:  python -m fem_elastoplasticity_tpu.benchmarks.p4_tsx_bench
CPU f64 measurement (this container, 2026-08-16): 389 s, 17 steps /
40 Newton iterations / 79 plastic points / u40 = -2.267020043e-03.
"""
from __future__ import annotations

import json
import time


def main(fast: bool = True, assembled: bool = True) -> None:
    from ..models.config import TsxTunnelConfig
    from ..models.tsx_tunnel import solve
    from ..ops.elements import ElementType

    kw = dict(etype=ElementType.P4, solver="cg")
    if fast:
        # assembled-operator CG (config.assembled_cg): the tangent CG and
        # the df32 Newton residual run on host-assembled compacted-slot
        # Pallas operators instead of the serialized matrix-free gather
        # path — the production P4 configuration
        cfg = TsxTunnelConfig.fast(assembled_cg=assembled, **kw)
    else:
        cfg = TsxTunnelConfig(**kw)
    t0 = time.perf_counter()
    r = solve(cfg)
    wall = time.perf_counter() - t0

    path = "native_cg"
    if fast:
        path = "df32_cg_assembled" if assembled else "df32_cg"
    print(
        json.dumps(
            {
                "metric": "tsx_tunnel_p4_full_schedule_wall",
                "value": wall,
                "unit": "s",
                "path": path,
                "n_steps": r.n_steps,
                "n_newton_total": r.n_newton_total,
                "n_plastic": r.n_plastic,
                "u40": float(r.u[40, 0]),
            }
        )
    )


if __name__ == "__main__":
    import sys

    main(
        fast="--native" not in sys.argv,
        assembled="--matrix-free" not in sys.argv,
    )
