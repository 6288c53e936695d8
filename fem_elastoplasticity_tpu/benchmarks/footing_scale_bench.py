"""Strip-footing DP solves at scale: the df32+cg footing path.

The reference's footing benchmark runs only at level 1 (dense masked
solve, `Plasticity2D_DP/pythonFEM.py:901-1157`); its O(n^2) dense
pipeline cannot represent refined levels at all.  This runs the COMPLETE
adaptive pressure-controlled schedule (semi-smooth Newton, dzeta
doubling rule, near-incompressible nu=0.48) at refined levels with
matrix-free f32 block-Jacobi PCG tangent solves and the double-float
residual/criterion (`models/footing.py` solver="cg", precision="df32").

Run on TPU:  python -m fem_elastoplasticity_tpu.benchmarks.footing_scale_bench [levels...]

Level sizes (P1, measured): level 1 = 800 elems / 441 nodes,
2 = 3.2k/1.7k, 3 = 12.8k/6.6k, 4 = 51.2k/26k, 5 = 204.8k/103k.

Measured walls (TPU v5e, 2026-08-20, df32, warm):
  level  cg (matrix-free)  assembled full-tangent (assembled_cg=True)
  1      14.7 s            1.75 s   (8.4x; same 17 steps, limit 16.8362)
  2      91.7 s (23 st)    6.37 s   (14x; 29 steps, same limit 17.681)
  3      —                 76.1 s   (134 steps, limit 18.687)
The step-count spread at level >= 2 is the adaptive controller reacting
to inexact f32 tangent solves near the limit load; the pressure curve
and limit pressure agree (cg-vs-assembled limit at level 2: 2e-6 rel).
Block-Jacobi CG iteration counts (~h^-1 growth, nu = 0.48) are the
remaining scale bottleneck, not per-iteration cost.

Level >= 4 runs the `FootingConfig.fast_scale` preset (tangent
multigrid + cg_cap_relax + achievable tolerances — config.py doc):
  python -m fem_elastoplasticity_tpu.benchmarks.footing_scale_bench 4 --scale
Measured 2026-08-21 (TPU v5e): level 4 (51.8k DOFs) completes the full
pressure schedule in ~1235 s total (1076 s stepping + compile/chunk0):
290 steps / 2270 Newton its / 3.84M CG its, limit pressure 20.4259 —
identical to the strict round-3 value, 1.8x faster with a 1.6x saner
schedule.
"""
from __future__ import annotations

import json
import sys
import time


def run_footing_scale(
    levels=(1, 2, 3), reps: int = 3, verbose: bool = True,
    scale_preset: bool = False, **cfg_kw
):
    """cfg_kw: extra FootingConfig.fast overrides (A/B runs, e.g.
    assembled_cg=True for the full-tangent slot-refresh path).
    scale_preset: use FootingConfig.fast_scale (tangent-MG production
    config for level >= 4 — module docstring)."""
    import numpy as np

    from ..models.config import FootingConfig
    from ..models.footing import build_df32, _package_df32

    from ..models.footing import build_df32_chunked

    results = []
    for level in levels:
        if scale_preset:
            cfg = FootingConfig.fast_scale(level, **cfg_kw)
        else:
            kw = dict(solver="cg", cg_maxiter=4000)
            kw.update(cfg_kw)
            cfg = FootingConfig.fast(level=level, **kw)
        # levels >= 2 run the load loop in resume-chunked dispatches
        # (solve/chunked.py): the axon tunnel aborts single dispatches
        # running >~1-2 min, and the footing schedule has ~25+ trips
        t0 = time.perf_counter()
        if level >= 2:
            execute, mesh = build_df32_chunked(cfg, trips_per_chunk=5)
            runner = lambda: execute()
        else:
            run, args, mesh = build_df32(cfg)
            runner = lambda: run(args)
        setup = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = _package_df32(runner(), mesh)
        first = time.perf_counter() - t0
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = _package_df32(runner(), mesh)
            walls.append(time.perf_counter() - t0)
        rec = {
            "level": level,
            "n_elems": int(r.mesh.n_elems),
            "n_dofs": int(2 * r.mesh.n_nodes),
            "wall_s": float(np.median(walls)) if walls else first,
            "first_incl_compile_s": first,
            "setup_s": setup,
            "n_steps": int(r.n_steps),
            "n_newton_total": int(r.n_newton_total),
            "n_cg_total": int(r.n_cg_total),
            "n_plastic": int(r.n_plastic),
            "cg_deflate": int(getattr(cfg, "cg_deflate", 0)),
            "limit_pressure": float(r.pressure_hist[r.n_steps]),
            "zeta_end": float(np.asarray(r.zeta_hist).max()),
        }
        results.append(rec)
        if verbose:
            print(json.dumps(rec), flush=True)
    return results


if __name__ == "__main__":
    scale = "--scale" in sys.argv
    kw = {}
    for a in sys.argv[1:]:
        if a.startswith("--deflate="):
            kw["cg_deflate"] = int(a.split("=", 1)[1])
        elif a.startswith("--reps="):
            kw["reps"] = int(a.split("=", 1)[1])
    lv = tuple(
        int(x) for x in sys.argv[1:] if not x.startswith("-")
    ) or (1, 2, 3)
    run_footing_scale(levels=lv, scale_preset=scale, **kw)
