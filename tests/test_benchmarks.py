"""Benchmark harness smoke tests (CPU, small sizes)."""
import numpy as np

from fem_elastoplasticity_tpu.benchmarks import run_assembly_sweep, run_solve_sweep


def test_assembly_sweep_smoke():
    recs = run_assembly_sweep(levels=1, reps=1, verbose=False)
    assert len(recs) == 2
    assert recs[1]["n_elems"] == 4 * recs[0]["n_elems"]
    assert all(r["assemble_apply_s"] > 0 for r in recs)


def test_solve_sweep_smoke():
    recs = run_solve_sweep(levels=(0,), reps=1, verbose=False)
    assert recs[0]["cg_iters"] > 0
    assert recs[0]["n_dofs"] == 952
