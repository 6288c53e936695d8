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


def test_elastic_df32_sweep_matches_f64():
    """The df32 MG-CG elastic solve (fast-path sweep) reproduces the f64
    elastic predictor field to the df32 floor at level 1."""
    import jax.numpy as jnp

    from fem_elastoplasticity_tpu.benchmarks.elastic_df32_sweep import (
        run_elastic_df32_sweep,
    )
    from fem_elastoplasticity_tpu.models.config import TsxTunnelConfig
    from fem_elastoplasticity_tpu.models.materials import (
        elastic_tangent_lanes,
        lame_moduli,
    )
    from fem_elastoplasticity_tpu.models.tsx_tunnel import (
        initial_state,
        tsx_mesh,
    )
    from fem_elastoplasticity_tpu.ops import assembly as asm
    from fem_elastoplasticity_tpu.ops.elements import (
        ElementType,
        tables,
        volume_element,
    )
    from fem_elastoplasticity_tpu.solve.cg import (
        block_jacobi_preconditioner,
        solve_cg,
    )

    recs = run_elastic_df32_sweep(levels=(1,), reps=1, verbose=False)
    u_max_df32 = recs[0]["u_max"]

    # f64 reference solve of the same system (matrix-free CG at 1e-14)
    cfg = TsxTunnelConfig()
    mesh = tsx_mesh(ElementType.P1, refine_levels=1)
    shear, bulk = lame_moduli(cfg.young, cfg.poisson)
    s0, _ = initial_state(cfg)
    geom = asm.compute_geometry(
        jnp.asarray(mesh.coords), jnp.asarray(mesh.elems),
        tables(volume_element(ElementType.P1)),
    )
    s0f = jnp.broadcast_to(jnp.asarray(s0)[:3, None], (3, geom.n_int))
    f0 = asm.internal_force(geom, s0f)
    D = elastic_tangent_lanes(shear, bulk, geom.n_int, jnp.float64)
    blocks = asm.node_block_diagonal(geom, D)
    pre = block_jacobi_preconditioner(blocks, jnp.asarray(mesh.free))
    res = solve_cg(
        lambda v: asm.tangent_matvec(geom, D, v), -f0,
        jnp.asarray(mesh.free), precond=pre, tol=1e-14, maxiter=4000,
    )
    u64_max = float(jnp.abs(res.x).max())
    assert abs(u_max_df32 - u64_max) / u64_max < 1e-11


def test_footing_scale_bench_smoke():
    from fem_elastoplasticity_tpu.benchmarks.footing_scale_bench import (
        run_footing_scale,
    )

    recs = run_footing_scale(levels=(1,), reps=0, verbose=False)
    assert recs[0]["zeta_end"] >= 1.0
    assert recs[0]["n_steps"] >= 16
    assert 16.0 < recs[0]["limit_pressure"] < 18.0
