"""Geometric multigrid preconditioner tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fem_elastoplasticity_tpu.models.config import TsxTunnelConfig
from fem_elastoplasticity_tpu.models.materials import (
    elastic_tangent_lanes,
    lame_moduli,
)
from fem_elastoplasticity_tpu.models.tsx_tunnel import initial_state, tsx_mesh
from fem_elastoplasticity_tpu.ops import assembly as asm
from fem_elastoplasticity_tpu.ops.elements import ElementType, tables, volume_element
from fem_elastoplasticity_tpu.solve import multigrid as mg
from fem_elastoplasticity_tpu.solve.cg import block_jacobi_preconditioner, solve_cg

CFG = TsxTunnelConfig()
G, K = lame_moduli(CFG.young, CFG.poisson)


def _free_fn(coords):
    free = np.ones((coords.shape[0], 2), dtype=bool)
    free[np.abs(coords[:, 0]) > 49.99, 0] = False
    free[np.abs(coords[:, 1]) > 49.99, 1] = False
    return free


def _setup(L):
    mesh0 = tsx_mesh(ElementType.P1)
    tab = tables(volume_element(ElementType.P1))
    hier = mg.build_hierarchy(mesh0.coords, mesh0.elems, L, _free_fn)
    levels = mg.build_mg_levels(
        hier, tab, lambda g: elastic_tangent_lanes(G, K, g.n_int, jnp.float64)
    )
    lev0 = levels[0]
    fmap, n_free = asm.free_dof_map(np.asarray(hier[0].free))
    K0 = asm.assemble_dense_free(
        asm.element_stiffness(lev0.geom, lev0.d), lev0.geom, jnp.asarray(fmap), n_free
    )
    cho = jax.scipy.linalg.cho_factor(K0)
    idx0 = jnp.asarray(np.nonzero(np.asarray(hier[0].free).reshape(-1))[0])

    def coarse_solve(r):
        return jnp.zeros_like(r).at[idx0].set(
            jax.scipy.linalg.cho_solve(cho, r[idx0])
        )

    return levels, mg.make_vcycle(levels, coarse_solve, nu=2)


class TestTransferOperators:
    def test_restrict_is_prolong_transpose(self):
        levels, _ = _setup(1)
        fine, coarse = levels[1], levels[0]
        n_c, n_f = coarse.geom.n_nodes, fine.geom.n_nodes
        rng = np.random.default_rng(0)
        vc = jnp.asarray(rng.normal(size=2 * n_c))
        rf = jnp.asarray(rng.normal(size=2 * n_f))
        lhs = float(rf @ mg.prolong(vc, fine.parents, n_f))
        rhs = float(mg.restrict(rf, fine.parents, n_c) @ vc)
        assert abs(lhs - rhs) < 1e-10 * abs(lhs)

    def test_prolongation_interpolates_linears(self):
        """P reproduces linear fields exactly (midpoints = averages)."""
        levels, _ = _setup(1)
        fine = levels[1]
        # linear displacement field u = A x + b on coarse nodes
        hier_coords_c = np.asarray(tsx_mesh(ElementType.P1).coords)
        A = np.array([[1.0, 2.0], [-0.5, 0.25]])
        u_c = hier_coords_c @ A.T + np.array([0.1, -0.2])
        u_f = mg.prolong(jnp.asarray(u_c.reshape(-1)), fine.parents, fine.geom.n_nodes)
        from fem_elastoplasticity_tpu.mesh.refine import refine_uniform

        cf, _ = refine_uniform(hier_coords_c, np.asarray(tsx_mesh(ElementType.P1).elems))
        expect = cf @ A.T + np.array([0.1, -0.2])
        np.testing.assert_allclose(np.asarray(u_f).reshape(-1, 2), expect, atol=1e-12)


class TestVCyclePCG:
    @pytest.mark.parametrize("L,max_expected", [(1, 25), (2, 30)])
    def test_mesh_independent_iterations(self, L, max_expected):
        levels, pre = _setup(L)
        fine = levels[-1]
        s0, _ = initial_state(CFG)
        s0f = jnp.broadcast_to(jnp.asarray(s0[:3])[:, None], (3, fine.geom.n_int))
        f0 = asm.internal_force(fine.geom, s0f)
        res = solve_cg(
            lambda v: asm.tangent_matvec(fine.geom, fine.d, v),
            -f0, fine.free_flat.reshape(-1, 2), precond=pre, tol=1e-12, maxiter=100,
        )
        assert int(res.iters) <= max_expected

    def test_matches_block_jacobi_solution(self):
        levels, pre = _setup(1)
        fine = levels[-1]
        s0, _ = initial_state(CFG)
        s0f = jnp.broadcast_to(jnp.asarray(s0[:3])[:, None], (3, fine.geom.n_int))
        f0 = asm.internal_force(fine.geom, s0f)
        A = lambda v: asm.tangent_matvec(fine.geom, fine.d, v)
        free2 = fine.free_flat.reshape(-1, 2)
        r1 = solve_cg(A, -f0, free2, precond=pre, tol=1e-12, maxiter=100)
        bj = block_jacobi_preconditioner(
            asm.node_block_diagonal(fine.geom, fine.d), free2
        )
        r2 = solve_cg(A, -f0, free2, precond=bj, tol=1e-12, maxiter=2000)
        rel = float(jnp.abs(r1.x - r2.x).max() / jnp.abs(r2.x).max())
        assert rel < 1e-10


class TestFullSolveWithMG:
    def test_adaptive_solve_mg_matches_cg(self):
        """Full load-stepped elastoplastic solve on a refined mesh with the
        multigrid-preconditioned tangent CG matches block-Jacobi CG."""
        from fem_elastoplasticity_tpu.models.tsx_tunnel import solve

        r_mg = solve(TsxTunnelConfig(solver="mg", refine_levels=1))
        r_cg = solve(TsxTunnelConfig(solver="cg", refine_levels=1))
        assert r_mg.n_steps == r_cg.n_steps == 17
        np.testing.assert_allclose(
            np.asarray(r_mg.u), np.asarray(r_cg.u), atol=1e-14
        )


class TestEllSolverMode:
    def test_df32_ell_matches_mg_trajectory(self):
        """The assembled windowed-ELL multigrid solver (solver="ell",
        permuted node ordering) reproduces the matrix-free mg solver's
        adaptive trajectory and monitored displacement."""
        from fem_elastoplasticity_tpu.models import tsx_tunnel as tsx

        out = {}
        for solver in ("mg", "ell"):
            cfg = TsxTunnelConfig.fast_scale(1, solver=solver)
            run, args, mesh = tsx.build_df32(cfg)
            res = run(args)
            k = int(res.n_steps) - 1
            u40 = float(np.asarray(res.monitor_hist.hi, np.float64)[k]) + float(
                np.asarray(res.monitor_hist.lo, np.float64)[k]
            )
            out[solver] = (
                int(res.n_steps),
                int(res.n_newton_total),
                int(res.n_plastic),
                u40,
            )
        assert out["ell"][0] == out["mg"][0] == 17
        assert out["ell"][1] == out["mg"][1]
        assert out["ell"][2] == out["mg"][2]
        np.testing.assert_allclose(out["ell"][3], out["mg"][3], rtol=1e-7)

    def test_ell_chunked_matches_single_dispatch(self):
        """Resume-chunked execution of the ELL solver (the level>=4
        large-mesh path, dp_scale_bench) is bit-identical to the
        single-dispatch run — slot/ELL operator arrays ride the resume
        carry unchanged."""
        import numpy as _np

        from fem_elastoplasticity_tpu.models import tsx_tunnel as tsx

        cfg = TsxTunnelConfig.fast_scale(1)
        run, args, _ = tsx.build_df32(cfg)
        full = run(args)
        res, _ = tsx.run_df32_chunked(cfg, trips_per_chunk=2)
        f64 = lambda p: _np.asarray(p.hi, _np.float64) + _np.asarray(
            p.lo, _np.float64
        )
        assert int(res.n_steps) == int(full.n_steps)
        assert int(res.n_newton_total) == int(full.n_newton_total)
        _np.testing.assert_array_equal(f64(res.u), f64(full.u))

    def test_ell_permutation_consistency(self):
        """The permuted result mesh's monitor node tracks the same physical
        point: coords at the remapped id equal the raw mesh's node 40."""
        import numpy as _np

        from fem_elastoplasticity_tpu.models import tsx_tunnel as tsx

        cfg = TsxTunnelConfig.fast_scale(1)
        run, args, mesh = tsx.build_df32(cfg)
        raw = tsx.tsx_mesh(ElementType.P1, 1)
        # some permutation of the same node set
        assert sorted(map(tuple, _np.asarray(mesh.coords).tolist())) == sorted(
            map(tuple, _np.asarray(raw.coords).tolist())
        )
