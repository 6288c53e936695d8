"""Recycled-Krylov deflation for the iterative tangent solves.

Unit-level coverage of `solve/cg.py`'s A-DEF2 deflated PCG (`deflate=`)
and the ring-basis harvest (`deflation_harvest`) — the machinery behind
`FootingConfig.cg_deflate` (solve/newton.py).  The model problem is an
SPD matrix with an isolated small-eigenvalue cluster, the f32 analog of
the footing's near-limit tangent spectra (localized shear-band modes —
BENCH_NOTES round 4): plain PCG stalls on the cluster, a deflation
basis spanning it removes the slow tail.

The A-DEF2 formulation is load-bearing: the textbook DEF1 variant
(projected search directions) diverges outright in f32 — round-off
re-excites the deflated modes and the projection prevents CG from ever
correcting them [Tang, Nabben, Vuik, Erlangga 2009].  These tests pin
the f32 behavior on the virtual CPU mesh (conftest forces cpu).
"""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from fem_elastoplasticity_tpu.solve.cg import (  # noqa: E402
    CGResult,
    deflation_harvest,
    solve_cg,
)


def _cluster_problem(n=200, k_small=5, lam_small=1e-4, seed=0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.concatenate(
        [np.full(k_small, lam_small), 1.0 + rng.random(n - k_small)]
    )
    A = (Q * lam) @ Q.T
    A = 0.5 * (A + A.T)
    return A, Q, rng


class TestDeflatedCG:
    def test_zero_basis_is_bitwise_plain_pcg(self):
        """Empty (all-zero) deflation slots must not perturb a single
        bit: the Gram matrix degenerates to the identity and every
        correction multiplies zero columns."""
        A, _, rng = _cluster_problem()
        Aj = jnp.asarray(A, jnp.float32)
        b = jnp.asarray(rng.standard_normal(A.shape[0]), jnp.float32)
        free = jnp.ones((A.shape[0],), bool)
        mv = lambda v: Aj @ v
        r0 = solve_cg(mv, b, free, tol=1e-6, maxiter=500)
        rd = solve_cg(
            mv, b, free, tol=1e-6, maxiter=500,
            deflate=jnp.zeros((A.shape[0], 8), jnp.float32),
        )
        assert int(rd.iters) == int(r0.iters)
        assert float(jnp.abs(rd.x - r0.x).max()) == 0.0

    def test_exact_eigenvector_basis_removes_cluster(self):
        """With the small cluster's eigenvectors in the basis, f32
        deflated PCG converges in a handful of iterations where plain
        PCG needs the full cluster-resolution count, and the returned
        solution matches the f64 direct solve at the f32 floor of the
        cluster-amplified problem."""
        A, Q, rng = _cluster_problem()
        n = A.shape[0]
        Aj = jnp.asarray(A, jnp.float32)
        b = jnp.asarray(rng.standard_normal(n), jnp.float32)
        free = jnp.ones((n,), bool)
        mv = lambda v: Aj @ v
        r_plain = solve_cg(mv, b, free, tol=1e-6, maxiter=500)
        W = jnp.concatenate(
            [jnp.asarray(Q[:, :5], jnp.float32), jnp.zeros((n, 3), jnp.float32)],
            axis=1,
        )
        r_defl = solve_cg(mv, b, free, tol=1e-6, maxiter=500, deflate=W)
        assert bool(r_defl.converged)
        assert int(r_defl.iters) < int(r_plain.iters) // 2
        xs = np.linalg.solve(A, np.asarray(b, np.float64))
        err = np.abs(np.asarray(r_defl.x) - xs).max() / np.abs(xs).max()
        assert err < 5e-3  # f32 floor on a kappa ~ 2e4 problem

    def test_constrained_dofs_stay_zero(self):
        """Deflation respects the free-DOF projector: basis columns with
        constrained-DOF content are masked, the solution stays zero on
        constrained DOFs."""
        A, Q, rng = _cluster_problem()
        n = A.shape[0]
        Aj = jnp.asarray(A, jnp.float32)
        b = jnp.asarray(rng.standard_normal(n), jnp.float32)
        free = jnp.ones((n,), bool).at[:10].set(False)
        mv = lambda v: Aj @ v
        W = jnp.asarray(Q[:, :5], jnp.float32)  # NOT masked by caller
        r = solve_cg(mv, b, free, tol=1e-6, maxiter=500, deflate=W)
        assert float(jnp.abs(r.x[:10]).max()) == 0.0
        assert bool(jnp.isfinite(r.x).all())

    def test_harvested_ring_accelerates_repeated_solves(self):
        """Recycling across solves (the Newton-loop pattern): harvesting
        each solve's solution into the ring basis makes later solves
        against the same operator cheaper — the cluster content of
        A⁻¹b accumulates in span(W)."""
        A, _, rng = _cluster_problem()
        n = A.shape[0]
        Aj = jnp.asarray(A, jnp.float32)
        free = jnp.ones((n,), bool)
        mv = lambda v: Aj @ v
        W = jnp.zeros((n, 8), jnp.float32)
        ring = jnp.asarray(0, jnp.int32)
        iters = []
        for i in range(8):
            bi = jnp.asarray(rng.standard_normal(n), jnp.float32)
            r = solve_cg(mv, bi, free, tol=1e-6, maxiter=500, deflate=W)
            assert bool(r.converged)
            xs = np.linalg.solve(A, np.asarray(bi, np.float64))
            err = np.abs(np.asarray(r.x) - xs).max() / np.abs(xs).max()
            assert err < 5e-3
            # x always; the final preconditioned residual only when the
            # solve capped (the newton_solve gating) — here: never
            W, ring = deflation_harvest(
                W, ring, [r.x, r.z], gates=[None, ~r.converged]
            )
            iters.append(int(r.iters))
        # once the ring spans the 5-dim cluster the count drops hard
        assert min(iters[5:]) <= iters[0] // 2, iters

    def test_harvest_discards_dependent_and_respects_gate(self):
        """A candidate already in span(W) must not consume a slot; a
        False gate skips the insert entirely."""
        n = 50
        rng = np.random.default_rng(1)
        v = jnp.asarray(rng.standard_normal(n), jnp.float32)
        W = jnp.zeros((n, 4), jnp.float32)
        ring = jnp.asarray(0, jnp.int32)
        W, ring = deflation_harvest(W, ring, [v])
        assert int(ring) == 1
        np.testing.assert_allclose(
            float(jnp.linalg.norm(W[:, 0])), 1.0, rtol=1e-5
        )
        # same vector again: dependent, discarded
        W2, ring2 = deflation_harvest(W, ring, [2.0 * v])
        assert int(ring2) == 1
        assert float(jnp.abs(W2 - W).max()) == 0.0
        # gated off: untouched even though independent
        u = jnp.asarray(rng.standard_normal(n), jnp.float32)
        W3, ring3 = deflation_harvest(
            W, ring, [u], gates=[jnp.asarray(False)]
        )
        assert int(ring3) == 1
        assert float(jnp.abs(W3 - W).max()) == 0.0

    def test_result_carries_final_vectors(self):
        """CGResult.r / .z are the unscaled final residual and
        preconditioned residual (the harvest inputs)."""
        A, _, rng = _cluster_problem(n=80, k_small=2, lam_small=1e-2)
        Aj = jnp.asarray(A, jnp.float32)
        b = jnp.asarray(100.0 * rng.standard_normal(80), jnp.float32)
        free = jnp.ones((80,), bool)
        r = solve_cg(lambda v: Aj @ v, b, free, tol=1e-5, maxiter=500)
        assert isinstance(r, CGResult) and r.r is not None
        # the recurrence residual agrees with the true residual only to
        # the f32 recurrence-drift floor; the harvest needs magnitude
        # and direction at that level, nothing tighter
        got_r = np.asarray(r.r, np.float64)
        bmax = float(np.abs(np.asarray(b)).max())
        assert got_r.shape == (80,)
        assert np.abs(got_r).max() < 1e-3 * bmax  # converged-scale
        assert np.asarray(r.z).shape == (80,)
