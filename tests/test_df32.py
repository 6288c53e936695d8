"""Double-float (two-f32) arithmetic tests against f64 references.

These blocks must deliver ~1e-13..1e-14 relative accuracy in pure f32
hardware ops (ROADMAP #1 substrate).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from fem_elastoplasticity_tpu.ops import df32 as d


def _rand(n=4096, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=n) * scale


def _rel(df_val, ref):
    got = np.asarray(d.to_f64(df_val))
    return np.abs(got - ref).max() / np.abs(ref).max()


class TestErrorFreeTransforms:
    def test_two_sum_exact(self):
        a = jnp.asarray(_rand(seed=1), jnp.float32)
        b = jnp.asarray(_rand(seed=2, scale=1e-4), jnp.float32)
        s, e = d.two_sum(a, b)
        exact = a.astype(jnp.float64) + b.astype(jnp.float64)
        np.testing.assert_array_equal(
            np.asarray(s.astype(jnp.float64) + e.astype(jnp.float64)),
            np.asarray(exact),
        )

    def test_two_prod_exact(self):
        a = jnp.asarray(_rand(seed=3), jnp.float32)
        b = jnp.asarray(_rand(seed=4), jnp.float32)
        p, e = d.two_prod(a, b)
        exact = a.astype(jnp.float64) * b.astype(jnp.float64)
        np.testing.assert_array_equal(
            np.asarray(p.astype(jnp.float64) + e.astype(jnp.float64)),
            np.asarray(exact),
        )


class TestDoubleFloatOps:
    def test_lift_f64_roundtrip(self):
        x = _rand(seed=5)
        df_x = d.df(jnp.asarray(x))
        assert np.abs(np.asarray(d.to_f64(df_x)) - x).max() < 1e-14 * np.abs(x).max()

    @pytest.mark.parametrize("op,npop", [
        (d.df_add, np.add), (d.df_sub, np.subtract), (d.df_mul, np.multiply),
        (d.df_div, np.divide),
    ])
    def test_binary_ops(self, op, npop):
        x, y = _rand(seed=6), np.abs(_rand(seed=7)) + 0.5
        r = op(d.df(jnp.asarray(x)), d.df(jnp.asarray(y)))
        ref = npop(x, y)
        assert _rel(r, ref) < 5e-14

    def test_sqrt(self):
        x = np.abs(_rand(seed=8)) + 1e-6
        r = d.df_sqrt(d.df(jnp.asarray(x)))
        assert _rel(r, np.sqrt(x)) < 5e-14

    def test_sqrt_of_zero(self):
        r = d.df_sqrt(d.df(jnp.zeros(8)))
        assert np.asarray(d.to_f64(r)).max() == 0.0

    def test_compensated_dot(self):
        """Accumulating 4096 products stays at ~1e-13 (plain f32: ~1e-5)."""
        x, y = _rand(seed=9), _rand(seed=10)
        acc = d.df(jnp.zeros(1))
        xs = d.df(jnp.asarray(x))
        ys = d.df(jnp.asarray(y))
        prod = d.df_mul(xs, ys)
        # tree-free sequential fold in chunks to keep test quick
        total = d.DF(prod.hi.reshape(64, 64), prod.lo.reshape(64, 64))
        acc = d.DF(jnp.zeros(64, jnp.float32), jnp.zeros(64, jnp.float32))
        for i in range(64):
            acc = d.df_add(acc, d.DF(total.hi[i], total.lo[i]))
        final = d.DF(jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
        for i in range(64):
            final = d.df_add(final, d.DF(acc.hi[i], acc.lo[i]))
        ref = float(np.sum(x.astype(np.float64) * y.astype(np.float64)))
        got = float(d.to_f64(final))
        assert abs(got - ref) / abs(ref) < 1e-11
        f32_naive = float(np.sum(x.astype(np.float32) * y.astype(np.float32)))
        assert abs(got - ref) < abs(f32_naive - ref)

    def test_return_map_critical_expression(self):
        """The trial-stress expression at df32 precision: ~1e-13 vs f64
        (the plain f32 version sits at ~1e-7)."""
        e = _rand(seed=11, scale=1e-3)
        ep = _rand(seed=12, scale=1e-4)
        G, K = 25000.0, 33333.333333333336
        et64 = e - ep
        s64 = 2 * G * (et64 - et64 / 3) + K * et64
        et = d.df_sub(d.df(jnp.asarray(e)), d.df(jnp.asarray(ep)))
        term = d.df_sub(et, d.df_scale(et, 1.0 / 3.0))
        s = d.df_add(d.df_scale(term, 2 * G), d.df_scale(et, K))
        assert _rel(s, s64) < 1e-12


class TestJitPipelineExactness:
    """Guard against compiler rewrites destroying the error-free transforms.

    Measured hazards (df32.py docstring): XLA:CPU's MLIR fusion emitters
    miscompile large fused EFT chains (disabled via XLA_FLAGS at package
    import), and rewrites across df stage boundaries lose compensation
    unless the state is pinned with a runtime-zeros argument (`df_pin`).
    This test runs the full strain -> return map -> internal force residual
    pipeline under ONE jit at a converged state and asserts the df32 floor.
    """

    def test_residual_floor_under_jit(self):
        import jax

        from fem_elastoplasticity_tpu.models.config import TsxTunnelConfig
        from fem_elastoplasticity_tpu.models.materials import (
            drucker_prager_fit,
            lame_moduli,
        )
        from fem_elastoplasticity_tpu.models import materials_df as mdf
        from fem_elastoplasticity_tpu.models.tsx_tunnel import (
            initial_state,
            solve,
            tsx_mesh,
        )
        from fem_elastoplasticity_tpu.ops import assembly as asm
        from fem_elastoplasticity_tpu.ops import assembly_df as adf
        from fem_elastoplasticity_tpu.ops.elements import volume_element

        cfg = TsxTunnelConfig()
        r = solve(cfg)  # f64 converged state at zeta = 1
        mesh = tsx_mesh(cfg.etype)
        ref = volume_element(cfg.etype)
        shear, bulk = lame_moduli(cfg.young, cfg.poisson)
        eta, c = drucker_prager_fit(cfg.cohesion, cfg.friction_angle)
        _, e0 = initial_state(cfg)
        gdf = adf.geometry_df(mesh.coords, mesh.elems, ref)
        fmap_np, n_free = asm.free_dof_map(mesh.free)
        free_idx = jnp.asarray(np.nonzero(mesh.free.reshape(-1))[0])
        e0_hi, e0_lo = adf.split_f64_np(e0)

        def residual(u, ep, e0z, pinz):
            u = d.df_pin(u, pinz)
            ep = d.df_pin(ep, pinz)
            e = adf.strains_df(gdf, u)
            s, _, _, _, _ = mdf.dp_return_map_lanes_df(
                e, ep, shear, bulk, eta, c, e0=e0z
            )
            f = adf.internal_force_df(gdf, d.DF(s.hi[:3], s.lo[:3]))
            return jnp.abs(f.hi[free_idx]).max()

        u_df = d.df(jnp.asarray(np.asarray(r.u).reshape(-1)))
        ep_df = d.df(jnp.asarray(np.asarray(r.ep)))
        e0z = d.df_mul(
            d.DF(jnp.asarray(e0_hi), jnp.asarray(e0_lo)), d.df_const(1.0)
        )
        pinz = jnp.zeros((4 * gdf.hi.n_int,), jnp.float32)

        r_eager = float(residual(u_df, ep_df, e0z, pinz))
        r_jit = float(jax.jit(residual)(u_df, ep_df, e0z, pinz))
        # converged f64 state: the df32 residual must sit at its ~1e-12
        # floor (plain f32 gives ~1e-6); jit must match eager
        assert r_eager < 5e-12
        assert r_jit < 5e-12
