"""Fused Pallas return-map kernel tests (interpreter mode on CPU)."""
import numpy as np


import jax.numpy as jnp

from fem_elastoplasticity_tpu.models.materials import (
    dp_return_map_lanes,
    drucker_prager_fit,
    lame_moduli,
)
from fem_elastoplasticity_tpu.ops.return_map_pallas import (
    dp_return_map_pallas,
    unpack_tangent,
)

G, K = lame_moduli(60000.0, 0.2)
ETA, C = drucker_prager_fit(18.7, 49 * np.pi / 180)


def _sample(n=1024, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(0, 2e-3, (3, n))),
        jnp.asarray(rng.normal(0, 2e-4, (4, n))),
        jnp.asarray(rng.normal(0, 1e-3, 4)),
    )


class TestKernelVsLanes:
    def test_f64_exact(self):
        e3, ep, e0 = _sample()
        s_p, ds6, lam_p, ep_p = dp_return_map_pallas(
            e3, ep, G, K, ETA, C, e0=e0, apply_plastic_strain=True
        )
        s_l, ds_l, ind_l, lam_l, ep_l = dp_return_map_lanes(
            e3, ep, G, K, ETA, C, e0=e0, apply_plastic_strain=True
        )
        scale = float(jnp.abs(s_l).max())
        assert float(jnp.abs(s_p - s_l).max()) < 1e-12 * scale
        assert float(jnp.abs(unpack_tangent(ds6) - ds_l).max()) < 1e-9 * float(
            jnp.abs(ds_l).max()
        )
        assert float(jnp.abs(lam_p - lam_l).max()) < 1e-15
        assert float(jnp.abs(ep_p - ep_l).max()) < 1e-15
        # plastic indicator equivalence: lam > 0 <=> plastic
        np.testing.assert_array_equal(np.asarray(lam_p > 0), np.asarray(ind_l))

    def test_f32_accuracy(self):
        e3, ep, e0 = _sample(seed=1)
        s_p, ds6, lam, ep_p = dp_return_map_pallas(
            e3.astype(jnp.float32), ep.astype(jnp.float32), G, K, ETA, C,
            e0=e0.astype(jnp.float32),
        )
        s_l, *_ = dp_return_map_lanes(e3, ep, G, K, ETA, C, e0=e0)
        rel = float(jnp.abs(s_p - s_l.astype(jnp.float32)).max() / jnp.abs(s_l).max())
        assert rel < 1e-5

    def test_all_branches_hit(self):
        e3, ep, e0 = _sample(seed=2)
        _, _, lam, _ = dp_return_map_pallas(e3, ep, G, K, ETA, C, e0=e0)
        _, _, ind_l, _, _ = dp_return_map_lanes(e3, ep, G, K, ETA, C, e0=e0)
        n_p = int(np.asarray(ind_l).sum())
        assert 0 < n_p < e3.shape[1]

    def test_bug_compat_apex_mode(self):
        e3, ep, e0 = _sample(seed=3)
        for flag in (False, True):
            _, _, _, ep_p = dp_return_map_pallas(
                e3, ep, G, K, ETA, C, e0=e0,
                apply_plastic_strain=True, apex_ep_uses_trial=flag,
            )
            _, _, _, _, ep_l = dp_return_map_lanes(
                e3, ep, G, K, ETA, C, e0=e0,
                apply_plastic_strain=True, apex_ep_uses_trial=flag,
            )
            assert float(jnp.abs(ep_p - ep_l).max()) < 1e-15


class TestFastPath:
    def test_tsx_fast_f32_preset(self):
        """Pure-f32 preset (fused Pallas kernel), tolerances at the f32
        criterion floor; the df32 preset is covered in test_tsx_tunnel."""
        from fem_elastoplasticity_tpu.models.config import TsxTunnelConfig
        from fem_elastoplasticity_tpu.models.tsx_tunnel import solve

        r = solve(TsxTunnelConfig.fast_f32())
        assert r.n_steps == 17
        anchor = -1.979450e-03
        assert abs(float(r.u[40, 0]) - anchor) / abs(anchor) < 1e-5
