"""Drucker-Prager return map tests.

Differential tests against the reference implementation (loaded read-only
from /root/reference with numba stubbed) plus standalone invariants so the
suite still guards correctness when the reference is absent.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from fem_elastoplasticity_tpu.models.materials import (
    DEV4,
    IOTA4,
    drucker_prager_fit,
    drucker_prager_return_map,
    elastic_tangent,
    lame_moduli,
)

G, K = lame_moduli(60000.0, 0.2)
ETA, C = drucker_prager_fit(18.7, 49 * np.pi / 180)


def _sample(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    e3 = rng.normal(0, 2e-3, (n, 3))
    ep = rng.normal(0, 2e-4, (n, 4))
    e0 = rng.normal(0, 1e-3, (4,))
    return e3, ep, e0


@pytest.fixture(scope="module")
def reference_module(reference_dir):
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.njit = lambda f=None, **k: f
        sys.modules["numba"] = numba
    import matplotlib

    matplotlib.use("Agg")
    spec = importlib.util.spec_from_file_location(
        "refT_materials", str(reference_dir / "tsx-tunnel" / "pythonFEM.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestDifferentialVsReference:
    def test_stress_tangent_branches(self, reference_module):
        e3, ep, e0 = _sample()
        n = len(e3)
        ref = reference_module.construct_constitutive_problem(
            e3.T.copy(),
            e0.reshape(-1, 1).copy(),
            ep.T.copy(),
            G * np.ones(n),
            K * np.ones(n),
            ETA * np.ones(n),
            C * np.ones(n),
            apply_plastic_strain=True,
        )
        mine = drucker_prager_return_map(
            jnp.asarray(e3), jnp.asarray(ep), G, K, ETA, C,
            e0=jnp.asarray(e0), apply_plastic_strain=True,
        )
        assert np.array_equal(np.asarray(mine.ind_p), ref["ind_p"])
        s_ref = ref["s"].T
        assert np.abs(np.asarray(mine.s) - s_ref).max() < 1e-10 * np.abs(s_ref).max()
        ds_ref = ref["ds"].T.reshape(n, 3, 3)
        assert np.abs(np.asarray(mine.ds) - ds_ref).max() < 1e-10 * np.abs(ds_ref).max()
        # all three branches must actually occur in the sample
        apex = ref["ind_p"] & (np.abs(ds_ref).max(axis=(1, 2)) == 0)
        smooth = ref["ind_p"] & ~apex
        assert apex.sum() > 100 and smooth.sum() > 100 and (~ref["ind_p"]).sum() > 100

    def test_plastic_strain_smooth_and_elastic(self, reference_module):
        e3, ep, e0 = _sample(seed=1)
        n = len(e3)
        ref = reference_module.construct_constitutive_problem(
            e3.T.copy(), e0.reshape(-1, 1).copy(), ep.T.copy(),
            G * np.ones(n), K * np.ones(n), ETA * np.ones(n), C * np.ones(n),
            apply_plastic_strain=True,
        )
        mine = drucker_prager_return_map(
            jnp.asarray(e3), jnp.asarray(ep), G, K, ETA, C,
            e0=jnp.asarray(e0), apply_plastic_strain=True,
        )
        ds_ref = ref["ds"].T.reshape(n, 3, 3)
        apex = ref["ind_p"] & (np.abs(ds_ref).max(axis=(1, 2)) == 0)
        # reference apex-ep uses trial strain (defect #2, SURVEY.md §2.3);
        # compare only smooth/elastic points, and check our fixed apex value.
        d = np.abs(np.asarray(mine.ep) - ref["ep"].T)[~apex]
        assert d.max() < 1e-12
        e4 = np.concatenate([e3, np.zeros((n, 1))], 1) + e0
        expect_apex = e4[apex] - (C / (3 * K * ETA)) * IOTA4
        assert np.abs(np.asarray(mine.ep)[apex] - expect_apex).max() < 1e-12


class TestInvariants:
    def test_elastic_consistency(self):
        """Pure elastic states: s = D e and ds == elastic tangent."""
        e3, _, _ = _sample(64, seed=2)
        e3 *= 1e-6  # tiny strains stay inside the yield surface
        res = drucker_prager_return_map(
            jnp.asarray(e3), jnp.zeros((64, 4)), G, K, ETA, C
        )
        assert not bool(res.ind_p.any())
        D = np.asarray(elastic_tangent(G, K))
        np.testing.assert_allclose(np.asarray(res.s)[:, :3], e3 @ D.T, rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(res.ds), np.broadcast_to(D, (64, 3, 3)), rtol=1e-12
        )

    def test_yield_consistency_after_return(self):
        """Returned stress lies on the yield surface for plastic points."""
        e3, ep, e0 = _sample(seed=3)
        res = drucker_prager_return_map(
            jnp.asarray(e3), jnp.asarray(ep), G, K, ETA, C,
            e0=jnp.asarray(e0),
        )
        s = np.asarray(res.s)
        ind_p = np.asarray(res.ind_p)
        # rho = sqrt(2 J2) of the 4-component stress; p = tr(s)/3
        p = (s[:, 0] + s[:, 1] + s[:, 3]) / 3.0
        dev = s - p[:, None] * IOTA4
        rho = np.sqrt(dev[:, 0] ** 2 + dev[:, 1] ** 2 + 2 * dev[:, 2] ** 2 + dev[:, 3] ** 2)
        # yield function of the return map: f = rho/sqrt(2) + eta*p - c with
        # p = tr(s)/3 (since p_tr = K iota.E = tr(S)/3)
        f = rho / np.sqrt(2.0) + ETA * p - C
        assert np.abs(f[ind_p]).max() < 1e-8
        assert (f[~ind_p] <= 1e-10).all()

    def test_tangent_symmetry(self):
        e3, ep, e0 = _sample(seed=4)
        res = drucker_prager_return_map(
            jnp.asarray(e3), jnp.asarray(ep), G, K, ETA, C, e0=jnp.asarray(e0)
        )
        ds = np.asarray(res.ds)
        assert np.abs(ds - ds.transpose(0, 2, 1)).max() < 1e-9

    def test_tangent_is_derivative_of_stress(self):
        """Finite-difference check: ds = d s3 / d e3 away from branch edges."""
        e3, ep, e0 = _sample(200, seed=5)
        res = drucker_prager_return_map(
            jnp.asarray(e3), jnp.asarray(ep), G, K, ETA, C, e0=jnp.asarray(e0)
        )
        h = 1e-7
        fd = np.zeros((200, 3, 3))
        for j in range(3):
            dp = np.zeros(3)
            dp[j] = h
            sp = drucker_prager_return_map(
                jnp.asarray(e3 + dp), jnp.asarray(ep), G, K, ETA, C, e0=jnp.asarray(e0)
            )
            sm = drucker_prager_return_map(
                jnp.asarray(e3 - dp), jnp.asarray(ep), G, K, ETA, C, e0=jnp.asarray(e0)
            )
            fd[:, :, j] = np.asarray(sp.s[:, :3] - sm.s[:, :3]) / (2 * h)
        # only compare points whose branch didn't flip under perturbation
        same = (
            np.asarray(res.ind_p)
            == np.asarray(
                drucker_prager_return_map(
                    jnp.asarray(e3 * (1 + 1e-4)), jnp.asarray(ep), G, K, ETA, C,
                    e0=jnp.asarray(e0),
                ).ind_p
            )
        )
        ds = np.asarray(res.ds)
        rel = np.abs(fd - ds)[same].max() / np.abs(ds).max()
        assert rel < 1e-5
