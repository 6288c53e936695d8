"""Constitutive models: plane-strain isotropic elasticity and
elastic-perfectly-plastic Drucker-Prager with associated flow.

TPU-native design: the return mapping is fully branchless (`jnp.where` over
the elastic / smooth-return / apex-return partitions), so one fused
elementwise kernel handles every integration point — no boolean gather /
scatter as in the reference (`tsx-tunnel/pythonFEM.py:990-1157`).  A Pallas
variant of the same math lives in `ops/return_map_pallas.py`.

State conventions (parity with the reference, SURVEY.md §2.3):
  * 2D strain arrives in 3-component Voigt form [e11, e22, 2*e12] (from B),
  * stress / plastic strain carry the plane-strain 4th component
    [s11, s22, s12, s33] with projectors iota=[1,1,0,1],
    VOL4 = outer(iota, iota), DEV4 = diag(1,1,1/2,1) - VOL4/3,
  * the consistent tangent is returned as (..., 3, 3) acting on the
    3-component strain.

Two reference defects are fixed here (documented in SURVEY.md §2.3):
  1. `lambda` at apex points is the scalar (eta*p_tr - c)/denom_a; the
     reference computes an outer product with wrong precedence
     (`tsx-tunnel/pythonFEM.py:1114`) and crashes into a silent None.
  2. the apex plastic-strain update uses the *total* strain E4, where the
     reference accidentally uses the trial strain because `E_tr -= ep_prev`
     aliases E4 in place (`tsx-tunnel/pythonFEM.py:1054-1057`).
     `apex_ep_uses_trial=True` restores bug-compatibility if ever needed.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

SQRT2 = float(np.sqrt(2.0))

IOTA4 = np.array([1.0, 1.0, 0.0, 1.0])
VOL4 = np.outer(IOTA4, IOTA4)
DEV4 = np.diag([1.0, 1.0, 0.5, 1.0]) - VOL4 / 3.0
IOTA3 = np.array([1.0, 1.0, 0.0])
VOL3 = VOL4[:3, :3]
DEV3 = DEV4[:3, :3]
# engineering-shear doubling pattern for plastic strain updates
EPS_SCALE = np.array([1.0, 1.0, 2.0, 1.0])


def lame_moduli(young: float, poisson: float):
    """(shear G, bulk K) from (E, nu) — `tsx-tunnel/pythonFEM.py:1665-1666`."""
    shear = young / (2.0 * (1.0 + poisson))
    bulk = young / (3.0 * (1.0 - 2.0 * poisson))
    return shear, bulk


def drucker_prager_fit(cohesion: float, friction_angle: float):
    """Plane-strain DP fit to Mohr-Coulomb: (eta, c).

    `tsx-tunnel/pythonFEM.py:1671-1672`.
    """
    t = np.tan(friction_angle)
    den = np.sqrt(9.0 + 12.0 * t * t)
    return 3.0 * t / den, 3.0 * cohesion / den


def elastic_tangent(shear, bulk, dtype=jnp.float64):
    """Plane-strain elastic 3x3 tangent: 2G*DEV3 + K*VOL3."""
    return 2.0 * shear * jnp.asarray(DEV3, dtype) + bulk * jnp.asarray(VOL3, dtype)


class ReturnMapResult(NamedTuple):
    """Per-integration-point constitutive outputs.

    s:      (n, 4) stress
    ds:     (n, 3, 3) consistent tangent on the 2D Voigt strain
    ind_p:  (n,) bool, plastic points (smooth or apex)
    lam:    (n,) plastic multiplier
    ep:     (n, 4) updated plastic strain (equals ep_prev unless
            `apply_plastic_strain=True` was requested)
    """

    s: jnp.ndarray
    ds: jnp.ndarray
    ind_p: jnp.ndarray
    lam: jnp.ndarray
    ep: jnp.ndarray


def drucker_prager_return_map(
    e3: jnp.ndarray,
    ep_prev: jnp.ndarray,
    shear,
    bulk,
    eta,
    c,
    e0: Optional[jnp.ndarray] = None,
    apply_plastic_strain: bool = False,
    apex_ep_uses_trial: bool = False,
) -> ReturnMapResult:
    """Drucker-Prager elastic-predictor / plastic-corrector update.

    Args:
      e3:       (n, 3) total 2D strain [e11, e22, 2e12] at integration points.
      ep_prev:  (n, 4) plastic strain from the previous accepted step.
      shear, bulk, eta, c: scalars or (n,) material fields.
      e0:       optional (4,) or (n, 4) initial strain added to the
                plane-strain extension (tsx excavation loading).
      apply_plastic_strain: update `ep` (done once per accepted load step).
      apex_ep_uses_trial: reproduce reference defect #2 (see module docs).

    Math per SURVEY.md §2.3; vectorized and branch-free.
    """
    dtype = e3.dtype
    n = e3.shape[0]
    iota = jnp.asarray(IOTA4, dtype)
    dev4 = jnp.asarray(DEV4, dtype)

    shear = jnp.broadcast_to(jnp.asarray(shear, dtype), (n,))
    bulk = jnp.broadcast_to(jnp.asarray(bulk, dtype), (n,))
    eta = jnp.broadcast_to(jnp.asarray(eta, dtype), (n,))
    c = jnp.broadcast_to(jnp.asarray(c, dtype), (n,))

    e4 = jnp.concatenate([e3, jnp.zeros((n, 1), dtype)], axis=1)
    if e0 is not None:
        e4 = e4 + jnp.asarray(e0, dtype)

    e_tr = e4 - ep_prev
    dev_e = e_tr @ dev4.T
    tr_e = e_tr @ iota
    s_tr = 2.0 * shear[:, None] * dev_e + (bulk * tr_e)[:, None] * iota

    norm_sq = jnp.maximum(jnp.einsum("ni,ni->n", e_tr, dev_e), 0.0)
    norm_e = jnp.sqrt(norm_sq)
    rho_tr = 2.0 * shear * norm_e
    p_tr = bulk * tr_e

    denom_a = bulk * eta * eta
    denom_s = shear + denom_a
    crit1 = rho_tr / SQRT2 + eta * p_tr - c
    crit2 = eta * p_tr - denom_a * rho_tr / (shear * SQRT2) - c

    ind_p = crit1 > 0.0
    ind_s = ind_p & (crit2 <= 0.0)
    ind_a = ind_p & (crit2 > 0.0)

    lam_s = crit1 / denom_s
    lam_a = (eta * p_tr - c) / denom_a  # reference defect #1 fixed
    lam = jnp.where(ind_s, lam_s, jnp.where(ind_a, lam_a, 0.0))

    safe_norm = jnp.where(norm_e > 0.0, norm_e, 1.0)
    n_hat = dev_e / safe_norm[:, None]
    m_hat = SQRT2 * shear[:, None] * n_hat + (bulk * eta)[:, None] * iota

    s_smooth = s_tr - lam_s[:, None] * m_hat
    s_apex = (c / eta)[:, None] * iota
    s = jnp.where(ind_s[:, None], s_smooth, jnp.where(ind_a[:, None], s_apex, s_tr))

    # consistent tangent (3x3 blocks)
    ds_el = 2.0 * shear[:, None, None] * jnp.asarray(DEV3, dtype) + bulk[
        :, None, None
    ] * jnp.asarray(VOL3, dtype)
    n3 = n_hat[:, :3]
    m3 = m_hat[:, :3]
    nn = n3[:, :, None] * n3[:, None, :]
    mm = m3[:, :, None] * m3[:, None, :]
    safe_rho = jnp.where(rho_tr > 0.0, rho_tr, 1.0)
    coef = 2.0 * SQRT2 * shear * shear * lam_s / safe_rho
    ds_smooth = (
        ds_el
        - coef[:, None, None] * (jnp.asarray(DEV3, dtype) - nn)
        - mm / denom_s[:, None, None]
    )
    ds = jnp.where(
        ind_s[:, None, None],
        ds_smooth,
        jnp.where(ind_a[:, None, None], jnp.zeros_like(ds_el), ds_el),
    )

    if apply_plastic_strain:
        scale = jnp.asarray(EPS_SCALE, dtype)
        flow = n_hat / SQRT2 + (eta / 3.0)[:, None] * iota
        ep_smooth = ep_prev + lam_s[:, None] * scale * flow
        apex_base = e_tr if apex_ep_uses_trial else e4
        ep_apex = apex_base - (c / (3.0 * bulk * eta))[:, None] * iota
        ep = jnp.where(
            ind_s[:, None], ep_smooth, jnp.where(ind_a[:, None], ep_apex, ep_prev)
        )
    else:
        ep = ep_prev

    return ReturnMapResult(s=s, ds=ds, ind_p=ind_p, lam=lam, ep=ep)
