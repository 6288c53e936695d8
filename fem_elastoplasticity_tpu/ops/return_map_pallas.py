"""Fused Drucker-Prager return-map Pallas kernel (TPU fast path).

One `pallas_call` computes — per integration point, fully in VMEM —
trial state, yield/branch criteria, stress return, consistent tangent and
(optionally) the plastic-strain update: the entire constitutive update of
`models.materials.dp_return_map_lanes` as a single fused VPU kernel
instead of ~100 XLA elementwise ops.  This is the kernel the BASELINE
north-star names ("the Drucker-Prager return mapping and consistent
tangent become a fused per-quadrature-point Pallas kernel").

Precision: TPU Pallas (Mosaic) supports f32, not the emulated f64, so
this kernel is the opt-in fast path (`dtype="float32"` configs, ~1e-6
accuracy); the f64 parity path stays on the XLA lanes implementation.
On CPU the kernel runs in interpreter mode, so the tests exercise the
same code path everywhere.

Layout: lane-major structure-of-arrays, (components, n) with n padded to
the 128-lane tile, blocked over n.  Material parameters are compile-time
scalars; the zeta-scaled initial strain enters via scalar prefetch.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SQRT2 = float(np.sqrt(2.0))


def _kernel(shear, bulk, apply_ep, apex_trial,
            p_ref, e3_ref, ep_ref, s_ref, ds_ref, lam_ref, epo_ref):
    """Fused constitutive update on one (rows, TILE) block.

    p_ref: (1, 8) runtime scalars [e0_0..e0_3, eta, c, 0, 0] — eta/c are
    runtime inputs so material-ensemble `vmap` can batch over them."""
    e0_0 = p_ref[0, 0]
    e0_1 = p_ref[0, 1]
    e0_2 = p_ref[0, 2]
    e0_3 = p_ref[0, 3]
    eta = p_ref[0, 4]
    c = p_ref[0, 5]

    e4_0 = e3_ref[0, :] + e0_0
    e4_1 = e3_ref[1, :] + e0_1
    e4_2 = e3_ref[2, :] + e0_2
    e4_3 = e0_3 + jnp.zeros_like(e4_0)

    et0 = e4_0 - ep_ref[0, :]
    et1 = e4_1 - ep_ref[1, :]
    et2 = e4_2 - ep_ref[2, :]
    et3 = e4_3 - ep_ref[3, :]

    tr = et0 + et1 + et3
    dev0 = et0 - tr / 3.0
    dev1 = et1 - tr / 3.0
    dev2 = et2 / 2.0
    dev3 = et3 - tr / 3.0

    two_g = 2.0 * shear
    ktr = bulk * tr
    st0 = two_g * dev0 + ktr
    st1 = two_g * dev1 + ktr
    st2 = two_g * dev2
    st3 = two_g * dev3 + ktr

    norm_sq = jnp.maximum(et0 * dev0 + et1 * dev1 + et2 * dev2 + et3 * dev3, 0.0)
    norm_e = jnp.sqrt(norm_sq)
    rho_tr = two_g * norm_e
    p_tr = bulk * tr

    denom_a = bulk * eta * eta
    denom_s = shear + denom_a
    crit1 = rho_tr / SQRT2 + eta * p_tr - c
    crit2 = eta * p_tr - denom_a * rho_tr / (shear * SQRT2) - c

    ind_p = crit1 > 0.0
    ind_s = ind_p & (crit2 <= 0.0)
    ind_a = ind_p & (crit2 > 0.0)

    lam_s = crit1 / denom_s
    lam_a = (eta * p_tr - c) / denom_a
    lam = jnp.where(ind_s, lam_s, jnp.where(ind_a, lam_a, 0.0))
    lam_ref[0, :] = lam

    inv_norm = jnp.where(norm_e > 0.0, 1.0 / jnp.where(norm_e > 0.0, norm_e, 1.0), 0.0)
    n0 = dev0 * inv_norm
    n1 = dev1 * inv_norm
    n2 = dev2 * inv_norm
    n3 = dev3 * inv_norm

    sg = SQRT2 * shear
    ke_ = bulk * eta
    m0 = sg * n0 + ke_
    m1 = sg * n1 + ke_
    m2 = sg * n2
    m3 = sg * n3 + ke_

    apex = c / eta
    zero = jnp.zeros_like(st0)
    s_ref[0, :] = jnp.where(ind_s, st0 - lam_s * m0, jnp.where(ind_a, apex + zero, st0))
    s_ref[1, :] = jnp.where(ind_s, st1 - lam_s * m1, jnp.where(ind_a, apex + zero, st1))
    s_ref[2, :] = jnp.where(ind_s, st2 - lam_s * m2, jnp.where(ind_a, zero, st2))
    s_ref[3, :] = jnp.where(ind_s, st3 - lam_s * m3, jnp.where(ind_a, apex + zero, st3))

    safe_rho = jnp.where(rho_tr > 0.0, rho_tr, 1.0)
    ca = jnp.where(ind_s, 2.0 * SQRT2 * shear * shear * lam_s / safe_rho, 0.0)
    ms = jnp.where(ind_s, 1.0 / denom_s, 0.0)
    e_diag = 4.0 * shear / 3.0 + bulk
    e_off = -2.0 * shear / 3.0 + bulk
    not_a = jnp.where(ind_a, 0.0, 1.0)
    # unique symmetric tangent entries [d00, d11, d22, d01, d02, d12]
    ds_ref[0, :] = (e_diag - ca * (2.0 / 3.0 - n0 * n0) - m0 * m0 * ms) * not_a
    ds_ref[1, :] = (e_diag - ca * (2.0 / 3.0 - n1 * n1) - m1 * m1 * ms) * not_a
    ds_ref[2, :] = (shear - ca * (0.5 - n2 * n2) - m2 * m2 * ms) * not_a
    ds_ref[3, :] = (e_off - ca * (-1.0 / 3.0 - n0 * n1) - m0 * m1 * ms) * not_a
    ds_ref[4, :] = (ca * n0 * n2 - m0 * m2 * ms) * not_a
    ds_ref[5, :] = (ca * n1 * n2 - m1 * m2 * ms) * not_a

    if apply_ep:
        f0 = n0 / SQRT2 + eta / 3.0
        f1 = n1 / SQRT2 + eta / 3.0
        f2 = 2.0 * (n2 / SQRT2)
        f3 = n3 / SQRT2 + eta / 3.0
        ab0 = et0 if apex_trial else e4_0
        ab1 = et1 if apex_trial else e4_1
        ab2 = et2 if apex_trial else e4_2
        ab3 = et3 if apex_trial else e4_3
        shift = c / (3.0 * bulk * eta)
        epo_ref[0, :] = jnp.where(ind_s, ep_ref[0, :] + lam_s * f0,
                                  jnp.where(ind_a, ab0 - shift, ep_ref[0, :]))
        epo_ref[1, :] = jnp.where(ind_s, ep_ref[1, :] + lam_s * f1,
                                  jnp.where(ind_a, ab1 - shift, ep_ref[1, :]))
        epo_ref[2, :] = jnp.where(ind_s, ep_ref[2, :] + lam_s * f2,
                                  jnp.where(ind_a, ab2, ep_ref[2, :]))
        epo_ref[3, :] = jnp.where(ind_s, ep_ref[3, :] + lam_s * f3,
                                  jnp.where(ind_a, ab3 - shift, ep_ref[3, :]))
    else:
        epo_ref[0, :] = ep_ref[0, :]
        epo_ref[1, :] = ep_ref[1, :]
        epo_ref[2, :] = ep_ref[2, :]
        epo_ref[3, :] = ep_ref[3, :]


def unpack_tangent(ds6: jnp.ndarray) -> jnp.ndarray:
    """(6, n) unique entries -> (3, 3, n) symmetric tangent."""
    d00, d11, d22, d01, d02, d12 = ds6
    return jnp.stack(
        [
            jnp.stack([d00, d01, d02], axis=0),
            jnp.stack([d01, d11, d12], axis=0),
            jnp.stack([d02, d12, d22], axis=0),
        ],
        axis=0,
    )


def dp_return_map_pallas(
    e3: jnp.ndarray,
    ep_prev: jnp.ndarray,
    shear: float,
    bulk: float,
    eta: float,
    c: float,
    e0: Optional[jnp.ndarray] = None,
    apply_plastic_strain: bool = False,
    apex_ep_uses_trial: bool = False,
    tile: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused constitutive update.

    Args:
      e3: (3, n) strain, n a multiple of 128 (lane padding).
      ep_prev: (4, n) plastic strain.
      shear/bulk/eta/c: compile-time material scalars.
      e0: (4,) initial strain (already zeta-scaled), or None.

    Returns (s (4, n), ds6 (6, n), lam (n,), ep (4, n)).
    """
    from jax.experimental import pallas as pl

    n = e3.shape[1]
    dtype = e3.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t = min(tile, n)
    while n % t != 0:
        t //= 2
    grid = (n // t,)

    e0_arr = (
        jnp.zeros((4,), dtype) if e0 is None else jnp.asarray(e0, dtype).reshape(4)
    )
    params = jnp.concatenate(
        [
            e0_arr,
            jnp.asarray(eta, dtype).reshape(1),
            jnp.asarray(c, dtype).reshape(1),
            jnp.zeros((2,), dtype),
        ]
    ).reshape(1, 8)

    kern = functools.partial(
        _kernel,
        float(shear), float(bulk),
        apply_plastic_strain, apex_ep_uses_trial,
    )
    row = lambda r: pl.BlockSpec((r, t), lambda i: (0, i))

    def call(e0_arr, e3, ep_prev):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 8), lambda i: (0, 0)),
                row(3),
                row(4),
            ],
            out_specs=(row(4), row(6), row(1), row(4)),
            out_shape=(
                jax.ShapeDtypeStruct((4, n), dtype),
                jax.ShapeDtypeStruct((6, n), dtype),
                jax.ShapeDtypeStruct((1, n), dtype),
                jax.ShapeDtypeStruct((4, n), dtype),
            ),
            interpret=interpret,
        )(e0_arr, e3, ep_prev)

    e0_arr = params
    if dtype == jnp.float32 and not interpret:
        # Mosaic has no 64-bit vector support; with jax_enable_x64 active,
        # weakly-typed Python scalars inside the kernel otherwise trace as
        # f64 and crash layout inference.
        with jax.enable_x64(False):
            s, ds6, lam2, ep = call(e0_arr, e3, ep_prev)
    else:
        s, ds6, lam2, ep = call(e0_arr, e3, ep_prev)
    return s, ds6, lam2[0], ep
