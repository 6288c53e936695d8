"""Benchmark: full TSX-tunnel Drucker-Prager Newton solve on TPU.

North-star metric (BASELINE.json): wall-clock of the complete load-stepped
Newton solve on the tsx-tunnel P1 mesh.  Baseline: the unmodified
NumPy/SciPy reference takes 1.36 s on the container CPU (BASELINE.md,
measured); `vs_baseline` is the speedup over that.

Prints exactly one JSON line.  Correctness is asserted against the
behavioral anchors before timing (a fast wrong answer doesn't count).

All arrays cross the jit boundary as arguments (never closure constants —
the axon TPU runtime degrades ~300x after executing a program with
embedded array constants; see ops/assembly.py).
"""
from __future__ import annotations

import json
import sys
import time

BASELINE_WALL_S = 1.36  # reference tsx P1 solve, container CPU (BASELINE.md)
ANCHOR_U40 = -1.979450e-03


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import fem_elastoplasticity_tpu  # noqa: F401  (enables x64)
    from fem_elastoplasticity_tpu.models.config import TsxTunnelConfig
    from fem_elastoplasticity_tpu.models import tsx_tunnel as tsx
    from fem_elastoplasticity_tpu.models.materials import (
        drucker_prager_fit,
        elastic_tangent_lanes,
        lame_moduli,
    )
    from fem_elastoplasticity_tpu.ops import assembly as asm
    from fem_elastoplasticity_tpu.ops.elements import tables, volume_element
    from fem_elastoplasticity_tpu.solve.newton import (
        NewtonSettings,
        build_load_stepper,
    )

    # f32 fast path: fused Pallas constitutive kernel + f32 Cholesky.
    # Wall displacement is gated below at 1e-6 relative vs the reference
    # anchor (measured: 1.2e-7); the f64 parity path (4.4x) is exercised by
    # the test suite.
    cfg = TsxTunnelConfig.fast()
    mesh = tsx.tsx_mesh(cfg.etype)
    shear, bulk = lame_moduli(cfg.young, cfg.poisson)
    eta, c = drucker_prager_fit(cfg.cohesion, cfg.friction_angle)
    s0, e0 = tsx.initial_state(cfg)

    ref = volume_element(cfg.etype)
    fmap_np, n_free = asm.free_dof_map(mesh.free)
    n_nodes = mesh.n_nodes

    settings = NewtonSettings(
        maxit=cfg.newton_maxit,
        newton_tol=cfg.newton_tol,
        accept_tol=cfg.accept_tol,
        d_zeta_min=cfg.d_zeta * cfg.d_zeta_min_ratio,
        zeta_max=cfg.zeta_max,
        max_steps=cfg.max_steps,
        step0=0,
    )

    dt = jnp.dtype(cfg.dtype)
    tab = tables(ref)
    tab = type(tab)(*[jnp.asarray(x, dt) for x in tab])
    args = dict(
        coords=jnp.asarray(mesh.coords, dt),
        elems=jnp.asarray(mesh.elems),
        tab=tab,
        fmap=jnp.asarray(fmap_np),
        free_idx=jnp.asarray(np.nonzero(mesh.free.reshape(-1))[0]),
        s0=jnp.asarray(s0, dt),
        e0=jnp.asarray(e0, dt),
    )

    @jax.jit
    def full_solve(a):
        geom = asm.compute_geometry(a["coords"], a["elems"], a["tab"])
        dtype = a["coords"].dtype
        s0f = jnp.broadcast_to(a["s0"][:3, None], (3, geom.n_int))
        f0 = asm.internal_force(geom, s0f)
        D = elastic_tangent_lanes(shear, bulk, geom.n_int, dtype)
        ke = asm.element_stiffness(geom, D)
        K_free = asm.assemble_dense_free(ke, geom, a["fmap"], n_free)
        cho = jax.scipy.linalg.cho_factor(K_free)
        u_el = (
            jnp.zeros((2 * n_nodes,), dtype)
            .at[a["free_idx"]]
            .set(jax.scipy.linalg.cho_solve(cho, -f0[a["free_idx"]]))
        )
        from fem_elastoplasticity_tpu.models.tsx_tunnel import _elastic_factor

        stepper = build_load_stepper(
            geom, a["free_idx"], a["fmap"], n_free, shear, bulk, eta, c,
            settings,
            e0_dir=a["e0"],
            monitor=lambda u, s: u[2 * cfg.monitor_node],
            solver=cfg.solver,
            dense_mode=cfg.dense_mode,
            elastic_factor=_elastic_factor(K_free, cho, cfg.dense_mode, dtype),
        )
        return stepper(cfg.d_zeta * u_el, 0.0, cfg.d_zeta)

    # warmup + correctness gate
    res = jax.block_until_ready(full_solve(args))
    u40 = float(res.u[2 * cfg.monitor_node])
    rel_err = abs(u40 - ANCHOR_U40) / abs(ANCHOR_U40)
    assert int(res.n_steps) == 17, f"step count {int(res.n_steps)} != 17"
    assert rel_err < 1e-6, u40

    reps = 5
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(full_solve(args))
        times.append(time.perf_counter() - t0)
    wall = float(np.median(times))

    print(
        json.dumps(
            {
                "metric": "tsx_tunnel_p1_dp_newton_solve_wall",
                "value": wall,
                "unit": "s",
                "vs_baseline": BASELINE_WALL_S / wall,
                "precision": "f32_pallas_fast_path",
                "rel_err_vs_reference": rel_err,
            }
        )
    )


if __name__ == "__main__":
    main()
