"""Minimal repro: nested lax.cond SIGABRTs the 2026-01 libtpu compiler.

Observed 2026-08-18 after the axon tunnel worker picked up a new libtpu
build: compiling the df32 tsx solver began to SIGABRT the remote
tpu_compile_helper deterministically (3/3 retries) with

    F shape_util.cc:1179  Check failed: return_shape->IsTuple()
    Invalid index {1} for shape u32[896]{0}

inside HloReplicationAnalysis (invoked by AllReduceSimplifier).  The same
program had compiled cleanly for two days on the previous terminal build —
this is a compiler regression, not a program bug (the HLO is valid; the
crash is an internal check failure, and `--xla_disable_hlo_passes` /
jit compiler_options do not propagate through the axon remote compile).

Bisect result (this file reproduces it):
  * trigger: a `lax.cond` nested INSIDE another `lax.cond` branch, inside
    (nested) `lax.while_loop`s, in a program whose loop body also runs the
    element-gather geometry pipeline (`ops.assembly.compute_geometry` —
    its n_int-sized gather/iota is where the u32[896] in the check message
    comes from; 887 tsx elements pad to 896 lanes).
  * NOT sufficient alone: top_k, LU solves, scatters, Cholesky, nested
    while loops, optimization barriers, a single-level cond with all of
    the above in its branches — each compiles fine (bisect log in
    BENCH_NOTES.md).
  * workaround (applied in solve/newton.py `newton_solve`): flatten the
    two-level cond into one `lax.switch` over a computed branch index —
    identical semantics, compiles and runs correctly.

Usage (each in a fresh process; a crash kills the remote helper, which
recovers by itself):

    python tools/compiler_nested_cond_repro.py nested   # SIGABRT (bug)
    python tools/compiler_nested_cond_repro.py switch   # OK (workaround)
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main(mode: str) -> None:
    assert mode in ("nested", "switch"), mode
    import jax
    import jax.numpy as jnp
    import numpy as np

    import fem_elastoplasticity_tpu  # noqa: F401  (matmul precision etc.)
    from fem_elastoplasticity_tpu.models.config import TsxTunnelConfig
    from fem_elastoplasticity_tpu.models.tsx_tunnel import tsx_mesh
    from fem_elastoplasticity_tpu.ops import assembly as asm
    from fem_elastoplasticity_tpu.ops.elements import tables, volume_element

    cfg = TsxTunnelConfig()
    mesh = tsx_mesh(cfg.etype)
    ref = volume_element(cfg.etype)
    f32 = jnp.float32
    tab = tables(ref)
    tab = type(tab)(*[jnp.asarray(x, f32) for x in tab])
    _, n_free = asm.free_dof_map(mesh.free)
    # all arrays cross the jit boundary as arguments (axon constant
    # pathology, ops/assembly.py docstring)
    args = dict(
        coords=jnp.asarray(mesh.coords, f32),
        elems=jnp.asarray(mesh.elems),
        tab=tab,
        Ki=jnp.eye(n_free, dtype=f32),
        rhs=jnp.ones((n_free,), f32),
    )

    @jax.jit
    def prog(a):
        geom = asm.compute_geometry(a["coords"], a["elems"], a["tab"])
        Ki, rhs0 = a["Ki"], a["rhs"]

        def outer_body(c):
            x, i = c

            def inner_body(d):
                x, j = d
                ind_p = x[: geom.n_int] > 0.5
                rhs = rhs0 * (1.0 + x[0])
                # three trivial branches — the BODIES don't matter, only
                # the conditional nesting does
                smw = lambda: rhs + jnp.arange(64).sum() * 0.0
                fresh_factor = lambda: rhs * 2.0
                reuse = lambda: Ki @ rhs
                n_now = jnp.sum(ind_p.astype(jnp.int32))
                if mode == "nested":
                    fresh = lambda: jax.lax.cond(
                        n_now <= 64, smw, fresh_factor
                    )
                    du = jax.lax.cond(ind_p.any(), fresh, reuse)
                else:
                    branch = jnp.where(
                        ind_p.any(), jnp.where(n_now <= 64, 1, 2), 0
                    )
                    du = jax.lax.switch(branch, [reuse, smw, fresh_factor])
                return (x.at[: du.shape[0]].add(du * 1e-6), j + 1)

            x, _ = jax.lax.while_loop(lambda d: d[1] < 3, inner_body, (x, 0))
            return (x, i + 1)

        x0 = jnp.zeros((n_free,), f32)
        x, _ = jax.lax.while_loop(lambda c: c[1] < 3, outer_body, (x0, 0))
        return x

    out = float(np.asarray(prog(args))[0])
    print(f"mode={mode} compiled and ran, out[0]={out}")
    print("OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "nested")
