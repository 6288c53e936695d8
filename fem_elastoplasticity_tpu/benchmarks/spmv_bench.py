"""Windowed-ELL matvec vs matrix-free matvec on the TPU (real chip).

Usage: python -m fem_elastoplasticity_tpu.benchmarks.spmv_bench [level]

Times both operators with an on-device dependence chain and a host-fetch
sync (block_until_ready does NOT reliably block through the axon tunnel;
all timings here force a device->host read).
"""
import json
import sys
import time


def main(level: int = 5, reps: int = 10) -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ..mesh.refine import refine_uniform
    from ..models.materials import elastic_tangent_lanes, lame_moduli
    from ..models.tsx_tunnel import _DATA
    from ..ops import assembly as asm
    from ..ops import spmv
    from ..ops.elements import ElementType, volume_element

    raw = np.load(_DATA)
    coords, elems = raw["coords"].astype(np.float64), raw["elems"]
    for _ in range(level):
        coords, elems = refine_uniform(coords, elems)
    n_n = coords.shape[0]

    t0 = time.perf_counter()
    order = spmv.rcm_node_order(elems, n_n)
    coords2, elems2, _ = spmv.permute_mesh(coords, elems, order)
    shear, bulk = lame_moduli(60000.0, 0.2)
    ref = volume_element(ElementType.P1)
    arrays, meta, K = spmv.build_ell_elastic(
        coords2, elems2, ref, shear, bulk
    )
    setup = time.perf_counter() - t0

    def timed(fn, *args, label=""):
        lc = (
            jax.jit(
                lambda *aa: jax.lax.fori_loop(
                    0,
                    reps,
                    lambda _, x: fn(x, *aa[1:]),
                    aa[0],
                )
            )
            .lower(*args)
            .compile()
        )
        float(np.asarray(lc(*args).reshape(-1)[0]))
        t1 = time.perf_counter()
        float(np.asarray(lc(*args).reshape(-1)[0]))
        return (time.perf_counter() - t1) / reps * 1e3

    v = jnp.asarray(
        np.random.default_rng(0).standard_normal(meta.n2), jnp.float32
    )
    t_ell = timed(
        lambda x, a: spmv.ell_matvec(a, meta, x) * (1.0 - 1e-30), v, arrays
    )

    # matrix-free reference on the same (permuted) mesh, f32
    tab = volume_element(ElementType.P1)
    geom = jax.jit(lambda c, e: asm.compute_geometry(c, e, tab))(
        jnp.asarray(coords2, jnp.float32), jnp.asarray(elems2)
    )
    geom = asm.Geometry(
        B=geom.B, weight=geom.weight, edofs=geom.edofs, edofs_t=geom.edofs_t,
        n_nodes=n_n, n_q=1, n_real=elems2.shape[0],
    )
    d = elastic_tangent_lanes(shear, bulk, geom.n_int, jnp.float32)
    G = dict(B=geom.B, weight=geom.weight, edofs=geom.edofs,
             edofs_t=geom.edofs_t)

    def mf(x, g, dd):
        gg = asm.Geometry(
            B=g["B"], weight=g["weight"], edofs=g["edofs"],
            edofs_t=g["edofs_t"], n_nodes=n_n, n_q=1,
            n_real=elems2.shape[0],
        )
        return asm.tangent_matvec(gg, dd, x)

    v_full = jnp.zeros((2 * n_n,), jnp.float32).at[: meta.n2].set(
        v[: 2 * n_n]
    )
    t_mf = timed(mf, v_full, G, d)

    print(
        json.dumps(
            {
                "metric": "ell_matvec_ms",
                "level": level,
                "n_dofs": meta.n2,
                "nnz": int(K.nnz),
                "J": meta.J,
                "deg": meta.deg,
                "value": t_ell,
                "unit": "ms",
                "matrix_free_ms": t_mf,
                "speedup": t_mf / t_ell,
                "setup_s": setup,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
