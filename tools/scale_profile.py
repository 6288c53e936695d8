"""Per-component on-device timing of the dp_scale (fast_scale) solver.

Decomposes one df32 Newton iteration of the large-mesh tsx excavation
into its constituent kernels and times each with an on-device fori_loop
at two rep counts, differencing to cancel the constant tunnel
dispatch+fetch cost (~30 ms) — same method as bench.py.

Usage (TPU):  python tools/scale_profile.py [level] [reps_lo reps_hi]

Per-iteration cost model printed at the end:
  newton_it ~= return_map_df + G_df + S_df + criterion + corr_gather
               + cg_iters * (op_matvec + corr_apply + vcycle)
compare against the measured dp_scale wall / total Newton iterations
(BENCH_NOTES.md round 3: L4 = 1.91 s total = 0.76 s predictor
+ 1.14 s stepping / 52 Newton its / 605 CG its).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def _wall(make_fn, args, np, reps, tries=3):
    n_lo, n_hi = reps
    walls = {}
    for n in (n_lo, n_hi):
        fn = make_fn(n)
        out = fn(args)
        leaf = out[0] if isinstance(out, tuple) else out
        float(np.asarray(leaf.reshape(-1)[0]))  # compile + sync
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            out = fn(args)
            leaf = out[0] if isinstance(out, tuple) else out
            float(np.asarray(leaf.reshape(-1)[0]))
            best = min(best, time.perf_counter() - t0)
        walls[n] = best
    return max((walls[n_hi] - walls[n_lo]) / (n_hi - n_lo), 1e-9)


def main():
    level = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    reps = (
        (int(sys.argv[2]), int(sys.argv[3]))
        if len(sys.argv) > 3
        else (30, 100)
    )
    import jax
    import numpy as np

    import fem_elastoplasticity_tpu  # noqa: F401
    import jax.numpy as jnp
    from fem_elastoplasticity_tpu.models import tsx_tunnel as tsx
    from fem_elastoplasticity_tpu.models.config import TsxTunnelConfig
    from fem_elastoplasticity_tpu.models import materials_df as mdf
    from fem_elastoplasticity_tpu.ops import assembly as asm
    from fem_elastoplasticity_tpu.ops import spmv
    from fem_elastoplasticity_tpu.ops.df32 import DF
    from fem_elastoplasticity_tpu.solve import multigrid as mgm
    from fem_elastoplasticity_tpu.solve.cg import solve_cg

    cfg = TsxTunnelConfig.fast_scale(level)
    extras = {}
    t0 = time.perf_counter()
    run, args, mesh = tsx.build_df32(cfg, extras=extras)
    print(f"setup (host build + transfers): {time.perf_counter()-t0:.1f} s")
    probe = extras["probe"]
    metas = probe["mg_metas"]
    Gm, Sm = probe["res_metas"]
    shear, bulk, eta, c = probe["consts"]
    n_nodes, n_q, n_real = probe["statics"]
    cg_tol, cg_maxiter, cg_structure = probe["cg"]
    plastic_cap = probe["plastic_cap"]
    n_dofs = 2 * n_nodes
    rng = np.random.default_rng(0)
    args = dict(args)
    # amplitudes matter: O(1) random displacements give O(1) strains ->
    # every point yields -> plastic-cap overflow + an indefinite corrected
    # tangent -> CG maxiter, and the probe measures the cap, not the
    # solver.  1e-5 displacement ~ the real solve's increment scale.
    args["v"] = jnp.asarray(1e-5 * rng.standard_normal(n_dofs), jnp.float32)
    g_hi = asm.Geometry(
        B=args["B_hi"], weight=args["w_hi"], edofs=args["edofs"],
        edofs_t=args["edofs_t"], n_nodes=n_nodes, n_q=n_q, n_real=n_real,
    )
    n_int = g_hi.n_int
    args["e_hi"] = jnp.asarray(
        1e-8 * rng.standard_normal((3, n_int)), jnp.float32
    )
    args["ep_z"] = jnp.zeros((4, n_int), jnp.float32)

    results = {}

    def norm(w):
        return w / (1.0 + jnp.abs(w).max())

    def fori_probe(body):
        def make(n):
            @jax.jit
            def fn(a):
                return jax.lax.fori_loop(0, n, lambda _, x: body(a, x), a["v"])

            return fn

        return make

    # 1. fine-level assembled elastic matvec (the V-cycle/CG workhorse)
    top = len(metas) - 1
    results["op_matvec"] = _wall(
        fori_probe(
            lambda a, x: norm(
                spmv.sp_matvec(a["mg_ell"][top]["op"], metas[top]["op"], x)
            )
        ),
        args, np, reps,
    )

    # 2. full V-cycle (preconditioner application), nu = 2 and 1
    def vc_body_nu(nu):
        def vc_body(a, x):
            idx0 = a["free_idx0"]
            coarse = lambda r: jnp.zeros_like(r).at[idx0].set(
                a["inv0"] @ r[idx0]
            )
            vc = mgm.make_vcycle_ell(metas, coarse, nu=nu)
            return norm(vc(a["mg_ell"], x))

        return vc_body

    results["vcycle"] = _wall(fori_probe(vc_body_nu(2)), args, np, reps)
    results["vcycle_nu1"] = _wall(fori_probe(vc_body_nu(1)), args, np, reps)

    # 2b. one FUSED smoother sweep at the fine level (the production
    # kernel: ops/spmv.py slot_sweep — matvec + residual mask + 2x2
    # block inverse + update in one Pallas call, incl. pad_rhs glue)
    def sweep_body(a, x):
        arr, meta = a["mg_ell"][top], metas[top]["op"]
        r2 = spmv.pad_rhs(x, meta)
        z = spmv.slot_sweep(arr["op"], meta, arr, x, r2)
        return norm(x * (1.0 + 1e-20 * z[0]) + 1e-20 * z)

    results["smooth_sweep_fine"] = _wall(fori_probe(sweep_body), args, np, reps)

    # 2c. transfer ops at the fine level (R then P)
    def rp_body(a, x):
        arr, meta = a["mg_ell"][top], metas[top]
        rc = spmv.sp_matvec(arr["R"], meta["R"], x)
        xf = spmv.sp_matvec(arr["P"], meta["P"], rc)
        return norm(xf)

    results["restrict_prolong"] = _wall(fori_probe(rp_body), args, np, reps)

    # 2d. coarse direct solve (masked explicit-inverse matmul)
    def coarse_body(a, x):
        idx0 = a["free_idx0"]
        r0 = jnp.zeros((a["inv0"].shape[0],), jnp.float32) + x[0]
        z = a["inv0"] @ r0
        return norm(x * (1.0 + 0.0 * z[0]))

    results["coarse_solve"] = _wall(fori_probe(coarse_body), args, np, reps)

    # 3/4. df32 residual operators: strains (G) and internal force (S)
    def g_body(a, x):
        yh, yl = spmv.sp_matvec_df(a["G_slot"], Gm, x, jnp.zeros_like(x))
        s = yh[: x.shape[0]] if yh.shape[0] >= x.shape[0] else jnp.pad(
            yh, (0, x.shape[0] - yh.shape[0])
        )
        return norm(s + 1e-20 * yl[: s.shape[0]])

    results["G_df"] = _wall(fori_probe(g_body), args, np, reps)

    def s_body(a, x):
        sh = jnp.broadcast_to(x[:1], (3 * n_int,))
        yh, yl = spmv.sp_matvec_df(a["S_slot"], Sm, sh, jnp.zeros_like(sh))
        return norm(yh + 1e-20 * yl)

    results["S_df"] = _wall(fori_probe(s_body), args, np, reps)

    # 5. df32 return map (XLA lanes; the fused Pallas kernel is f32-only).
    # The outputs MUST feed the probe result with nonzero weights: an
    # earlier version multiplied them by 0.0 and XLA dead-code-eliminated
    # the entire return map (it printed 0.000 ms).
    def rm_body(a, x):
        scale = 1.0 + jnp.abs(x[0])
        e = DF(a["e_hi"] * scale, jnp.zeros_like(a["e_hi"]))
        ep = DF(a["ep_z"], a["ep_z"])
        e0 = DF(a["e0_hi"], a["e0_lo"])
        s, ds, ind_p, _, _ = mdf.dp_return_map_lanes_df(
            e, ep, shear, bulk, eta, c, e0=e0
        )
        probe = (
            s.hi[0].sum() + s.lo[0].sum() + ds[0, 0].sum()
            + ind_p.sum().astype(jnp.float32)
        )
        return norm(x * (1.0 + 1e-20 * probe))

    results["return_map_df"] = _wall(fori_probe(rm_body), args, np, reps)

    # 5b. plastic-slot compaction alone (was lax.top_k: ~40 ms at level 4
    # — the dominant per-Newton-iteration cost; now cumsum+searchsorted)
    def slots_body(a, x):
        ind_p = (a["e_hi"][0] * (1.0 + jnp.abs(x[0]))) > 0.0
        idx_p, valid_p = asm.plastic_slots(ind_p, plastic_cap)
        probe = idx_p.sum() + valid_p.sum()
        return norm(x * (1.0 + 1e-20 * probe.astype(jnp.float32)))

    results["plastic_slots"] = _wall(fori_probe(slots_body), args, np, reps)

    # 6. criterion: two assembled elastic matvecs + dots
    def crit_body(a, x):
        arr, meta = a["mg_ell"][top]["op"], metas[top]["op"]
        kd = spmv.sp_matvec(arr, meta, x)
        ku = spmv.sp_matvec(arr, meta, x * 0.5)
        q1 = jnp.sqrt(jnp.abs(x @ kd))
        q2 = jnp.sqrt(jnp.abs(x @ ku))
        return norm(x * (1.0 + 0.0 * (q1 + q2)))

    results["criterion"] = _wall(fori_probe(crit_body), args, np, reps)

    # 7a. plastic-correction gather (once per Newton iteration)
    def cg_gather_body(a, x):
        ind_p = jnp.zeros((n_int,), bool).at[: plastic_cap // 2].set(True)
        idx_p, valid_p = asm.plastic_slots(ind_p, plastic_cap)
        ddelta = jnp.broadcast_to(
            (1e-3 * x[0]) * jnp.ones((3, 3, 1), jnp.float32), (3, 3, n_int)
        )
        Bp, wdelta, edp = asm.plastic_correction_gather(
            g_hi, ddelta, idx_p, valid_p
        )
        probe = Bp[0, 0].sum() + wdelta[0, 0].sum() + edp[0].sum()
        return norm(x * (1.0 + 1e-20 * probe.astype(jnp.float32)))

    results["corr_gather"] = _wall(fori_probe(cg_gather_body), args, np, reps)

    # 7b. plastic-correction apply (every CG iteration)
    ind_p0 = jnp.zeros((n_int,), bool).at[: plastic_cap // 2].set(True)
    idx_p0, valid_p0 = asm.plastic_slots(ind_p0, plastic_cap)
    dd0 = jnp.broadcast_to(
        1e-3 * jnp.ones((3, 3, 1), jnp.float32), (3, 3, n_int)
    )
    Bp0, wd0, edp0 = asm.plastic_correction_gather(g_hi, dd0, idx_p0, valid_p0)
    args["Bp"], args["wd"], args["edp"] = Bp0, wd0, edp0

    def corr_body(a, x):
        return norm(
            x
            + asm.plastic_correction_apply(
                a["Bp"], a["wd"], a["edp"], n_dofs, x
            )
        )

    results["corr_apply"] = _wall(fori_probe(corr_body), args, np, reps)

    # 7c. one full Newton-body iteration (everything the solver's inner
    # loop does: df return map via G, residual via S, tangent CG with
    # V-cycle precond + plastic correction, df criterion) — if this
    # matches the end-to-end wall / total-its, the cost model is complete
    def newton_it_body(a, x):
        u = DF(x, jnp.zeros_like(x))
        eh, el = spmv.sp_matvec_df(a["G_slot"], Gm, u.hi, u.lo)
        e = DF(eh.reshape(3, n_int), el.reshape(3, n_int))
        ep = DF(a["ep_z"], a["ep_z"])
        e0 = DF(a["e0_hi"], a["e0_lo"])
        s, ds, ind_p, _, _ = mdf.dp_return_map_lanes_df(
            e, ep, shear, bulk, eta, c, e0=e0
        )
        fh, fl = spmv.sp_matvec_df(
            a["S_slot"], Sm, s.hi[:3].reshape(-1), s.lo[:3].reshape(-1)
        )
        idx_p, valid_p = asm.plastic_slots(ind_p, plastic_cap)
        from fem_elastoplasticity_tpu.models.materials import (
            elastic_tangent_lanes,
        )

        d_el = elastic_tangent_lanes(shear, bulk, n_int, jnp.float32)
        Bp, wd, edp = asm.plastic_correction_gather(
            g_hi, ds - d_el, idx_p, valid_p
        )
        idx0 = a["free_idx0"]
        coarse = lambda r: jnp.zeros_like(r).at[idx0].set(a["inv0"] @ r[idx0])
        vc = mgm.make_vcycle_ell(metas, coarse, nu=2)
        pre = lambda r: vc(a["mg_ell"], r)
        A_op = lambda v: spmv.sp_matvec(
            a["mg_ell"][top]["op"], metas[top]["op"], v
        ) + asm.plastic_correction_apply(Bp, wd, edp, n_dofs, v)
        res = solve_cg(
            A_op, -fh, a["free_mask"], precond=pre, tol=cg_tol,
            maxiter=cg_maxiter, structure=cg_structure,
        )
        dU = res.x
        arr, meta = a["mg_ell"][top]["op"], metas[top]["op"]
        kd = spmv.sp_matvec(arr, meta, dU)
        ku = spmv.sp_matvec(arr, meta, x)
        q1 = jnp.sqrt(jnp.abs(dU @ kd))
        q2 = jnp.sqrt(jnp.abs(x @ ku))
        return norm(x + dU * (1.0 + 0.0 * (q1 + q2 + fl[0])))

    results["newton_it"] = _wall(
        fori_probe(newton_it_body), args, np, (3, 10)
    )

    # 8. one full tangent CG solve (elastic tangent, V-cycle precond)
    @jax.jit
    def cg_once(a):
        idx0 = a["free_idx0"]
        coarse = lambda r: jnp.zeros_like(r).at[idx0].set(a["inv0"] @ r[idx0])
        vc = mgm.make_vcycle_ell(metas, coarse, nu=2)
        pre = lambda r: vc(a["mg_ell"], r)
        A_op = lambda v: spmv.sp_matvec(
            a["mg_ell"][top]["op"], metas[top]["op"], v
        ) + asm.plastic_correction_apply(a["Bp"], a["wd"], a["edp"], n_dofs, v)
        res = solve_cg(
            A_op, a["v"], a["free_mask"], precond=pre, tol=cg_tol,
            maxiter=cg_maxiter, structure=cg_structure,
        )
        return res.x, res.iters

    x, iters = cg_once(args)
    float(np.asarray(x[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        x, iters = cg_once(args)
        float(np.asarray(x[0]))
        best = min(best, time.perf_counter() - t0)
    results["cg_solve_total"] = best
    cg_iters = int(iters)

    # 9. CG per-iteration GLUE (dots/axpys/projections/bookkeeping) alone:
    # trivial fused operator + identity preconditioner, structure="scan".
    # The scan body does full work on every one of the 32 trips regardless
    # of the `done` flag (converged trips just freeze the carry), so the
    # measurement is 32 full bodies even if the residual hits 0 early.
    # Per-iteration glue = value / 32.  (Attribution probe for the
    # modeled-vs-measured wall gap — BENCH_NOTES 2026-08-20.)
    def cg_glue_body(a, x):
        res = solve_cg(
            lambda v: v * 1.000001, x, a["free_mask"],
            precond=None, tol=0.0, maxiter=32, structure="scan",
        )
        return norm(res.x)

    results["cg_glue_32it"] = _wall(
        fori_probe(cg_glue_body), args, np, (3, 10)
    )

    # 10. the REAL CG body at a fixed 32 trips (operator + V-cycle +
    # correction + glue, no convergence exit): per-iteration in-situ cost
    # = value / 32; compare against op_matvec + vcycle + corr_apply +
    # cg_glue_32it/32 to see whether components compose as modeled.
    def cg_real32_body(a, x):
        idx0 = a["free_idx0"]
        coarse = lambda r: jnp.zeros_like(r).at[idx0].set(
            a["inv0"] @ r[idx0]
        )
        vc = mgm.make_vcycle_ell(metas, coarse, nu=2)
        pre = lambda r: vc(a["mg_ell"], r)
        A_op = lambda v: spmv.sp_matvec(
            a["mg_ell"][top]["op"], metas[top]["op"], v
        ) + asm.plastic_correction_apply(
            a["Bp"], a["wd"], a["edp"], n_dofs, v
        )
        res = solve_cg(
            A_op, x, a["free_mask"], precond=pre, tol=0.0,
            maxiter=32, structure="scan",
        )
        return norm(res.x)

    results["cg_real_32it"] = _wall(
        fori_probe(cg_real32_body), args, np, (2, 6)
    )

    print(f"\nlevel {level}: {mesh.n_elems} elements, {n_dofs} DOFs, "
          f"n_int {n_int}, plastic_cap {plastic_cap}")
    for k, v in results.items():
        print(f"  {k:18s} {v*1e3:9.3f} ms")
    print(f"  cg iters (tol {cg_tol:g}): {cg_iters} "
          f"(dispatch wall incl. ~30 ms tunnel)")
    model_it = (
        results["return_map_df"] + results["G_df"] + results["S_df"]
        + results["criterion"] + results["plastic_slots"]
        + results["corr_gather"]
        + cg_iters * (
            results["op_matvec"] + results["corr_apply"] + results["vcycle"]
        )
    )
    print(f"\nmodeled per-Newton-iteration: {model_it*1e3:.1f} ms "
          f"(x52 its = {model_it*52:.2f} s; measured L4 stepping share "
          f"1.14 s — BENCH_NOTES round 3)")


if __name__ == "__main__":
    main()
