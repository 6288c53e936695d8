"""Utility subsystem tests: checkpoint/resume, metrics, timing."""
import numpy as np


from fem_elastoplasticity_tpu.models.config import TsxTunnelConfig
from fem_elastoplasticity_tpu.models.tsx_tunnel import solve
from fem_elastoplasticity_tpu.utils import checkpoint as ckpt
from fem_elastoplasticity_tpu.utils import metrics
from fem_elastoplasticity_tpu.utils.timing import Timer, gdof_per_s


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        c = ckpt.SolverCheckpoint(
            u=np.ones(10), u_old=np.zeros(10), u_it=np.ones(10) * 2,
            ep=np.zeros((4, 8)), zeta_old=0.5, d_zeta=0.1, d_zeta_old=0.1,
            step=3, aux=1.5, zeta_hist=np.arange(5.0),
            monitor_hist=np.arange(5.0) * 2, nits_total=7,
        )
        path = tmp_path / "ck.npz"
        ckpt.save(str(path), c)
        c2 = ckpt.load(str(path))
        np.testing.assert_array_equal(c.u_it, c2.u_it)
        assert c2.step == 3 and c2.zeta_old == 0.5 and c2.nits_total == 7


class TestResume:
    def test_split_run_matches_full_run(self):
        """Solve to zeta=8/17, checkpoint, resume to 1 — must match the
        uninterrupted run exactly (the carry round-trips losslessly)."""
        full = solve(TsxTunnelConfig())

        import jax.numpy as jnp

        from fem_elastoplasticity_tpu.models import tsx_tunnel as tsx
        from fem_elastoplasticity_tpu.models.materials import (
            drucker_prager_fit,
            lame_moduli,
        )
        from fem_elastoplasticity_tpu.ops import assembly as asm
        from fem_elastoplasticity_tpu.ops.elements import tables, volume_element
        from fem_elastoplasticity_tpu.solve.newton import (
            NewtonSettings,
            build_load_stepper,
        )

        cfg = TsxTunnelConfig()
        mesh = tsx.tsx_mesh()
        ref = volume_element(cfg.etype)
        G, K = lame_moduli(cfg.young, cfg.poisson)
        eta, c = drucker_prager_fit(cfg.cohesion, cfg.friction_angle)
        s0, e0 = tsx.initial_state(cfg)
        fmap_np, n_free = asm.free_dof_map(mesh.free)
        free_idx = jnp.asarray(np.nonzero(mesh.free.reshape(-1))[0])
        fmap = jnp.asarray(fmap_np)
        geom = asm.compute_geometry(
            jnp.asarray(mesh.coords), jnp.asarray(mesh.elems), tables(ref)
        )

        def make(zeta_max):
            settings = NewtonSettings(
                cfg.newton_maxit, cfg.newton_tol, cfg.accept_tol,
                cfg.d_zeta * cfg.d_zeta_min_ratio, zeta_max, cfg.max_steps, 0,
            )
            return build_load_stepper(
                geom, free_idx, fmap, n_free, G, K, eta, c, settings,
                e0_dir=jnp.asarray(e0), monitor=lambda u, s: u[80],
            )

        # elastic predictor (same as solve())
        from fem_elastoplasticity_tpu.models.materials import elastic_tangent_lanes
        import jax

        D = elastic_tangent_lanes(G, K, geom.n_int, jnp.float64)
        ke = asm.element_stiffness(geom, D)
        K_free = asm.assemble_dense_free(ke, geom, fmap, n_free)
        cho = jax.scipy.linalg.cho_factor(K_free)
        f0 = asm.internal_force(
            geom, jnp.broadcast_to(jnp.asarray(s0[:3])[:, None], (3, geom.n_int))
        )
        u_el = (
            jnp.zeros((2 * mesh.n_nodes,))
            .at[free_idx]
            .set(jax.scipy.linalg.cho_solve(cho, -f0[free_idx]))
        )

        part1 = make(8 / 17)(cfg.d_zeta * u_el, 0.0, cfg.d_zeta)
        resume = dict(
            u=part1.u, u_old=part1.u_old, u_it=part1.u_it, ep=part1.ep,
            zeta_old=part1.zeta, d_zeta=part1.d_zeta,
            d_zeta_old=part1.d_zeta_old, step=part1.n_steps, aux=part1.aux,
            zeta_hist=part1.zeta_hist, monitor_hist=part1.monitor_hist,
            nits_total=part1.n_newton_total,
        )
        part2 = make(1.0)(cfg.d_zeta * u_el, 0.0, cfg.d_zeta, resume=resume)

        assert int(part2.n_steps) == full.n_steps
        assert int(part2.n_newton_total) == full.n_newton_total
        np.testing.assert_allclose(
            np.asarray(part2.u), np.asarray(full.u).reshape(-1), atol=0
        )
        np.testing.assert_allclose(
            np.asarray(part2.zeta_hist), np.asarray(full.zeta_hist), atol=0
        )


class TestMetrics:
    def test_records_and_summary(self):
        from types import SimpleNamespace

        r = solve(TsxTunnelConfig(zeta_max=3 / 17))
        view = SimpleNamespace(
            zeta_hist=r.zeta_hist,
            monitor_hist=r.displ_hist,
            n_steps=r.n_steps,
            n_newton_total=r.n_newton_total,
            n_plastic=r.n_plastic,
        )
        recs = metrics.step_records(view)
        assert len(recs) == 3
        s = metrics.summarize(view)
        assert s["n_steps"] == 3

    def test_log_run(self, caplog):
        from types import SimpleNamespace

        r = solve(TsxTunnelConfig(zeta_max=2 / 17))
        view = SimpleNamespace(
            zeta_hist=r.zeta_hist,
            monitor_hist=r.displ_hist,
            n_steps=r.n_steps,
            n_newton_total=r.n_newton_total,
            n_plastic=r.n_plastic,
        )
        with caplog.at_level("INFO", logger="fem_elastoplasticity_tpu"):
            metrics.log_run(view, monitor_name="u40")
        msgs = [rec.getMessage() for rec in caplog.records]
        assert any("run summary" in m and '"n_steps": 2' in m for m in msgs)
        assert sum("step:" in m for m in msgs) == 2

    def test_jsonl(self, tmp_path):
        p = tmp_path / "m.jsonl"
        metrics.write_jsonl(str(p), [{"a": 1}, {"b": 2.5}])
        assert len(p.read_text().splitlines()) == 2


class TestTiming:
    def test_timer_and_gdof(self):
        t = Timer()
        with t.lap("x"):
            pass
        assert t.median("x") >= 0
        assert gdof_per_s(2_000_000_000, 2.0) == 1.0
