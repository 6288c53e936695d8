"""Minimal reproducers for the axon TPU runtime pathologies (rounds 1-2).

Run on the axon-tunneled TPU (one variant per fresh process; the device
state needs ~1 min idle to recover between trigger runs):

    python tools/axon_degradation_repro.py constant       # array-constant poisoning (TRIGGERS)
    python tools/axon_degradation_repro.py lanes_rm       # jitted XLA return map alone (clean)
    python tools/axon_degradation_repro.py pallas_rm      # Pallas return map (clean)
    python tools/axon_degradation_repro.py while_gather   # f64 while_loop containing a gather (clean — indices as args)
    python tools/axon_degradation_repro.py while_gather_f32
    python tools/axon_degradation_repro.py while_nogather # control
    python tools/axon_degradation_repro.py scan_gather    # gather under lax.scan
    python tools/axon_degradation_repro.py while_scatter  # segment-sum under while_loop
    python tools/axon_degradation_repro.py gather_nowhile # control
    python tools/axon_degradation_repro.py while_gather_const  # closed-over indices (TRIGGERS)
    python tools/axon_degradation_repro.py df32_solve     # full tsx fast-path solve (clean)
    python tools/axon_degradation_repro.py matrix         # all of the above, fresh subprocess each,
                                                          # waiting out device recovery between runs

ROUND-2 MATRIX RESULT (dual elementwise+gather probes, fresh process per
variant, 90 s recovery waits — 2026-08-16, v5e, jax 0.9.0):

    while_nogather      clean | clean
    gather_nowhile      clean | clean
    scan_gather         clean | clean      (f64, indices as arguments)
    while_gather        clean | clean      (f64, indices as arguments)
    while_gather_f32    clean | clean
    while_scatter       clean | clean      (segment_sum under while_loop)
    while_gather_const  DEGRADED (1.9 ms | 2.4 ms)   <- closed-over indices
    constant            DEGRADED (1.5 ms | 2.5 ms)   <- 96-int embedded
    df32_solve          clean | clean      (full tsx fast-path solve)

CONCLUSION: the ONLY trigger is an embedded array constant (even ~100
ints / a closed-over index array).  Control-flow structure (while/scan/
fori), gathers, scatters and dtype are all irrelevant — an earlier
"while+gather" attribution was the closed-over-constant case in disguise.

Observed behavior: after the trigger program executes once, EVERY
subsequent dispatch costs ~1.3-2.5 ms (~300-800x).  Large embedded
constants (>=100 KB) hang compilation or abort the backend.  The state is
device-level (fresh processes see it too) and recovers after ~1 min idle.
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def probe(tag):
    """Two probes: elementwise-only and gather-containing.

    The pathologies are program-class-specific — after some triggers the
    elementwise probe stays clean while gather-containing programs run
    ~200x slow (round-2 bisect), so both must be measured.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    def fma(x):
        for _ in range(50):
            x = x * 1.0000001 + 1e-9
        return x

    loop = jax.jit(lambda x: jax.lax.fori_loop(0, 20, lambda i, x: fma(x), x))
    x0 = jnp.ones(896, jnp.float32)
    jax.block_until_ready(loop(x0))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(x0))
    dt = (time.perf_counter() - t0) / 20 * 1e3

    # gather probe: fori_loop of gather + segment-sum (matvec-shaped),
    # all arrays passed as arguments
    n = 1 << 16
    idx = jnp.asarray(np.random.default_rng(0).integers(0, n, (n,)))

    def gfn(v, ix):
        # ix threaded as an argument (a closed-over ix would itself be
        # the round-1 embedded-constant trigger)
        def gbody(_, v):
            g = v[ix] * 0.5
            return jax.ops.segment_sum(g, ix, num_segments=n)

        return jax.lax.fori_loop(0, 20, gbody, v)

    gloop = jax.jit(gfn)
    v0 = jnp.ones(n, jnp.float32)
    jax.block_until_ready(gloop(v0, idx))
    t0 = time.perf_counter()
    jax.block_until_ready(gloop(v0, idx))
    dtg = (time.perf_counter() - t0) / 20 * 1e3
    print(
        f"probe {tag}: elementwise {dt:.3f} ms/iter "
        + ("[DEGRADED]" if dt > 0.5 else "[clean]")
        + f" | gather {dtg:.3f} ms/iter "
        + ("[DEGRADED]" if dtg > 2.0 else "[clean]"),
        flush=True,
    )


def _loop_variants(which):
    """Control-flow x memory-op trigger candidates (round-2 bisect)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    dtype = jnp.float32 if which.endswith("_f32") else jnp.float64
    base = which[: -len("_f32")] if which.endswith("_f32") else which
    n = 896
    # indices passed as ARGUMENTS — keeps the round-1 constant trigger out
    idx = jnp.asarray(np.arange(n)[::-1].copy())
    x0 = jnp.ones(n, dtype)

    if base == "while_gather":

        def f(x, idx, steps):
            def body(c):
                i, x = c
                return i + 1, 0.999 * x + 0.001 * x[idx]

            return jax.lax.while_loop(lambda c: c[0] < steps, body, (0, x))[1]

        out = jax.jit(f)(x0, idx, 10)
    elif base == "while_nogather":

        def f(x, steps):
            def body(c):
                i, x = c
                return i + 1, x * 1.0000001 + 1e-9

            return jax.lax.while_loop(lambda c: c[0] < steps, body, (0, x))[1]

        out = jax.jit(f)(x0, 10)
    elif base == "scan_gather":

        def f(x, idx):
            def body(x, _):
                return 0.999 * x + 0.001 * x[idx], 0.0

            return jax.lax.scan(body, x, None, length=10)[0]

        out = jax.jit(f)(x0, idx)
    elif base == "while_scatter":

        def f(x, idx, steps):
            def body(c):
                i, x = c
                add = jax.ops.segment_sum(x, idx, num_segments=x.shape[0])
                return i + 1, 0.999 * x + 0.001 * add

            return jax.lax.while_loop(lambda c: c[0] < steps, body, (0, x))[1]

        out = jax.jit(f)(x0, idx, 10)
    elif base == "gather_nowhile":

        def f(x, idx):
            for _ in range(10):
                x = 0.999 * x + 0.001 * x[idx]
            return x

        out = jax.jit(f)(x0, idx)
    elif base == "while_gather_const":
        # idx CLOSED OVER -> embedded array constant (the round-1 trigger)
        # inside a while+gather program: this is the variant that measured
        # 805-980x in the first round-2 bisect and was initially
        # misattributed to the while+gather combination
        idx_c = jnp.asarray(np.arange(4096)[::-1].copy())
        xl = jnp.ones(4096, dtype)

        def f(x, steps):
            def body(c):
                i, x = c
                return i + 1, 0.999 * x + 0.001 * x[idx_c]

            return jax.lax.while_loop(lambda c: c[0] < steps, body, (0, x))[1]

        out = jax.jit(f)(xl, 10)
    else:
        raise SystemExit(f"unknown variant {which}")
    jax.block_until_ready(out)


def _df32_solve():
    """Run the full df32 tsx fast-path solve (bench.py's program)."""
    import jax

    from fem_elastoplasticity_tpu.models import tsx_tunnel as tsx
    from fem_elastoplasticity_tpu.models.config import TsxTunnelConfig

    run, args, _ = tsx.build_df32(TsxTunnelConfig.fast())
    jax.block_until_ready(run(args))


def run_matrix():
    """Run every variant in a fresh subprocess, waiting out recovery."""
    import subprocess

    variants = [
        "while_nogather",
        "gather_nowhile",
        "scan_gather",
        "while_gather",
        "while_gather_f32",
        "while_scatter",
        "while_gather_const",
        "constant",
        "df32_solve",
    ]
    for v in variants:
        print(f"=== {v} ===", flush=True)
        subprocess.run(
            [sys.executable, __file__, v], check=False, timeout=600
        )
        time.sleep(90)  # device-state recovery window


def run_transfer_probe():
    """Escalating host->device transfers in isolated subprocesses.

    Documents the 2026-08-17 incident: a ~0.44 GB device_put (slot-format
    residual arrays at level 4) failed with "UNAVAILABLE: TPU backend
    setup/compile error" and left the tunnel worker DOWN for many hours
    (init hangs in every later process).  Each size runs in its own
    subprocess with a hard timeout; STOP ESCALATING on the first failure
    — re-running a failing size can kill the worker again.  Run manually
    on a healthy tunnel only.
    """
    import subprocess
    import sys as _sys

    for mb in (8, 32, 64, 96, 128, 192, 256, 384):
        code = (
            "import numpy as np, jax, jax.numpy as jnp;"
            f"x = np.ones(({mb} * 1024 * 1024 // 4,), np.float32);"
            "d = jax.device_put(x);"
            "print('ok', float(d[0]))"
        )
        try:
            r = subprocess.run(
                [_sys.executable, "-c", code],
                timeout=180, capture_output=True, text=True,
            )
            ok = r.returncode == 0 and "ok" in r.stdout
        except subprocess.TimeoutExpired:
            ok = False
        print(f"device_put {mb} MB: {'OK' if ok else 'FAILED'}", flush=True)
        if not ok:
            print("stopping escalation (see docstring)")
            return


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "constant"
    if which == "matrix":
        run_matrix()
        return
    if which == "transfer":
        run_transfer_probe()
        return
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_enable_x64", True)
    probe("before")

    if which == "df32_solve":
        _df32_solve()
    elif which.split("_")[0] in ("while", "scan", "gather"):
        _loop_variants(which)
    elif which == "constant":
        idx = jnp.asarray(np.arange(96) % 7)  # 96-int embedded constant
        u7 = jnp.ones(7)
        jax.block_until_ready(jax.jit(lambda x: x + u7[idx].sum())(jnp.ones(())))
    elif which == "lanes_rm":
        from fem_elastoplasticity_tpu.models.materials import (
            dp_return_map_lanes,
            drucker_prager_fit,
            lame_moduli,
        )

        G, K = lame_moduli(60000.0, 0.2)
        eta, c = drucker_prager_fit(18.7, 49 * np.pi / 180)
        f = jax.jit(
            lambda e, ep: dp_return_map_lanes(e, ep, G, K, eta, c)[0].sum()
        )
        jax.block_until_ready(
            f(jnp.ones((3, 896)) * 1e-3, jnp.zeros((4, 896)))
        )
    elif which == "pallas_rm":
        from fem_elastoplasticity_tpu.models.materials import (
            drucker_prager_fit,
            lame_moduli,
        )
        from fem_elastoplasticity_tpu.ops.return_map_pallas import (
            dp_return_map_pallas,
        )

        G, K = lame_moduli(60000.0, 0.2)
        eta, c = drucker_prager_fit(18.7, 49 * np.pi / 180)
        f = jax.jit(
            lambda e, ep: dp_return_map_pallas(
                e, ep, G, K, eta, c, interpret=False
            )[0].sum()
        )
        jax.block_until_ready(
            f(
                jnp.ones((3, 896), jnp.float32) * 1e-3,
                jnp.zeros((4, 896), jnp.float32),
            )
        )

    probe(f"after {which}")


if __name__ == "__main__":
    main()
