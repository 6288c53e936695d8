"""Minimal reproducers for the axon TPU runtime pathologies (round 1).

Run on the axon-tunneled TPU:

    python tools/axon_degradation_repro.py constant   # array-constant poisoning (TRIGGERS)
    python tools/axon_degradation_repro.py lanes_rm   # jitted XLA return map alone (clean)
    python tools/axon_degradation_repro.py pallas_rm  # Pallas return map (clean)

The confirmed trigger is embedded array constants.  The full f64/f32-XLA
load-stepping program also triggers it through a construct combination not
yet isolated (every individually-tested component is clean); the
f32+Pallas stepper does not.

Observed behavior (2026-08-16, v5e, jax 0.9.0): after the trigger program
executes once, EVERY subsequent dispatch in the process costs ~1.3 ms
(~300x; the probe loop goes from ~0.005 to ~1.3 ms/iter).  Large embedded
constants (>=100 KB) hang compilation or abort the backend.
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def probe(tag):
    import jax
    import jax.numpy as jnp

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
    print(f"probe {tag}: {dt:.3f} ms/iter " + ("[DEGRADED]" if dt > 0.5 else "[clean]"))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "constant"
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_enable_x64", True)
    probe("before")

    if which == "constant":
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
