"""Pallas blocked Cholesky kernel tests (interpreter mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from fem_elastoplasticity_tpu.ops.cholesky_pallas import (
    BLOCK,
    cholesky_factor,
    cholesky_solve,
)


@pytest.mark.parametrize("n", [128, 200, 908])
def test_factor_and_solve(n):
    rng = np.random.default_rng(n)
    A = rng.normal(size=(n, n))
    A = (A @ A.T + n * np.eye(n)).astype(np.float32)
    b = rng.normal(size=n).astype(np.float32)

    L, inv = cholesky_factor(jnp.asarray(A))
    x = cholesky_solve(L, inv, jnp.asarray(b), n)

    ref = np.linalg.solve(A.astype(np.float64), b.astype(np.float64))
    rel = np.abs(np.asarray(x) - ref).max() / np.abs(ref).max()
    assert rel < 5e-6

    # the written (lower) part of L matches LAPACK's factor
    Lref = np.linalg.cholesky(A.astype(np.float64))
    Lmine = np.tril(np.asarray(L)[:n, :n])
    relL = np.abs(Lmine - Lref).max() / np.abs(Lref).max()
    assert relL < 5e-6


def test_fem_matrix():
    """Factor the actual tsx elastic stiffness (f32)."""
    import jax

    from fem_elastoplasticity_tpu.models.materials import (
        elastic_tangent_lanes,
        lame_moduli,
    )
    from fem_elastoplasticity_tpu.models.tsx_tunnel import tsx_mesh
    from fem_elastoplasticity_tpu.ops import assembly as asm
    from fem_elastoplasticity_tpu.ops.elements import ElementType, tables, volume_element

    mesh = tsx_mesh(ElementType.P1)
    geom = asm.compute_geometry(
        jnp.asarray(mesh.coords), jnp.asarray(mesh.elems), tables(volume_element(ElementType.P1))
    )
    G, K = lame_moduli(60000.0, 0.2)
    D = elastic_tangent_lanes(G, K, geom.n_int, jnp.float64)
    ke = asm.element_stiffness(geom, D)
    fmap, n_free = asm.free_dof_map(mesh.free)
    Kf = asm.assemble_dense_free(ke, geom, jnp.asarray(fmap), n_free)

    # Jacobi-scale for a well-posed f32 factorization
    d = jax.lax.rsqrt(jnp.diagonal(Kf))
    Ks = (Kf * d[:, None] * d[None, :]).astype(jnp.float32)
    b = jnp.ones(n_free, jnp.float32)
    L, inv = cholesky_factor(Ks)
    x = cholesky_solve(L, inv, b, n_free)
    ref = np.linalg.solve(np.asarray(Ks, np.float64), np.ones(n_free))
    rel = np.abs(np.asarray(x) - ref).max() / np.abs(ref).max()
    assert rel < 1e-4  # cond ~1e3 in f32
