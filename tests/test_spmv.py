"""Windowed-ELL sparse operator tests (ops/spmv.py).

Runs the Pallas kernel in interpret mode on the CPU mesh; correctness is
checked against scipy CSR and the matrix-free `tangent_matvec`.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fem_elastoplasticity_tpu.models.materials import (
    elastic_tangent_lanes,
    lame_moduli,
)
from fem_elastoplasticity_tpu.models.tsx_tunnel import tsx_mesh
from fem_elastoplasticity_tpu.ops import assembly as asm
from fem_elastoplasticity_tpu.ops import spmv
from fem_elastoplasticity_tpu.ops.elements import ElementType, volume_element


@pytest.fixture(scope="module")
def tsx_rcm():
    mesh = tsx_mesh(ElementType.P1, refine_levels=1)
    coords = np.asarray(mesh.coords)
    elems = np.asarray(mesh.elems)
    order = spmv.rcm_node_order(elems, coords.shape[0])
    coords2, elems2, new_of_old = spmv.permute_mesh(coords, elems, order)
    free2 = np.asarray(mesh.free)[order]
    return coords2, elems2, free2, new_of_old


def test_rcm_reduces_bandwidth(tsx_rcm):
    coords2, elems2, _, _ = tsx_rcm
    bw = int((elems2.max(axis=1) - elems2.min(axis=1)).max())
    n_n = coords2.shape[0]
    assert bw < n_n // 4  # locality: far below the unordered worst case


def test_host_assembly_matches_device(tsx_rcm):
    coords2, elems2, free2, _ = tsx_rcm
    ref = volume_element(ElementType.P1)
    shear, bulk = lame_moduli(60000.0, 0.2)
    _, _, K = spmv.build_ell_elastic(
        coords2, elems2, ref, shear, bulk, free=None
    )
    # device path
    geom = asm.compute_geometry(
        jnp.asarray(coords2), jnp.asarray(elems2), ref
    )
    d = elastic_tangent_lanes(shear, bulk, geom.n_int, jnp.float64)
    rng = np.random.default_rng(0)
    v = rng.standard_normal(K.shape[0])
    ref_out = np.asarray(asm.tangent_matvec(geom, d, jnp.asarray(v)))
    np.testing.assert_allclose(K @ v, ref_out, rtol=1e-10, atol=1e-10)


def test_ell_matvec_matches_scipy(tsx_rcm):
    coords2, elems2, free2, _ = tsx_rcm
    ref = volume_element(ElementType.P1)
    shear, bulk = lame_moduli(60000.0, 0.2)
    arrays, meta, K = spmv.build_ell_elastic(
        coords2, elems2, ref, shear, bulk, free=free2
    )
    rng = np.random.default_rng(1)
    v = rng.standard_normal(meta.n2).astype(np.float32)
    got = np.asarray(ell_apply(arrays, meta, v))
    exp = K @ v.astype(np.float64)
    scale = np.abs(exp).max()
    np.testing.assert_allclose(got, exp, atol=2e-6 * scale)


def ell_apply(arrays, meta, v):
    fn = jax.jit(
        lambda a, vv: spmv.ell_matvec(a, meta, vv)
    )
    return fn(arrays, jnp.asarray(v))


def test_ell_bc_rows_identity(tsx_rcm):
    """Constrained DOFs behave as unit diagonal after apply_bc_csr."""
    coords2, elems2, free2, _ = tsx_rcm
    ref = volume_element(ElementType.P1)
    shear, bulk = lame_moduli(60000.0, 0.2)
    arrays, meta, K = spmv.build_ell_elastic(
        coords2, elems2, ref, shear, bulk, free=free2
    )
    flat = free2.reshape(-1)
    v = np.zeros(meta.n2, np.float32)
    cidx = np.nonzero(~flat)[0][:5]
    v[cidx] = 1.0
    out = np.asarray(ell_apply(arrays, meta, v))
    np.testing.assert_allclose(out[cidx], 1.0, rtol=1e-6)
    # free rows see no contribution from constrained columns
    free_idx = np.nonzero(flat)[0]
    np.testing.assert_allclose(out[free_idx], 0.0, atol=1e-7)


def test_diag_blocks(tsx_rcm):
    coords2, elems2, free2, _ = tsx_rcm
    ref = volume_element(ElementType.P1)
    shear, bulk = lame_moduli(60000.0, 0.2)
    _, _, K = spmv.build_ell_elastic(
        coords2, elems2, ref, shear, bulk, free=free2
    )
    n_n = coords2.shape[0]
    blocks = spmv.diag_blocks_csr(K, n_n)
    Kd = K.toarray()
    k = 17
    np.testing.assert_allclose(
        blocks[k], Kd[2 * k : 2 * k + 2, 2 * k : 2 * k + 2]
    )


# ---------------------------------------------------------------------------
# ELL multigrid hierarchy (solve/multigrid.py build_hierarchy_ell)
# ---------------------------------------------------------------------------
from fem_elastoplasticity_tpu.models.config import TsxTunnelConfig
from fem_elastoplasticity_tpu.models.tsx_tunnel import _DATA
from fem_elastoplasticity_tpu.solve import multigrid as mg
from fem_elastoplasticity_tpu.solve.cg import solve_cg


def _free_fn(coords):
    free = np.ones((coords.shape[0], 2), dtype=bool)
    free[np.abs(coords[:, 0]) > 49.99, 0] = False
    free[np.abs(coords[:, 1]) > 49.99, 1] = False
    return free


@pytest.fixture(scope="module")
def ell_hier():
    cfg = TsxTunnelConfig()
    shear, bulk = lame_moduli(cfg.young, cfg.poisson)
    raw = np.load(_DATA)
    ref = volume_element(ElementType.P1)
    return (
        mg.build_hierarchy_ell(
            raw["coords"].astype(np.float64), raw["elems"], 1, _free_fn,
            shear, bulk, ref,
        ),
        (shear, bulk),
    )


def test_ell_transfer_windows_small(ell_hier):
    (arrays, metas, perms, coarse), _ = ell_hier
    # derived ordering + overflow cap must keep windows bounded
    assert metas[1]["P"].J <= 16
    assert metas[1]["R"].J <= 48
    assert metas[1]["op"].J <= 32
    # overflow stays a tiny fraction of the operator
    nnz_op = int(np.count_nonzero(np.asarray(arrays[1]["op"]["vals"])))
    assert metas[1]["op"].n_overflow <= max(1, nnz_op // 100)


def test_ell_vcycle_preconditions_cg(ell_hier):
    (arrays, metas, perms, coarse), (shear, bulk) = ell_hier
    meta = metas[-1]["op"]
    arr = arrays[-1]

    def coarse_solve(r):
        idx0 = coarse["free_idx0"]
        return jnp.zeros_like(r).at[idx0].set(
            jax.scipy.linalg.cho_solve(
                (coarse["cho0"], False), r[idx0]
            )
        )

    pre = mg.make_vcycle_ell(metas, coarse_solve, nu=2)
    rng = np.random.default_rng(3)
    free = np.asarray(arr["free"])
    b = rng.standard_normal(meta.n2).astype(np.float32) * free

    res = solve_cg(
        lambda v: spmv.ell_matvec(arr["op"], meta, v),
        jnp.asarray(b),
        jnp.asarray(free),
        precond=lambda r: pre(arrays, r),
        tol=1e-5,
        maxiter=40,
        structure="while",
    )
    assert bool(res.converged)
    assert int(res.iters) <= 25  # mesh-independent-ish count
    # verify against scipy on the same matrix
    mesh_ok = np.asarray(
        spmv.ell_matvec(arr["op"], meta, res.x)
    )
    np.testing.assert_allclose(
        mesh_ok * free, b * free,
        atol=2e-4 * np.abs(b).max(),
    )


# ---------------------------------------------------------------------------
# compacted-slot format (build_slot / slot_matvec)
# ---------------------------------------------------------------------------
def test_slot_matvec_matches_scipy(tsx_rcm):
    coords2, elems2, free2, _ = tsx_rcm
    ref = volume_element(ElementType.P1)
    shear, bulk = lame_moduli(60000.0, 0.2)
    _, _, K = spmv.build_ell_elastic(
        coords2, elems2, ref, shear, bulk, free=free2
    )
    arrays, meta = spmv.build_slot(K)
    rng = np.random.default_rng(5)
    v = rng.standard_normal(meta.n2).astype(np.float32)
    got = np.asarray(
        jax.jit(lambda a, vv: spmv.slot_matvec(a, meta, vv))(
            arrays, jnp.asarray(v)
        )
    )
    exp = K @ v.astype(np.float64)
    scale = np.abs(exp).max()
    np.testing.assert_allclose(got, exp, atol=2e-6 * scale)


def test_slot_matvec_rectangular():
    """P/R-shaped (rectangular) operators work in slot format too."""
    import scipy.sparse as sp

    rng = np.random.default_rng(7)
    for shape in [(700, 350), (130, 900), (128, 128)]:
        M = sp.random(*shape, density=0.02, random_state=11, format="csr")
        M.sum_duplicates()
        arrays, meta = spmv.build_slot(M)
        v = rng.standard_normal(shape[1]).astype(np.float32)
        got = np.asarray(
            jax.jit(lambda a, vv: spmv.slot_matvec(a, meta, vv))(
                arrays, jnp.asarray(v)
            )
        )
        exp = M @ v.astype(np.float64)
        scale = max(np.abs(exp).max(), 1e-30)
        np.testing.assert_allclose(got, exp, atol=2e-6 * scale)


def test_slot_hierarchy_vcycle_preconditions_cg():
    """A slot-format hierarchy drives the same V-cycle via sp_matvec."""
    cfg = TsxTunnelConfig()
    shear, bulk = lame_moduli(cfg.young, cfg.poisson)
    raw = np.load(_DATA)
    ref = volume_element(ElementType.P1)
    arrays, metas, perms, coarse = mg.build_hierarchy_ell(
        raw["coords"].astype(np.float64), raw["elems"], 1, _free_fn,
        shear, bulk, ref, fmt="slot",
    )
    assert isinstance(metas[-1]["op"], spmv.SlotMeta)
    meta = metas[-1]["op"]
    arr = arrays[-1]

    def coarse_solve(r):
        idx0 = coarse["free_idx0"]
        return jnp.zeros_like(r).at[idx0].set(
            jax.scipy.linalg.cho_solve((coarse["cho0"], False), r[idx0])
        )

    pre = mg.make_vcycle_ell(metas, coarse_solve, nu=2)
    rng = np.random.default_rng(3)
    free = np.asarray(arr["free"])
    b = rng.standard_normal(meta.n2).astype(np.float32) * free
    res = solve_cg(
        lambda v: spmv.sp_matvec(arr["op"], meta, v),
        jnp.asarray(b),
        jnp.asarray(free),
        precond=lambda r: pre(arrays, r),
        tol=1e-5,
        maxiter=40,
        structure="while",
    )
    assert bool(res.converged)
    assert int(res.iters) <= 25
    got = np.asarray(spmv.sp_matvec(arr["op"], meta, res.x))
    np.testing.assert_allclose(
        got * free, b * free, atol=2e-4 * np.abs(b).max()
    )
