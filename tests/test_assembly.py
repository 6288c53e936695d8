"""Assembly-layer unit tests: operator identities and variant equivalence."""
import numpy as np
import pytest

import jax.numpy as jnp

from fem_elastoplasticity_tpu.models.materials import (
    elastic_tangent_lanes,
    lame_moduli,
)
from fem_elastoplasticity_tpu.models.tsx_tunnel import tsx_mesh
from fem_elastoplasticity_tpu.ops import assembly as asm
from fem_elastoplasticity_tpu.ops.elements import ElementType, tables, volume_element

G, K = lame_moduli(60000.0, 0.2)


@pytest.fixture(scope="module", params=[ElementType.P1, ElementType.P2])
def setup(request):
    mesh = tsx_mesh(request.param)
    ref = volume_element(request.param)
    geom = asm.compute_geometry(
        jnp.asarray(mesh.coords), jnp.asarray(mesh.elems), tables(ref)
    )
    D = elastic_tangent_lanes(G, K, geom.n_int, jnp.float64)
    return mesh, geom, D


class TestOperatorIdentities:
    def test_matvec_matches_dense(self, setup):
        mesh, geom, D = setup
        fmap, n_free = asm.free_dof_map(mesh.free)
        ke = asm.element_stiffness(geom, D)
        Kd = np.asarray(asm.assemble_dense_free(ke, geom, jnp.asarray(fmap), n_free))
        rng = np.random.default_rng(0)
        v = rng.normal(size=2 * mesh.n_nodes)
        v_masked = np.where(mesh.free.reshape(-1), v, 0.0)
        mv = np.asarray(asm.tangent_matvec(geom, D, jnp.asarray(v_masked)))
        mv_free = mv[mesh.free.reshape(-1)]
        ref = Kd @ v_masked[mesh.free.reshape(-1)]
        np.testing.assert_allclose(mv_free, ref, rtol=1e-12)

    def test_stiffness_symmetry_and_psd(self, setup):
        mesh, geom, D = setup
        fmap, n_free = asm.free_dof_map(mesh.free)
        ke = asm.element_stiffness(geom, D)
        Kd = np.asarray(asm.assemble_dense_free(ke, geom, jnp.asarray(fmap), n_free))
        assert np.abs(Kd - Kd.T).max() < 1e-9 * np.abs(Kd).max()
        w = np.linalg.eigvalsh(Kd)
        assert w.min() > 0

    def test_block_diagonal_matches_dense(self, setup):
        mesh, geom, D = setup
        blocks = np.asarray(asm.node_block_diagonal(geom, D))
        ke = asm.element_stiffness(geom, D)
        Kfull = np.asarray(
            asm.assemble_dense_full_from_lane(ke, geom)
            if hasattr(asm, "assemble_dense_full_from_lane")
            else _dense_full(ke, geom)
        )
        for n in [0, 7, 40]:
            np.testing.assert_allclose(
                blocks[n], Kfull[2 * n : 2 * n + 2, 2 * n : 2 * n + 2], rtol=1e-12
            )

    def test_mxu_assembly_matches_scatter(self, setup):
        mesh, geom, D = setup
        fmap, n_free = asm.free_dof_map(mesh.free)
        ke = asm.element_stiffness(geom, D)
        K1 = np.asarray(asm.assemble_dense_free(ke, geom, jnp.asarray(fmap), n_free))
        K2 = np.asarray(
            asm.assemble_dense_free_mxu(ke, geom, jnp.asarray(fmap), n_free)
        )
        np.testing.assert_allclose(K2, K1, rtol=1e-12, atol=1e-9 * np.abs(K1).max())

    def test_strain_of_rigid_motion_is_zero(self, setup):
        mesh, geom, D = setup
        # translation + rotation produce zero (linearized) strain
        u = np.empty((mesh.n_nodes, 2))
        u[:, 0] = 3.0 - 1e-3 * mesh.coords[:, 1]
        u[:, 1] = -1.5 + 1e-3 * mesh.coords[:, 0]
        e = np.asarray(asm.strains(geom, jnp.asarray(u.reshape(-1))))
        assert np.abs(e).max() < 1e-12

    def test_padding_is_inert(self, setup):
        mesh, geom, D = setup
        n_real_int = geom.n_real * geom.n_q
        assert geom.n_int % 128 == 0
        assert np.asarray(geom.weight)[n_real_int:].max(initial=0.0) == 0.0
        assert np.abs(np.asarray(geom.B)[:, :, n_real_int:]).max(initial=0.0) == 0.0


class TestPressureTraction:
    """`pressure_traction_vector` — arc-length normal-pressure loads
    (beyond-reference: `tsx-tunnel/pythonFEM.py:1705-1708` is commented out,
    `Elasticity2D/pythonFEM.py:295-364` only handles axis-aligned edges)."""

    @pytest.mark.parametrize(
        "etype", [ElementType.P1, ElementType.P2, ElementType.P4]
    )
    def test_closed_loop_invariants(self, etype):
        # constant pressure on the closed tunnel-wall loop: net force is
        # zero (divergence theorem) and the virtual work against u = (x, y)
        # is 2*p*A_hole (|∮ u·n ds| = 2A for the enclosed polygon)
        from fem_elastoplasticity_tpu.models.tsx_tunnel import (
            tsx_mesh,
            tunnel_wall_edges,
        )
        from fem_elastoplasticity_tpu.ops.elements import surface_element

        mesh = tsx_mesh(etype)
        edges = tunnel_wall_edges(mesh)
        p = 3.25
        f = np.asarray(
            asm.pressure_traction_vector(
                jnp.asarray(mesh.coords),
                jnp.asarray(edges),
                surface_element(etype),
                p,
                mesh.n_nodes,
            )
        ).reshape(-1, 2)
        area_scale = p * 4.0  # tunnel semi-axes ~2.2 x 1.75 -> A ~ 12
        assert np.abs(f.sum(axis=0)).max() < 1e-12 * area_scale
        # oriented shoelace over the wall segments (endpoints only; the
        # higher-order nodes sit on the same straight chords)
        c = np.asarray(mesh.coords)
        p0, p1 = c[edges[:, 0]], c[edges[:, 1]]
        area = 0.5 * abs(np.sum(p0[:, 0] * p1[:, 1] - p0[:, 1] * p1[:, 0]))
        u = c.reshape(-1)
        work = float(f.reshape(-1) @ u)
        np.testing.assert_allclose(abs(work), 2.0 * p * area, rtol=1e-12)
        # support pressure pushes the wall outward (opposes closure)
        assert work > 0

    def test_matches_straight_edge_traction(self):
        # on the axis-aligned outer box edges the x-projected reference
        # measure is exact: pressure p == explicit traction t = -p*n
        from fem_elastoplasticity_tpu.mesh.boundary import boundary_edges
        from fem_elastoplasticity_tpu.models.tsx_tunnel import tsx_mesh
        from fem_elastoplasticity_tpu.ops.elements import surface_element

        mesh = tsx_mesh(ElementType.P1)
        edges = boundary_edges(np.asarray(mesh.elems), ElementType.P1)
        c = np.asarray(mesh.coords)
        top = edges[(c[edges[:, 0], 1] > 49.0) & (c[edges[:, 1], 1] > 49.0)]
        assert len(top) > 0
        surf = surface_element(ElementType.P1)
        p = 1.7
        f_p = np.asarray(
            asm.pressure_traction_vector(
                jnp.asarray(c), jnp.asarray(top), surf, p, mesh.n_nodes
            )
        )
        f_t = np.asarray(
            asm.traction_force_vector(
                jnp.asarray(c),
                jnp.asarray(top),
                surf,
                jnp.asarray([0.0, -p]),
                mesh.n_nodes,
            )
        )
        np.testing.assert_allclose(f_p, f_t, rtol=1e-12, atol=1e-15)


def _dense_full(ke, geom):
    K = jnp.zeros((2 * geom.n_nodes, 2 * geom.n_nodes), ke.dtype)
    fd = geom.edofs_t
    return K.at[fd[:, None, :], fd[None, :, :]].add(ke)


class TestPlasticCorrection:
    def test_correction_matches_tangent_difference(self, setup):
        """B^T (w*(d - d_el)) B v over the plastic slot set equals
        tangent_matvec(d) - tangent_matvec(d_el) when the tangents differ
        exactly on the slotted points (the CG operator identity the
        assembled-elastic + low-rank path relies on, solve/newton.py)."""
        mesh, geom, D = setup
        rng = np.random.default_rng(7)
        n_dofs = 2 * geom.n_nodes
        v = jnp.asarray(rng.standard_normal(n_dofs))

        # mark a scattered subset of real points plastic and perturb their
        # tangent
        ind_p = np.zeros(geom.n_int, bool)
        ind_p[: geom.n_real : 7] = True
        cap = int(ind_p.sum()) + 5
        delta_np = np.zeros((3, 3, geom.n_int))
        pert = rng.standard_normal((3, 3, ind_p.sum()))
        pert = pert + pert.transpose(1, 0, 2)  # keep the operator symmetric
        delta_np[:, :, ind_p] = pert
        d_tan = D + jnp.asarray(delta_np)

        idx, valid = asm.plastic_slots(jnp.asarray(ind_p), cap)
        Bp, wdelta, edp = asm.plastic_correction_gather(
            geom, d_tan - D, idx, valid
        )
        corr = asm.plastic_correction_apply(Bp, wdelta, edp, n_dofs, v)
        ref_diff = asm.tangent_matvec(geom, d_tan, v) - asm.tangent_matvec(
            geom, D, v
        )
        np.testing.assert_allclose(
            np.asarray(corr), np.asarray(ref_diff),
            atol=1e-9 * float(jnp.abs(ref_diff).max()),
        )
