"""Mesh layer tests: structured generators, CSV loader, midpoints, refine.

Size anchors from SURVEY.md §0: tsx P1 mesh = 476 nodes / 887 elements /
1363 unique edges; P2 promotion = 1839 nodes.
"""
import numpy as np
import pytest

from fem_elastoplasticity_tpu.mesh import (
    load_csv_mesh,
    promote,
    refine_mesh,
    square_mesh,
    square_with_hole_mesh,
)
from fem_elastoplasticity_tpu.mesh.midpoints import (
    insert_midpoints_p2,
    insert_midpoints_p4,
)
from fem_elastoplasticity_tpu.models.tsx_tunnel import tsx_mesh
from fem_elastoplasticity_tpu.ops.elements import ElementType


def tri_area(coords, elems):
    p = coords[elems[:, :3]]
    return 0.5 * (
        (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1])
        - (p[:, 2, 0] - p[:, 0, 0]) * (p[:, 1, 1] - p[:, 0, 1])
    )


class TestStructured:
    @pytest.mark.parametrize(
        "etype,n_n,n_e",
        [
            (ElementType.P1, 441, 800),
            (ElementType.Q1, 441, 400),
            (ElementType.P2, 1681, 800),
            (ElementType.Q2, 1281, 400),
        ],
    )
    def test_square_counts_level1(self, etype, n_n, n_e):
        m = square_mesh(1, etype, 10.0)
        assert m.coords.shape == (n_n, 2)
        assert m.elems.shape[0] == n_e

    @pytest.mark.parametrize(
        "etype,n_n,n_e",
        [
            (ElementType.P1, 341, 600),
            (ElementType.Q1, 341, 300),
            (ElementType.P2, 1281, 600),
            (ElementType.Q2, 981, 300),
        ],
    )
    def test_hole_counts_level1(self, etype, n_n, n_e):
        # P2 hole mesh crashes in the reference (shape-mismatch transpose,
        # Elasticity2D/pythonFEM.py:685-698); ours must work.
        m = square_with_hole_mesh(1, etype, 10.0, 5.0)
        assert m.coords.shape == (n_n, 2)
        assert m.elems.shape[0] == n_e

    def test_hole_area(self):
        m = square_with_hole_mesh(2, ElementType.P1, 10.0, 5.0)
        assert abs(tri_area(m.coords, m.elems).sum() - 75.0) < 1e-9

    def test_square_area_q_elements(self):
        for etype in (ElementType.Q1, ElementType.Q2):
            m = square_mesh(1, etype, 10.0)
            p = m.coords[m.elems[:, :4]]
            # shoelace over quads
            x, y = p[..., 0], p[..., 1]
            a = 0.5 * np.abs(
                (x * np.roll(y, -1, axis=1) - np.roll(x, -1, axis=1) * y).sum(1)
            )
            assert abs(a.sum() - 100.0) < 1e-9

    def test_consistent_orientation(self):
        for m in [
            square_mesh(1, ElementType.P1, 10.0),
            square_with_hole_mesh(1, ElementType.P1, 10.0, 5.0),
        ]:
            a = tri_area(m.coords, m.elems)
            assert (a > 0).all() or (a < 0).all()

    def test_neumann_edges_on_top(self):
        m = square_with_hole_mesh(1, ElementType.P1, 10.0, 5.0)
        assert np.allclose(m.coords[m.neumann.ravel(), 1], 10.0)


class TestTsxMesh:
    def test_counts(self):
        m = tsx_mesh(ElementType.P1)
        assert m.coords.shape == (476, 2)
        assert m.elems.shape == (887, 3)

    def test_p2_counts(self):
        m = tsx_mesh(ElementType.P2)
        assert m.coords.shape == (1839, 2)  # 476 + 1363 edges
        assert m.elems.shape == (887, 6)

    def test_p4_counts(self):
        m = tsx_mesh(ElementType.P4)
        # 476 + 3*887 interior + 3*1363 edge nodes
        assert m.coords.shape == (476 + 3 * 887 + 3 * 1363, 2)
        assert m.elems.shape == (887, 15)

    def test_free_dof_count(self):
        m = tsx_mesh(ElementType.P1)
        assert m.n_free_dofs == 908  # SURVEY.md §0
        m2 = tsx_mesh(ElementType.P2)
        assert m2.n_free_dofs == 3594


class TestMidpoints:
    def test_p2_midpoints_interpolate(self):
        m = tsx_mesh(ElementType.P1)
        c2, e2 = insert_midpoints_p2(m.coords, m.elems)
        # midpoint rows 3..5 lie at edge midpoints
        for k, (a, b) in enumerate([(1, 2), (2, 0), (0, 1)]):
            np.testing.assert_allclose(
                c2[e2[:, 3 + k]],
                0.5 * (c2[e2[:, a]] + c2[e2[:, b]]),
                atol=0,
            )

    def test_p2_midpoints_shared(self):
        m = tsx_mesh(ElementType.P1)
        c2, e2 = insert_midpoints_p2(m.coords, m.elems)
        # interior edges shared: #unique midpoint nodes == 1363
        assert len(np.unique(e2[:, 3:])) == 1363

    def test_p4_quarter_points(self):
        m = tsx_mesh(ElementType.P1)
        c4, e4 = insert_midpoints_p4(m.coords, m.elems)
        # q12 near V1 at 3/4 V1 + 1/4 V2
        np.testing.assert_allclose(
            c4[e4[:, 6]], 0.75 * c4[e4[:, 0]] + 0.25 * c4[e4[:, 1]], atol=1e-15
        )
        np.testing.assert_allclose(
            c4[e4[:, 9]], 0.75 * c4[e4[:, 2]] + 0.25 * c4[e4[:, 1]], atol=1e-15
        )
        # interior node 12 at (1/2, 1/4, 1/4)
        np.testing.assert_allclose(
            c4[e4[:, 12]],
            0.5 * c4[e4[:, 0]] + 0.25 * c4[e4[:, 1]] + 0.25 * c4[e4[:, 2]],
            atol=1e-15,
        )


class TestRefine:
    def test_area_and_counts(self):
        m = tsx_mesh(ElementType.P1)
        r = refine_mesh(m, 2)
        assert r.elems.shape[0] == 16 * 887
        assert abs(tri_area(m.coords, m.elems).sum() - tri_area(r.coords, r.elems).sum()) < 1e-9

    def test_orientation_preserved(self):
        m = tsx_mesh(ElementType.P1)
        r = refine_mesh(m, 1)
        a0, a1 = tri_area(m.coords, m.elems), tri_area(r.coords, r.elems)
        assert np.sign(a0).min() == np.sign(a1).min()


class TestBoundary:
    def test_p1_boundary_counts(self):
        from fem_elastoplasticity_tpu.mesh.boundary import boundary_edges

        m = tsx_mesh(ElementType.P1)
        b = boundary_edges(m.elems)
        # tsx boundary: outer box + tunnel wall; every boundary node appears
        # in exactly two boundary edges (closed loops)
        nodes, counts = np.unique(b[:, :2], return_counts=True)
        assert (counts == 2).all()
        # edges + boundary loops satisfy Euler: E_int = E - E_b
        assert len(b) == 2 * 1363 - 3 * 887  # 2E - 3T = boundary edge count

    def test_p2_boundary_midpoints(self):
        from fem_elastoplasticity_tpu.mesh.boundary import boundary_edges

        m = tsx_mesh(ElementType.P2)
        b = boundary_edges(m.elems, ElementType.P2)
        np.testing.assert_allclose(
            m.coords[b[:, 2]], 0.5 * (m.coords[b[:, 0]] + m.coords[b[:, 1]]), atol=0
        )

    def test_p4_boundary_quarters(self):
        from fem_elastoplasticity_tpu.mesh.boundary import boundary_edges

        m = tsx_mesh(ElementType.P4)
        b = boundary_edges(m.elems, ElementType.P4)
        np.testing.assert_allclose(
            m.coords[b[:, 3]],
            0.75 * m.coords[b[:, 0]] + 0.25 * m.coords[b[:, 1]],
            atol=1e-15,
        )
        np.testing.assert_allclose(
            m.coords[b[:, 4]],
            0.25 * m.coords[b[:, 0]] + 0.75 * m.coords[b[:, 1]],
            atol=1e-15,
        )
