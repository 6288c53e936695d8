"""Reference-element table tests: quadrature exactness, partition of unity."""
import numpy as np
import pytest

from fem_elastoplasticity_tpu.ops.elements import (
    ElementType,
    surface_element,
    volume_element,
)

ALL = list(ElementType)


@pytest.mark.parametrize("etype", ALL)
def test_partition_of_unity(etype):
    el = volume_element(etype)
    np.testing.assert_allclose(el.N.sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(el.dN.sum(axis=1), 0.0, atol=1e-10)


@pytest.mark.parametrize("etype", ALL)
def test_surface_partition_of_unity(etype):
    el = surface_element(etype)
    np.testing.assert_allclose(el.N.sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(el.dN.sum(axis=1), 0.0, atol=1e-12)


@pytest.mark.parametrize(
    "etype,area",
    [
        (ElementType.P1, 0.5),
        (ElementType.P2, 0.5),
        (ElementType.P4, 0.5),
        (ElementType.Q1, 4.0),
        (ElementType.Q2, 4.0),
    ],
)
def test_quadrature_measures_reference_domain(etype, area):
    el = volume_element(etype)
    assert abs(el.w.sum() - area) < 1e-12


@pytest.mark.parametrize(
    "etype,degree",
    [
        (ElementType.P1, 1),
        (ElementType.P2, 5),
        (ElementType.P4, 6),
    ],
)
def test_triangle_quadrature_polynomial_exactness(etype, degree):
    """Rule integrates x^a y^b exactly for a+b <= degree on the unit triangle."""
    el = volume_element(etype)
    for a in range(degree + 1):
        for b in range(degree + 1 - a):
            approx = (el.w * el.xi[:, 0] ** a * el.xi[:, 1] ** b).sum()
            # exact: a! b! / (a+b+2)!
            import math

            exact = math.factorial(a) * math.factorial(b) / math.factorial(a + b + 2)
            assert abs(approx - exact) < 1e-12, (a, b)


@pytest.mark.parametrize("etype", ALL)
def test_nodal_interpolation_property(etype):
    """Each basis function is 1 at its own node, 0 at the others.

    Uses the element's nodal coordinates implied by the mesh conventions.
    """
    nodes = _nodal_coords(etype)
    el = volume_element(etype)
    from fem_elastoplasticity_tpu.ops.elements import _VOLUME_BASIS, _Dual

    fn = _VOLUME_BASIS[etype]
    x1 = _Dual(nodes[:, 0], np.ones(len(nodes)), np.zeros(len(nodes)))
    x2 = _Dual(nodes[:, 1], np.zeros(len(nodes)), np.ones(len(nodes)))
    vals = np.stack(
        [np.broadcast_to(v.v, (len(nodes),)) for v in fn(x1, x2)], axis=1
    )
    np.testing.assert_allclose(vals, np.eye(el.n_p), atol=1e-12)


def _nodal_coords(etype):
    if etype == ElementType.P1:
        return np.array([[0, 0], [1, 0], [0, 1]], dtype=float)
    if etype == ElementType.P2:
        return np.array(
            [[0, 0], [1, 0], [0, 1], [0.5, 0.5], [0, 0.5], [0.5, 0]], dtype=float
        )
    if etype == ElementType.Q1:
        return np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], dtype=float)
    if etype == ElementType.Q2:
        return np.array(
            [
                [-1, -1],
                [1, -1],
                [1, 1],
                [-1, 1],
                [0, -1],
                [1, 0],
                [0, 1],
                [-1, 0],
            ],
            dtype=float,
        )
    if etype == ElementType.P4:
        V = np.array([[0, 0], [1, 0], [0, 1]], dtype=float)

        def bary(l0, l1, l2):
            return l0 * V[0] + l1 * V[1] + l2 * V[2]

        return np.array(
            [
                V[0],
                V[1],
                V[2],
                bary(0.5, 0.5, 0),
                bary(0, 0.5, 0.5),
                bary(0.5, 0, 0.5),
                bary(0.75, 0.25, 0),
                bary(0.25, 0.75, 0),
                bary(0, 0.75, 0.25),
                bary(0, 0.25, 0.75),
                bary(0.25, 0, 0.75),
                bary(0.75, 0, 0.25),
                bary(0.5, 0.25, 0.25),
                bary(0.25, 0.5, 0.25),
                bary(0.25, 0.25, 0.5),
            ]
        )
    raise ValueError(etype)
