"""Visualization layer smoke tests (headless Agg backend)."""
import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from fem_elastoplasticity_tpu import viz
from fem_elastoplasticity_tpu.models.tsx_tunnel import tsx_mesh
from fem_elastoplasticity_tpu.mesh.structured import square_with_hole_mesh
from fem_elastoplasticity_tpu.ops.elements import ElementType


@pytest.fixture(scope="module")
def mesh():
    return tsx_mesh(ElementType.P1)


def test_draw_mesh(mesh):
    pc = viz.draw_mesh(mesh, show=False)
    assert len(pc.get_paths()) == mesh.n_elems


def test_draw_quantity_with_tsx_outline(mesh):
    q = np.linalg.norm(mesh.coords, axis=1)
    pc = viz.draw_quantity(mesh, np.zeros((mesh.n_nodes, 2)), q, show=False, outline="tsx")
    assert pc.get_array().shape == (mesh.n_elems,)


def test_draw_displacement_quad():
    m = square_with_hole_mesh(1, ElementType.Q2, 10.0, 5.0)
    u = 1e-3 * np.random.default_rng(0).normal(size=(m.n_nodes, 2))
    pc = viz.draw_displacement(m, u, show=False)
    assert len(pc.get_paths()) == m.n_elems


def test_load_curve(mesh):
    line = viz.plot_load_curve(
        np.linspace(0, 1, 17), -1e-3 * np.linspace(0, 2, 17), 17, show=False
    )
    assert line
