"""End-to-end linear elasticity benchmark tests.

Stored-energy anchors are measured from the unmodified reference
(BASELINE.md / SURVEY.md §8.3).
"""
import numpy as np
import pytest

from fem_elastoplasticity_tpu.models.config import ElasticityConfig
from fem_elastoplasticity_tpu.models.elasticity import solve
from fem_elastoplasticity_tpu.ops.elements import ElementType


@pytest.mark.parametrize(
    "etype,level,expected",
    [
        (ElementType.P1, 1, 2786.3472189077333),
        (ElementType.P1, 2, 2717.549266620117),
        (ElementType.Q1, 1, 2728.399597423172),
        (ElementType.Q2, 1, 2642.1861301492227),
    ],
)
def test_stored_energy_anchors(etype, level, expected):
    """P1/Q2 anchors from SURVEY.md §8.3; the Q1 anchor was measured from
    the unmodified reference this round (`elasticity_fem(Q1, 1)` prints
    stored energy 2728.399597423172 — reference parity for the Q1 element
    family, `Elasticity2D/pythonFEM.py:1052`)."""
    r = solve(ElasticityConfig(etype=etype, level=level))
    assert abs(float(r.energy) - expected) / abs(expected) < 1e-10


def test_p2_hole_mesh_supported():
    """The reference's P2 hole-domain path crashes (shape-mismatch transpose,
    Elasticity2D/pythonFEM.py:685-698); ours must produce a sane solution."""
    r = solve(ElasticityConfig(etype=ElementType.P2, level=1))
    assert np.isfinite(float(r.energy))
    # energy between the P1 and Q2 values (finer approximations are softer)
    assert 2600.0 < float(r.energy) < 2800.0


def test_dirichlet_values_applied():
    r = solve(ElasticityConfig(etype=ElementType.P1, level=1))
    mesh = r.mesh
    bottom = mesh.coords[:, 1] == 0.0
    np.testing.assert_allclose(np.asarray(r.u)[bottom, 0], 0.5, atol=1e-12)


def test_energy_decreases_with_refinement():
    """Minimum-energy principle: finer meshes can only lower the functional."""
    e1 = float(solve(ElasticityConfig(etype=ElementType.P1, level=1)).energy)
    e2 = float(solve(ElasticityConfig(etype=ElementType.P1, level=2)).energy)
    assert e2 < e1


def test_q1_refinement_monotone():
    """Q1 end-to-end at two levels (reference accepts Q1, E:1052)."""
    e1 = float(solve(ElasticityConfig(etype=ElementType.Q1, level=1)).energy)
    e2 = float(solve(ElasticityConfig(etype=ElementType.Q1, level=2)).energy)
    assert e2 < e1
    # bracketed by the stiffer P1 and softer Q2 discretizations
    p1 = float(solve(ElasticityConfig(etype=ElementType.P1, level=1)).energy)
    q2 = float(solve(ElasticityConfig(etype=ElementType.Q2, level=1)).energy)
    assert q2 < e1 < p1


def test_cg_solver_matches_dense():
    """solver="cg" (matrix-free block-Jacobi PCG) reproduces the dense
    energies to machine precision at parity sizes."""
    for et in (ElementType.P1, ElementType.Q2):
        e_d = float(solve(ElasticityConfig(etype=et, level=1)).energy)
        e_c = float(
            solve(ElasticityConfig(etype=et, level=1, solver="cg")).energy
        )
        assert abs(e_c - e_d) / abs(e_d) < 1e-11


def test_cg_solver_scales_past_dense_cliff():
    """Level 3 (the size where the reference's dense pipeline takes
    >10 minutes, E:1151-1159) solves in seconds matrix-free, and the
    energy keeps decreasing under refinement."""
    e2 = float(solve(ElasticityConfig(level=2)).energy)
    e3 = float(solve(ElasticityConfig(level=3, solver="cg")).energy)
    assert np.isfinite(e3)
    assert e3 < e2
