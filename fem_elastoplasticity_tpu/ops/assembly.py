"""Element-batched assembly kernels (the hot path).

TPU-native redesign of the reference's scipy-sparse assembly
(`Elasticity2D/pythonFEM.py:368-477`): instead of a global sparse
strain-displacement matrix B (3*n_int x 2*n_n) and two sparse GEMMs, we keep
per-element dense tensors

    B       (n_e, n_q, 3, 2*n_p)   strain-displacement blocks
    weight  (n_e, n_q)             |det J| * w_q
    edofs   (n_e, 2*n_p)           interleaved global DOF indices

and express everything as einsum contractions (MXU) plus one
`segment_sum` scatter over shared nodes (the only bandwidth-critical op).
The integration-point order (element-major, quadrature-minor) matches the
reference, so flattened (n_e*n_q, ...) arrays align index-for-index with the
reference's (..., n_int) arrays.

All functions here are jittable and differentiable; geometry precomputation
is itself a jitted batch of tiny matrix ops.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .elements import ReferenceElement, SurfaceElement


class Geometry(NamedTuple):
    """Precomputed per-element quadrature geometry (pytree of arrays).

    B:       (n_e, n_q, 3, 2*n_p) strain-displacement blocks
    weight:  (n_e, n_q) quadrature weights including |det J|
    edofs:   (n_e, 2*n_p) int32 global DOF indices (2*node + component)
    n_nodes: static int — number of mesh nodes
    """

    B: jnp.ndarray
    weight: jnp.ndarray
    edofs: jnp.ndarray
    n_nodes: int

    @property
    def n_elems(self) -> int:
        return self.B.shape[0]

    @property
    def n_q(self) -> int:
        return self.B.shape[1]

    @property
    def n_int(self) -> int:
        return self.B.shape[0] * self.B.shape[1]


def element_dofs(elems: jnp.ndarray) -> jnp.ndarray:
    """(n_e, n_p) node indices -> (n_e, 2*n_p) interleaved DOF indices.

    DOF numbering 2*node+comp matches the reference's column-major flatten
    of (2, n_n) arrays (`tsx-tunnel/pythonFEM.py:1741-1748`).
    """
    e = jnp.asarray(elems)
    return jnp.stack([2 * e, 2 * e + 1], axis=-1).reshape(e.shape[0], -1)


def compute_geometry(
    coords: jnp.ndarray, elems: jnp.ndarray, ref: ReferenceElement
) -> Geometry:
    """Jacobians, physical gradients, B blocks and weights for all elements.

    Math parity with `get_elastic_stiffness_matrix`
    (`Elasticity2D/pythonFEM.py:385-446`): J = [[sum x*dN1, sum y*dN1],
    [sum x*dN2, sum y*dN2]], dphi = J^{-1} dN, weight = |det J| * w_q.
    """
    dtype = jnp.asarray(coords).dtype
    xe = jnp.asarray(coords)[jnp.asarray(elems)]  # (n_e, n_p, 2)
    dN = jnp.asarray(ref.dN, dtype)  # (n_q, n_p, 2)

    # Jacobian J[e,q,i,j] = sum_p dN[q,p,i] * xe[e,p,j]
    J = jnp.einsum("qpi,epj->eqij", dN, xe)
    det = J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]
    inv = (
        jnp.stack(
            [
                jnp.stack([J[..., 1, 1], -J[..., 0, 1]], axis=-1),
                jnp.stack([-J[..., 1, 0], J[..., 0, 0]], axis=-1),
            ],
            axis=-2,
        )
        / det[..., None, None]
    )
    # physical gradients dphi[e,q,p,i] = inv[e,q,i,j] * dN[q,p,j]
    dphi = jnp.einsum("eqij,qpj->eqpi", inv, dN)

    weight = jnp.abs(det) * jnp.asarray(ref.w, dtype)[None, :]

    n_e, n_q, n_p, _ = dphi.shape
    B = jnp.zeros((n_e, n_q, 3, n_p, 2), dtype)
    B = B.at[:, :, 0, :, 0].set(dphi[..., 0])
    B = B.at[:, :, 1, :, 1].set(dphi[..., 1])
    B = B.at[:, :, 2, :, 0].set(dphi[..., 1])
    B = B.at[:, :, 2, :, 1].set(dphi[..., 0])
    B = B.reshape(n_e, n_q, 3, 2 * n_p)

    return Geometry(B=B, weight=weight, edofs=element_dofs(elems), n_nodes=coords.shape[0])


# ---------------------------------------------------------------------------
# strain / stress / force / stiffness contractions
# ---------------------------------------------------------------------------
def gather_element_dofs(geom: Geometry, u: jnp.ndarray) -> jnp.ndarray:
    """u (2*n_n,) -> per-element DOF vectors (n_e, 2*n_p)."""
    return u[geom.edofs]


def strains(geom: Geometry, u: jnp.ndarray) -> jnp.ndarray:
    """Total strain at integration points: (n_e, n_q, 3).

    Flattened (n_e*n_q, 3) matches the reference's `E = B @ U` reshaped
    (3, n_int) (`tsx-tunnel/pythonFEM.py:1771`) transposed.
    """
    ue = gather_element_dofs(geom, u)
    return jnp.einsum("eqak,ek->eqa", geom.B, ue)


def internal_force(
    geom: Geometry, s3: jnp.ndarray, axis_name: Optional[str] = None
) -> jnp.ndarray:
    """F = B^T (weight * s) scattered to (2*n_n,).

    Args:
      s3: (n_e, n_q, 3) stress (first three Voigt components).
      axis_name: if set, `geom` holds this device's element shard and the
        scattered nodal partials are `psum`-reduced over the named mesh
        axis (SPMD assembly: element-local work + one ICI collective).
    Parity: `tsx-tunnel/pythonFEM.py:1778`.
    """
    fe = jnp.einsum("eqak,eqa->ek", geom.B, geom.weight[..., None] * s3)
    f = jax.ops.segment_sum(
        fe.reshape(-1), geom.edofs.reshape(-1), num_segments=2 * geom.n_nodes
    )
    if axis_name is not None:
        f = jax.lax.psum(f, axis_name)
    return f


def element_stiffness(geom: Geometry, d: jnp.ndarray) -> jnp.ndarray:
    """Per-element stiffness K_e = sum_q w_q B^T D B: (n_e, 2*n_p, 2*n_p).

    Args: d (n_e, n_q, 3, 3) material tangent at integration points.
    """
    wd = geom.weight[..., None, None] * d
    return jnp.einsum("eqai,eqab,eqbj->eij", geom.B, wd, geom.B)


def tangent_matvec(
    geom: Geometry, d: jnp.ndarray, v: jnp.ndarray, axis_name: Optional[str] = None
) -> jnp.ndarray:
    """Matrix-free K v: gather -> strain -> D -> B^T -> scatter.

    This is the CG workhorse: no sparse matrix is ever materialized
    (SURVEY.md §2.4 table: replaces scipy spsolve/CSR matvec).  With
    `axis_name`, v is replicated, elements are sharded, and the result is
    psum-reduced — the only cross-device communication in the solver.
    """
    e = strains(geom, v)
    s = jnp.einsum("eqab,eqb->eqa", d, e)
    return internal_force(geom, s, axis_name=axis_name)


def node_block_diagonal(
    geom: Geometry, d: jnp.ndarray, axis_name: Optional[str] = None
) -> jnp.ndarray:
    """2x2 nodal diagonal blocks of K for block-Jacobi preconditioning.

    Returns (n_n, 2, 2).
    """
    n_p2 = geom.edofs.shape[1]
    n_p = n_p2 // 2
    ke = element_stiffness(geom, d)
    ke = ke.reshape(geom.n_elems, n_p, 2, n_p, 2)
    diag = jnp.einsum("epipj->epij", ke)  # (n_e, n_p, 2, 2)
    nodes = geom.edofs[:, ::2] // 2  # (n_e, n_p)
    out = jax.ops.segment_sum(
        diag.reshape(-1, 2, 2), nodes.reshape(-1), num_segments=geom.n_nodes
    )
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


# ---------------------------------------------------------------------------
# dense assembly on the free-DOF subspace (reference-parity direct solves)
# ---------------------------------------------------------------------------
def free_dof_map(free_mask: np.ndarray) -> Tuple[np.ndarray, int]:
    """free_mask (n_n, 2) bool -> (map (2*n_n,) int32, n_free).

    Maps each global DOF to its position among free DOFs, or to n_free
    (a trash slot) if constrained.  Free DOFs are ordered by global DOF
    index, which equals the reference's column-major (2, n_n) masking order
    (`tsx-tunnel/pythonFEM.py:1741-1744`).
    """
    flat = np.asarray(free_mask).reshape(-1)
    n_free = int(flat.sum())
    m = np.full(flat.shape, n_free, dtype=np.int32)
    m[flat] = np.arange(n_free, dtype=np.int32)
    return m, n_free


def assemble_dense_free(
    ke: jnp.ndarray, edofs: jnp.ndarray, fmap: jnp.ndarray, n_free: int
) -> jnp.ndarray:
    """Scatter element matrices into the dense free-DOF stiffness.

    Returns (n_free, n_free); constrained rows/cols fall into a trash
    row/col that is sliced away.  Equivalent to the reference's
    `K[Q x Q^T]` dense masking (`tsx-tunnel/pythonFEM.py:1741-1744`)
    without materializing the n^2 boolean outer product.
    """
    fd = fmap[edofs]  # (n_e, 2*n_p)
    K = jnp.zeros((n_free + 1, n_free + 1), ke.dtype)
    K = K.at[fd[:, :, None], fd[:, None, :]].add(ke)
    return K[:n_free, :n_free]


def assemble_dense_full(ke: jnp.ndarray, edofs: jnp.ndarray, n_dofs: int) -> jnp.ndarray:
    """Scatter element matrices into the full dense stiffness (2n_n, 2n_n)."""
    K = jnp.zeros((n_dofs, n_dofs), ke.dtype)
    return K.at[edofs[:, :, None], edofs[:, None, :]].add(ke)


# ---------------------------------------------------------------------------
# load vectors
# ---------------------------------------------------------------------------
def volume_force_vector(
    geom: Geometry, ref: ReferenceElement, f: jnp.ndarray
) -> jnp.ndarray:
    """Volume load vector: scatter of N^T (w * f) — (2*n_n,).

    Parity: `get_vector_volume` (`Elasticity2D/pythonFEM.py:246-292`).
    Args: f (2,) constant body force, or (n_e, n_q, 2) field.
    """
    dtype = geom.B.dtype
    N = jnp.asarray(ref.N, dtype)  # (n_q, n_p)
    f = jnp.asarray(f, dtype)
    if f.ndim == 1:
        f = jnp.broadcast_to(f, (geom.n_elems, geom.n_q, 2))
    vals = jnp.einsum("qp,eq,eqc->epc", N, geom.weight, f)  # (n_e, n_p, 2)
    return jax.ops.segment_sum(
        vals.reshape(-1),
        geom.edofs.reshape(geom.n_elems, -1, 2).reshape(-1),
        num_segments=2 * geom.n_nodes,
    )


def traction_force_vector(
    coords: jnp.ndarray,
    edges: jnp.ndarray,
    surf: SurfaceElement,
    t: jnp.ndarray,
    n_nodes: int,
) -> jnp.ndarray:
    """Traction load vector over boundary edges — (2*n_n,).

    Parity: `get_vector_traction` (`Elasticity2D/pythonFEM.py:295-364`),
    including its x-projected line measure |j11| = |sum x_p dN_p| (the
    reference integrates with the x-extent of the edge, valid for the
    axis-aligned Neumann faces of its benchmarks).
    """
    dtype = jnp.asarray(coords).dtype
    xe = jnp.asarray(coords)[jnp.asarray(edges)]  # (n_s, n_p_s, 2)
    N = jnp.asarray(surf.N, dtype)  # (n_q, n_p_s)
    dN = jnp.asarray(surf.dN, dtype)  # (n_q, n_p_s)
    j11 = jnp.einsum("qp,sp->sq", dN, xe[..., 0])
    w = jnp.abs(j11) * jnp.asarray(surf.w, dtype)[None, :]
    t = jnp.broadcast_to(jnp.asarray(t, dtype), (edges.shape[0], surf.n_q, 2))
    vals = jnp.einsum("qp,sq,sqc->spc", N, w, t)
    dofs = element_dofs(edges)  # (n_s, 2*n_p_s)
    return jax.ops.segment_sum(
        vals.reshape(-1), dofs.reshape(-1), num_segments=2 * n_nodes
    )


# ---------------------------------------------------------------------------
# integration-point -> node projection
# ---------------------------------------------------------------------------
def project_to_nodes(
    geom: Geometry, ref: ReferenceElement, q_int: jnp.ndarray
) -> jnp.ndarray:
    """Volume-weighted projection of a qp field to nodes: (n_n,).

    Parity: `transform` (`tsx-tunnel/pythonFEM.py:1160-1216`): the nodal
    value is sum_e sum_q w*q / sum_e sum_q w over elements touching the
    node.  Note the reference spreads each integration point's value to all
    element nodes with unit (not basis) weighting; we reproduce that.
    """
    n_p = geom.edofs.shape[1] // 2
    nodes = geom.edofs[:, ::2] // 2  # (n_e, n_p)
    wq = geom.weight * q_int.reshape(geom.n_elems, geom.n_q)
    num_e = jnp.broadcast_to(wq.sum(axis=1)[:, None], (geom.n_elems, n_p))
    den_e = jnp.broadcast_to(
        geom.weight.sum(axis=1)[:, None], (geom.n_elems, n_p)
    )
    num = jax.ops.segment_sum(
        num_e.reshape(-1), nodes.reshape(-1), num_segments=geom.n_nodes
    )
    den = jax.ops.segment_sum(
        den_e.reshape(-1), nodes.reshape(-1), num_segments=geom.n_nodes
    )
    return num / den
