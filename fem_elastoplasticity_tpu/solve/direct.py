"""Dense direct solves on the free-DOF subspace (reference-parity path).

For the small validation meshes (<= a few thousand free DOFs) we assemble
the free-submatrix densely (`ops.assembly.assemble_dense_free`) and solve
with LAPACK-via-XLA.  This bit-matches the reference's
`np.linalg.solve(K[QQ^T], ...)` semantics (`tsx-tunnel/pythonFEM.py:1748`)
without materializing the boolean outer product.
"""
from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl


def solve_dense(K_free: jnp.ndarray, rhs_free: jnp.ndarray) -> jnp.ndarray:
    """General (LU) solve — used for the elastoplastic tangent, which can be
    semi-definite at apex points."""
    return jnp.linalg.solve(K_free, rhs_free)


def solve_dense_spd(K_free: jnp.ndarray, rhs_free: jnp.ndarray) -> jnp.ndarray:
    """Cholesky solve for SPD elastic stiffness."""
    c, lower = jsl.cho_factor(K_free)
    return jsl.cho_solve((c, lower), rhs_free)


def scatter_free(u_full: jnp.ndarray, free_flat: jnp.ndarray, u_free: jnp.ndarray):
    """Write free-DOF values back into the full DOF vector."""
    idx = jnp.nonzero(free_flat, size=u_free.shape[0])[0]
    return u_full.at[idx].set(u_free)
