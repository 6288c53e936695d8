"""Multi-chip SPMD: element partitioning over a device mesh via `shard_map`.

The reference is single-process (SURVEY.md §2.4 — no MPI/NCCL/threads).
The TPU-native scaling design: shard *elements* across devices, replicate
the nodal DOF vectors.  Assembly is element-local, so the only collectives
are `psum`s of scattered nodal partials (internal force, preconditioner
blocks) riding ICI.  The adaptive Newton control flow is replicated — every
device runs the identical `lax.while_loop` schedule, so no host involvement
and no divergence.

Element order is preserved shard-major, so integration-point state (plastic
strain) shards consistently with geometry.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import assembly as asm
from ..ops.elements import ReferenceElement

ELEM_AXIS = "elems"


def make_device_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1D device mesh over the element axis."""
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    grid = mesh_utils.create_device_mesh((n,), devices=devs[:n])
    return Mesh(grid, (ELEM_AXIS,))


def pad_elements(
    coords: np.ndarray, elems: np.ndarray, n_shards: int
) -> Tuple[np.ndarray, int]:
    """Pad connectivity to a multiple of n_shards with degenerate elements.

    Padding elements reference node 0 with zero Jacobian contribution; they
    are made inert by zeroing their quadrature weights in `shard_geometry`.
    Returns (padded elems, n_real).
    """
    n_e = elems.shape[0]
    n_pad = (-n_e) % n_shards
    if n_pad == 0:
        return elems, n_e
    pad = np.zeros((n_pad, elems.shape[1]), elems.dtype)
    return np.concatenate([elems, pad], axis=0), n_e


def sharded_geometry(
    coords: jnp.ndarray,
    elems_padded: np.ndarray,
    n_real: int,
    ref: ReferenceElement,
    mesh: Mesh,
) -> asm.Geometry:
    """Compute geometry and lay it out sharded over the element axis.

    Padding elements get zero weight (inert in every reduction).
    """
    geom = asm.compute_geometry(coords, jnp.asarray(elems_padded), ref)
    n_e = elems_padded.shape[0]
    real = (jnp.arange(n_e) < n_real)[:, None]
    weight = jnp.where(real, geom.weight, 0.0)
    # padding elements are degenerate (singular Jacobian -> NaN gradients);
    # zero their B blocks so 0-weight masking can't leak NaNs
    B = jnp.where(real[:, :, None, None], geom.B, 0.0)
    geom = geom._replace(B=B)
    spec_e = NamedSharding(mesh, P(ELEM_AXIS))
    return asm.Geometry(
        B=jax.device_put(geom.B, spec_e),
        weight=jax.device_put(weight, spec_e),
        edofs=jax.device_put(geom.edofs, spec_e),
        n_nodes=geom.n_nodes,
    )


def element_shard_specs(mesh: Mesh):
    """(in_spec for Geometry, replicated spec) helpers for shard_map."""
    e = P(ELEM_AXIS)
    r = P()
    geom_spec = asm.Geometry(B=e, weight=e, edofs=e, n_nodes=None)
    return geom_spec, e, r


def sharded_stepper(mesh: Mesh, geom: asm.Geometry, build_fn):
    """Wrap a load-stepper builder in shard_map over the element axis.

    Args:
      build_fn: (local_geom, axis_name) -> run(U_it0, aux0, d_zeta0);
                typically a closure over `solve.newton.build_load_stepper`
                with solver="cg".

    Returns run(U_it0, aux0, d_zeta0) operating on replicated inputs with
    element state sharded.
    """
    e = P(ELEM_AXIS)
    r = P()

    def inner(B, weight, edofs, U_it0, aux0, d_zeta0):
        local = asm.Geometry(B=B, weight=weight, edofs=edofs, n_nodes=geom.n_nodes)
        run = build_fn(local, ELEM_AXIS)
        return run(U_it0, aux0, d_zeta0)

    from ..solve.newton import LoadSteppingResult

    out_specs = LoadSteppingResult(
        u=r, ep=e, zeta_hist=r, monitor_hist=r, n_steps=r,
        n_newton_total=r, zeta=r, d_zeta=r, n_plastic=r,
    )
    mapped = shard_map(
        inner,
        mesh=mesh,
        in_specs=(e, e, e, r, r, r),
        out_specs=out_specs,
        check_vma=False,
    )

    def run(U_it0, aux0, d_zeta0):
        return mapped(geom.B, geom.weight, geom.edofs, U_it0, aux0, d_zeta0)

    return run
