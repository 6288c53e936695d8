"""Multi-chip SPMD: element partitioning over a device mesh via `shard_map`.

The reference is single-process (SURVEY.md §2.4 — no MPI/NCCL/threads).
The TPU-native scaling design: shard *integration points / elements* across
devices, replicate the nodal DOF vectors.  Assembly is element-local, so
the only collectives are `psum`s of scattered nodal partials (internal
force, preconditioner blocks) riding ICI.  The adaptive Newton control
flow is replicated — every device runs the identical `lax.while_loop`
schedule, so no host involvement and no divergence.

Geometry is lane-major (see `ops.assembly`); the shard axis is the minor
integration-point axis of B/weight and the element axis of the DOF maps.
Padding slots (zero B, zero weight) are inert in every reduction.
"""
from __future__ import annotations

from typing import Optional

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


def sharded_geometry(
    coords: jnp.ndarray,
    elems: np.ndarray,
    ref: ReferenceElement,
    mesh: Mesh,
) -> asm.Geometry:
    """Compute geometry padded/sharded over the device mesh.

    Element count is padded so each shard holds an equal, lane-aligned
    block of whole elements; the padding is inert (zero B and weight).
    """
    n_shards = mesh.devices.size
    n_e = elems.shape[0]
    n_q = ref.n_q
    per_shard = -(-n_e // n_shards)
    while (per_shard * n_q) % asm.LANE_PAD != 0:
        per_shard += 1
    geom = asm.compute_geometry(coords, elems, ref, pad_to=per_shard * n_shards * n_q)

    spec = lambda *p: NamedSharding(mesh, P(*p))
    return asm.Geometry(
        B=jax.device_put(geom.B, spec(None, None, ELEM_AXIS)),
        weight=jax.device_put(geom.weight, spec(ELEM_AXIS)),
        edofs=jax.device_put(geom.edofs, spec(ELEM_AXIS, None)),
        edofs_t=jax.device_put(geom.edofs_t, spec(None, ELEM_AXIS)),
        n_nodes=geom.n_nodes,
        n_q=geom.n_q,
        n_real=geom.n_real,
    )


def sharded_stepper(mesh: Mesh, geom: asm.Geometry, build_fn):
    """Wrap a load-stepper builder in shard_map over the element axis.

    Args:
      build_fn: (local_geom, axis_name, *extra) -> run(U_it0, aux0,
                d_zeta0); typically a closure over
                `solve.newton.build_load_stepper` with solver="cg".

    Returns run(U_it0, aux0, d_zeta0, *extra) on replicated inputs (the
    `extra` arrays — free-DOF indices, e0 directions, etc. — must be passed
    here rather than closed over: the axon TPU runtime degrades on
    programs with embedded array constants).  Plastic-strain state stays
    sharded across devices for the whole solve.
    """
    e3 = P(None, None, ELEM_AXIS)
    e1 = P(ELEM_AXIS)
    e_r = P(ELEM_AXIS, None)
    e_c = P(None, ELEM_AXIS)
    r = P()

    def inner(B, weight, edofs, edofs_t, U_it0, aux0, d_zeta0, *extra):
        local = asm.Geometry(
            B=B, weight=weight, edofs=edofs, edofs_t=edofs_t,
            n_nodes=geom.n_nodes, n_q=geom.n_q, n_real=geom.n_real,
        )
        run = build_fn(local, ELEM_AXIS, *extra)
        return run(U_it0, aux0, d_zeta0)

    from ..solve.newton import LoadSteppingResult

    out_specs = LoadSteppingResult(
        u=r, ep=e_c, zeta_hist=r, monitor_hist=r, n_steps=r,
        n_newton_total=r, zeta=r, d_zeta=r, n_plastic=r,
        u_old=r, u_it=r, d_zeta_old=r, aux=r,
    )

    def run(U_it0, aux0, d_zeta0, *extra):
        mapped = shard_map(
            inner,
            mesh=mesh,
            in_specs=(e3, e1, e_r, e_c, r, r, r) + (r,) * len(extra),
            out_specs=out_specs,
            check_vma=False,
        )
        return mapped(
            geom.B, geom.weight, geom.edofs, geom.edofs_t,
            U_it0, aux0, d_zeta0, *extra,
        )

    return run
