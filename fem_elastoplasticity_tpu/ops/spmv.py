"""Assembled sparse operators: RCM locality + windowed ELL matvec kernel.

Round-3 performance core.  The matrix-free `ops.assembly.tangent_matvec`
is bottlenecked on this TPU runtime by XLA's gather/scatter lowering,
which serializes at ~8 ns/element (measured: an L5 matvec costs 83 ms
against a ~0.4 ms bandwidth bound; gather 41 ms + scatter 44 ms of it).
The Mosaic primitive that IS fast is `tpu.dynamic_gather` along lanes —
a within-row 128-wide gather at vector rate (~0.7 ns/elem measured).

This module exploits it with an *assembled* operator in ELL form:

  1. nodes are renumbered with reverse Cuthill-McKee (host, scipy), so
     every matrix row's columns lie within the RCM bandwidth;
  2. the elastic stiffness is assembled ONCE on the host (numpy/scipy —
     replaces the reference's per-call scipy assembly,
     `Elasticity2D/pythonFEM.py:368-477`) and stored as padded ELL
     (deg_max column slots per row);
  3. `ell_matvec` runs a Pallas kernel: output rows are processed in
     groups of RPG*128 DOFs sharing one window of J consecutive
     128-lane rows of the input vector (J ~ bandwidth/128); each window
     row is combined via a masked lane-gather, so the kernel never
     issues a serialized arbitrary gather.

Measured at level 5 (910k DOFs, 12.7M nnz): 9.8 ms/matvec vs 83 ms for
the matrix-free XLA path — and the ELL form also removes the per-CG-
iteration re-assembly work.  The Drucker-Prager tangent is recovered as
K_elastic + a low-rank plastic correction (the return map leaves
non-plastic points exactly elastic), see `solve/newton.py`.

All jitted entry points take arrays as arguments (axon constant
pathology — `ops/assembly.py` docstring).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .elements import ReferenceElement

RPG = 8    # output rows (x128 DOFs) per window group
GPB = 16   # groups per kernel block


# ---------------------------------------------------------------------------
# host-side: locality ordering + elastic CSR assembly
# ---------------------------------------------------------------------------
def rcm_node_order(elems: np.ndarray, n_nodes: int) -> np.ndarray:
    """Reverse Cuthill-McKee node ordering from element connectivity.

    Returns `order` with order[k] = old node id placed at new position k.
    Bandwidth O(sqrt(n)) on planar meshes — the window size J of the ELL
    kernel is bandwidth/128, so locality here directly bounds kernel cost.
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    elems = np.asarray(elems)
    n_p = elems.shape[1]
    rows, cols = [], []
    for a in range(n_p):
        for b in range(a + 1, n_p):
            rows.append(elems[:, a])
            cols.append(elems[:, b])
    i = np.concatenate(rows + cols)
    j = np.concatenate(cols + rows)
    adj = sp.coo_matrix(
        (np.ones(i.shape[0], np.int8), (i, j)), shape=(n_nodes, n_nodes)
    ).tocsr()
    return np.asarray(reverse_cuthill_mckee(adj, symmetric_mode=True))


def permute_mesh(coords: np.ndarray, elems: np.ndarray, order: np.ndarray):
    """Apply a node order: returns (coords', elems', new_of_old)."""
    n_n = coords.shape[0]
    new_of_old = np.empty(n_n, np.int64)
    new_of_old[order] = np.arange(n_n)
    return coords[order], new_of_old[np.asarray(elems)], new_of_old


def host_element_stiffness(
    coords: np.ndarray,
    elems: np.ndarray,
    ref: ReferenceElement,
    d33: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy K_e = sum_q w_q B^T D B — setup-time oracle-grade assembly.

    Same math as `ops.assembly.compute_geometry`+`element_stiffness`
    (`Elasticity2D/pythonFEM.py:385-470` parity) but pure numpy so it
    never touches the accelerator.  d33: (3, 3) constant material tangent
    (elastic).  Returns (ke (n_e, 2n_p, 2n_p) f64, edofs (n_e, 2n_p)).
    """
    coords = np.asarray(coords, np.float64)
    elems = np.asarray(elems)
    xe = coords[elems]                       # (n_e, n_p, 2)
    dN = np.asarray(ref.dN, np.float64)      # (n_q, n_p, 2)
    n_q, n_p, _ = dN.shape
    n_e = elems.shape[0]
    J = np.einsum("qpi,epj->eqij", dN, xe)
    det = J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]
    inv = np.empty_like(J)
    inv[..., 0, 0] = J[..., 1, 1]
    inv[..., 0, 1] = -J[..., 0, 1]
    inv[..., 1, 0] = -J[..., 1, 0]
    inv[..., 1, 1] = J[..., 0, 0]
    inv /= det[..., None, None]
    dphi = np.einsum("eqij,qpj->eqpi", inv, dN)   # (n_e, n_q, n_p, 2)
    w = np.abs(det) * np.asarray(ref.w, np.float64)[None, :]

    B = np.zeros((n_e, n_q, 3, 2 * n_p))
    B[:, :, 0, 0::2] = dphi[..., 0]
    B[:, :, 1, 1::2] = dphi[..., 1]
    B[:, :, 2, 0::2] = dphi[..., 1]
    B[:, :, 2, 1::2] = dphi[..., 0]
    DB = np.einsum("ab,eqbj->eqaj", np.asarray(d33, np.float64), B)
    ke = np.einsum("eqai,eqaj,eq->eij", B, DB, w)
    edofs = np.stack([2 * elems, 2 * elems + 1], axis=-1).reshape(n_e, -1)
    return ke, edofs


def assemble_csr(ke: np.ndarray, edofs: np.ndarray, n2: int):
    """Scatter element matrices into a scipy CSR (setup-time only)."""
    import scipy.sparse as sp

    n_e, n2p, _ = ke.shape
    rows = np.repeat(edofs, n2p, axis=1).reshape(-1)
    cols = np.tile(edofs, (1, n2p)).reshape(-1)
    K = sp.coo_matrix((ke.reshape(-1), (rows, cols)), shape=(n2, n2)).tocsr()
    K.sum_duplicates()
    return K


def apply_bc_csr(K, free_flat: np.ndarray):
    """Zero constrained rows/cols, unit diagonal (reference masking
    semantics without the Q Q^T outer product, T:1741-1744).

    Scales `K.data` in place rather than multiplying by diagonal
    matrices: scipy's sparse matmul PRUNES zero-valued results, and the
    full element-connectivity pattern must survive — structured meshes
    carry exact zeros in the ELASTIC stiffness (axis-aligned xy cross
    terms) at positions the PLASTIC tangent needs (the static-structure
    value refresh scatters into them, `element_corr_dest`).
    """
    free = np.asarray(free_flat).reshape(-1)
    Kf = K.tocsr().copy()
    Kf.sum_duplicates()
    rows = np.repeat(np.arange(Kf.shape[0]), np.diff(Kf.indptr))
    Kf.data = Kf.data * (free[rows] & free[Kf.indices])
    # unit diagonal at constrained DOFs, written in place (scipy 1.17
    # binary ops like `+ diags(...)` ALSO prune zero entries) — every
    # diagonal is structurally present: each DOF belongs to an element
    con = np.nonzero(~free)[0]
    kd = csr_lookup(Kf, con, con)
    assert (kd >= 0).all(), "missing diagonal entries in the FEM pattern"
    Kf.data[kd] = 1.0
    return Kf


# ---------------------------------------------------------------------------
# ELL build
# ---------------------------------------------------------------------------
class EllMeta(NamedTuple):
    """Static metadata of a windowed-ELL operator (hashable, jit-static)."""

    n2: int        # output (row) count
    n_in: int      # input (column) count — equals n2 for square operators
    n2r: int       # padded row count (multiple of RPG*GPB)
    deg: int       # ELL slots per row
    J: int         # window rows per group
    n_groups: int
    vrows: int     # input-vector rows incl. J guard rows
    n_overflow: int  # COO entries outside the window cap (XLA side path)


def build_ell(K_csr, dtype=np.float32, max_overflow_frac=0.005):
    """CSR -> windowed-ELL arrays for `ell_matvec`.

    Works for rectangular operators too (e.g. multigrid prolongation /
    restriction): rows index the output, columns the input vector.

    The window size J is chosen as the smallest cap leaving at most
    `max_overflow_frac` of the entries outside their group's window;
    those spill into a COO side list applied with plain XLA gather /
    scatter (serialized, but tiny), so a handful of long-range rows
    cannot inflate every group's kernel cost.

    Returns (arrays dict, EllMeta).  arrays:
      w0     (n_groups,) i32          window base row per group (SMEM)
      li     (n_groups, deg*RPG, 128) i32 window-local column index
      vals   (n_groups, deg*RPG, 128) f32 matrix values (0 on padding)
      ov_r/ov_c/ov_v                  overflow COO (present if any)
    """
    n2, n_in = K_csr.shape
    deg_arr = np.diff(K_csr.indptr)
    deg_full = int(max(deg_arr.max(), 1))
    # row-degree cap: ELL pads EVERY row to the slot count, so a handful
    # of high-valence rows can inflate the arrays severalfold (measured:
    # the tsx S operator at level 4 carried deg=142 for a 99.9th-
    # percentile degree of ~30).  Spill the excess entries of outlier
    # rows into the overflow side path (exact: slot-df or XLA COO).
    deg = deg_full
    cands = sorted(
        {int(np.quantile(deg_arr, q)) for q in (0.9, 0.99, 0.999)}
        | {deg_full}
    )
    for cand in cands:
        cand = max(cand, 1)
        n_spill = int(np.maximum(deg_arr - cand, 0).sum())
        if n_spill <= 0.5 * max_overflow_frac * max(K_csr.nnz, 1):
            deg = cand
            break
    n2r = (n2 + 127) // 128
    n2r = ((n2r + RPG * GPB - 1) // (RPG * GPB)) * (RPG * GPB)
    n2_pad = n2r * 128
    in_rows = max((n_in + 127) // 128, 1)

    ell_vals = np.zeros((deg, n2_pad), dtype)
    ell_cols = np.full((deg, n2_pad), -1, np.int64)  # -1 = padding slot
    idx = np.arange(K_csr.nnz)
    rowid = np.repeat(np.arange(n2), deg_arr)
    slot = idx - K_csr.indptr[rowid]
    keep_e = slot < deg
    sp_rows = rowid[~keep_e]
    sp_cols = K_csr.indices[~keep_e].astype(np.int64)
    sp_vals = K_csr.data[~keep_e].astype(dtype)
    ell_vals[slot[keep_e], rowid[keep_e]] = K_csr.data[keep_e].astype(dtype)
    ell_cols[slot[keep_e], rowid[keep_e]] = K_csr.indices[keep_e]

    n_groups = n2r // RPG
    cols3 = ell_cols.reshape(deg, n_groups, RPG * 128)
    colr = np.where(cols3 >= 0, cols3 // 128, -1)
    valid = cols3 >= 0
    n_valid = int(valid.sum())
    # robust window center per group: median source row of real entries
    med = np.full(n_groups, 0.0)
    any_valid = valid.any(axis=(0, 2))
    masked = np.where(valid, colr, np.nan).transpose(1, 0, 2).reshape(
        n_groups, -1
    )
    with np.errstate(all="ignore"):
        med_all = np.nanmedian(masked, axis=1)
    med[any_valid] = med_all[any_valid]

    for J in (4, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256):
        w0 = np.clip(
            np.round(med).astype(np.int64) - J // 2, 0, max(in_rows - 1, 0)
        )
        within = valid & (colr >= w0[None, :, None]) & (
            colr < (w0 + J)[None, :, None]
        )
        n_ov = n_valid - int(within.sum())
        if n_ov <= max_overflow_frac * max(n_valid, 1) or J >= in_rows:
            break

    w0 = w0.astype(np.int32)
    keep = within
    li64 = cols3 - (w0[None, :, None].astype(np.int64) * 128)
    li = np.where(keep, li64, 0).astype(np.int32)
    vals3 = np.where(keep, ell_vals.reshape(deg, n_groups, RPG * 128), 0)

    # overflow COO: window outliers + the degree-cap spill
    ov = valid & ~keep
    if n_ov:
        d_ix, g_ix, p_ix = np.nonzero(ov)
        ov_rows = (g_ix * (RPG * 128) + p_ix).astype(np.int64)
        ov_cols = cols3[d_ix, g_ix, p_ix]
        ov_vals = ell_vals.reshape(deg, n_groups, RPG * 128)[
            d_ix, g_ix, p_ix
        ]
    else:
        ov_rows = np.zeros(0, np.int64)
        ov_cols = np.zeros(0, np.int64)
        ov_vals = np.zeros(0, dtype)
    if sp_rows.size:
        ov_rows = np.concatenate([ov_rows, sp_rows.astype(np.int64)])
        ov_cols = np.concatenate([ov_cols, sp_cols])
        ov_vals = np.concatenate([ov_vals, sp_vals])
        n_ov = int(ov_rows.size)

    li = np.ascontiguousarray(
        li.reshape(deg, n_groups, RPG, 128).transpose(1, 0, 2, 3)
    ).reshape(n_groups, deg * RPG, 128)
    vals = np.ascontiguousarray(
        vals3.reshape(deg, n_groups, RPG, 128).transpose(1, 0, 2, 3)
    ).reshape(n_groups, deg * RPG, 128)

    meta = EllMeta(
        n2=n2, n_in=n_in, n2r=n2r, deg=deg, J=int(J), n_groups=n_groups,
        vrows=in_rows + int(J), n_overflow=int(n_ov),
    )
    arrays = dict(
        w0=jnp.asarray(w0), li=jnp.asarray(li), vals=jnp.asarray(vals)
    )
    if n_ov:
        arrays["ov_r"] = jnp.asarray(ov_rows.astype(np.int32))
        arrays["ov_c"] = jnp.asarray(ov_cols.astype(np.int32))
        arrays["ov_v"] = jnp.asarray(ov_vals, jnp.float32)
    return arrays, meta


def build_ell_elastic(
    coords: np.ndarray,
    elems: np.ndarray,
    ref: ReferenceElement,
    shear: float,
    bulk: float,
    free: Optional[np.ndarray] = None,
    dtype=np.float32,
    fmt: str = "ell",
):
    """Elastic-stiffness assembled sparse operator in one call (host setup).

    `free`: (n_n, 2) bool mask — constrained rows/cols are zeroed with
    unit diagonal so the operator is SPD on the whole space.
    `fmt`: "ell" (windowed-ELL) or "slot" (compacted-slot; 2.6x faster
    at 910k DOFs — see `build_slot`).
    Returns (arrays, meta, K_csr) — the CSR is kept for diag extraction.
    """
    dd = 4.0 * shear / 3.0 + bulk
    oo = -2.0 * shear / 3.0 + bulk
    d33 = np.array([[dd, oo, 0.0], [oo, dd, 0.0], [0.0, 0.0, shear]])
    ke, edofs = host_element_stiffness(coords, elems, ref, d33)
    n2 = 2 * coords.shape[0]
    K = assemble_csr(ke, edofs, n2)
    if free is not None:
        K = apply_bc_csr(K, np.asarray(free).reshape(-1))
    arrays, meta = build_sparse(K, dtype, fmt=fmt)
    return arrays, meta, K


def build_sparse(K_csr, dtype=np.float32, fmt: str = "ell"):
    """CSR -> (arrays, meta) in the requested kernel format.

    "rslot" = ragged compacted-slot (chunk-compacted value stream; falls
    back to the dense slot layout when chunking saves <15% — see
    SlotMeta).  Consumers dispatch on the meta, so the formats mix
    freely within one hierarchy.
    """
    if fmt == "rslot":
        return build_slot(K_csr, dtype, ragged=True, u=_RAGGED_U)
    if fmt == "slot":
        return build_slot(K_csr, dtype)
    assert fmt == "ell", fmt
    return build_ell(K_csr, dtype)


def sp_matvec(arrays: dict, meta, v: jnp.ndarray) -> jnp.ndarray:
    """Format-generic K v: dispatches on the static meta type."""
    if isinstance(meta, ShardedMeta):
        return _sharded_matvec(arrays, meta, v)
    if isinstance(meta, SlotMeta):
        return slot_matvec(arrays, meta, v)
    return ell_matvec(arrays, meta, v)


def diag_blocks_csr(K_csr, n_n: int) -> np.ndarray:
    """(n_n, 2, 2) nodal diagonal blocks from CSR (host, for smoothers)."""
    out = np.zeros((n_n, 2, 2))
    K = K_csr.tocsr()
    for di in range(2):
        for dj in range(2):
            out[:, di, dj] = K[di::2, dj::2].diagonal()
    return out


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------
def _ell_kernel(meta: EllMeta, unroll: bool = True):
    J = meta.J

    def kern(w0_ref, li_ref, vals_ref, v_ref, o_ref):
        import jax.experimental.pallas as pl

        blk = pl.program_id(0)
        DR = li_ref.shape[1]

        def group_body(g, _):
            w = w0_ref[blk * GPB + g]
            lid = li_ref[g]                      # (deg*RPG, 128)
            r = lid >> 7
            c = lid & 127

            # static unroll over the window (J is meta-static): Mosaic
            # pipelines the row loads across iterations — same cure as
            # the slot kernel's _slot_iter (6.3x measured there)
            def j_body(jj, got):
                row = v_ref[pl.ds(w + jj, 1), :]
                gat = jnp.take_along_axis(
                    jnp.broadcast_to(row, (DR, 128)), c, axis=1
                )
                return jnp.where(r == jj, gat, got)

            got = _slot_iter(
                J, j_body, jnp.zeros((DR, 128), jnp.float32), unroll
            )
            prod = vals_ref[g] * got
            acc = prod.reshape(meta.deg, RPG, 128).sum(axis=0)
            o_ref[pl.ds(g * RPG, RPG), :] = acc
            return 0

        jax.lax.fori_loop(0, GPB, group_body, 0)

    return kern


def _pad_vec(v: jnp.ndarray, meta: EllMeta) -> jnp.ndarray:
    """Flat input (n_in,) f32 -> (vrows, 128) padded layout."""
    v = jnp.asarray(v, jnp.float32)
    flat = jnp.zeros((meta.vrows * 128,), jnp.float32).at[: meta.n_in].set(v)
    return flat.reshape(meta.vrows, 128)


def ell_matvec(arrays: dict, meta: EllMeta, v: jnp.ndarray) -> jnp.ndarray:
    """K v via the windowed-ELL Pallas kernel.  v: flat (n2,) f32.

    On non-TPU backends runs in Pallas interpret mode (tests).
    """
    import jax.experimental.pallas as pl

    v2 = _pad_vec(v, meta)
    DR = arrays["li"].shape[1]
    interpret = jax.default_backend() != "tpu"
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _ell_kernel(meta, unroll=not interpret),
            grid=(meta.n_groups // GPB,),
            in_specs=[
                pl.BlockSpec(memory_space=_smem()),
                pl.BlockSpec((GPB, DR, 128), lambda b: (b, 0, 0)),
                pl.BlockSpec((GPB, DR, 128), lambda b: (b, 0, 0)),
                pl.BlockSpec((meta.vrows, 128), lambda b: (0, 0)),
            ],
            out_specs=pl.BlockSpec((GPB * RPG, 128), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((meta.n2r, 128), jnp.float32),
            interpret=interpret,
        )(arrays["w0"], arrays["li"], arrays["vals"], v2)
    out = out.reshape(-1)
    if meta.n_overflow:
        # long-range entries outside the window cap: tiny XLA side path
        v32 = jnp.asarray(v, jnp.float32)
        out = out.at[arrays["ov_r"]].add(arrays["ov_v"] * v32[arrays["ov_c"]])
    return out[: meta.n2]


def _smem():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.SMEM


# ---------------------------------------------------------------------------
# compacted-slot format: level-independent work per row
# ---------------------------------------------------------------------------
class SlotMeta(NamedTuple):
    """Static metadata of a compacted-slot operator (hashable, jit-static).

    The windowed-ELL kernel above re-gathers every ELL slot once per
    window row (J x deg work per 128-row block, and J grows with the RCM
    bandwidth ~ sqrt(n): J*deg = 44*18 at level 5).  The compacted-slot
    format assigns every matrix entry to a (source row, dup) slot shared
    by the 128 lanes of its output block: one dynamic row load + one
    lane-gather + one FMA per slot, no compare/select, and the slot count
    S is a *local* property of the mesh (~31 per block for P1, measured
    level-independent from L4 to L5).  Slots are vectorized across the 8
    blocks of a superblock in the sublane dimension.
    """

    n2: int      # output rows
    n_in: int    # input length
    n_sb: int    # superblocks (8 x 128 output rows each)
    s_pad: int   # padded slots per block
    vrows: int   # input-vector rows
    # ragged chunking (0 = dense layout): the dense layout pads EVERY
    # superblock to the global max slot count — under the multigrid
    # hierarchy's parent ordering the fine tsx level carries s_pad=100
    # for a mean slot count of ~31, so the static-unrolled kernels
    # stream and compute ~3x padding.  The ragged layout stores each
    # superblock's slots chunk-compacted (u slots per chunk) and runs a
    # scalar-prefetch grid over chunks with output-block revisiting:
    # work and HBM traffic scale with sum(ceil(nsl/u)) instead of
    # n_sb * s_pad.
    n_ch: int = 0  # total chunks (ragged); 0 = dense slot layout
    u: int = 0     # slots per chunk (ragged)


def _slot_pack(K_csr):
    """Shared CSR -> slot-layout packing (indices only, value-agnostic).

    Returns (meta, nsl, srow (n_sb*8, s_pad), cidx (n_sb*8, s_pad, 128),
    fill=(blk2, s, lane2), perm) where `K_csr.data[perm]` is the value
    stream aligned with the fill indices.
    """
    n2, n_in = K_csr.shape
    deg_arr = np.diff(K_csr.indptr)
    rows = np.repeat(np.arange(n2, dtype=np.int64), deg_arr)
    cols = K_csr.indices.astype(np.int64)

    blk = rows >> 7
    lane = rows & 127
    r = cols >> 7
    c = cols & 127
    # size from n2, NOT from the last nonzero row: trailing empty rows
    # (common in overflow side matrices) must still produce output —
    # empty superblocks cost nothing (nsl = 0 skips the slot loop)
    n_blocks = max((n2 + 127) // 128, 1)
    n_sb = (n_blocks + 7) // 8
    vrows = max((n_in + 127) // 128, 1)

    # dup layer k: running count of entries per (blk, r, lane)
    o = np.lexsort((c, lane, r, blk))
    blk, lane, r, c = blk[o], lane[o], r[o], c[o]
    key_brl = (blk * vrows + r) * 128 + lane
    new = np.ones(key_brl.shape[0], bool)
    new[1:] = key_brl[1:] != key_brl[:-1]
    run_start = np.maximum.accumulate(np.where(new, np.arange(new.size), 0))
    k = np.arange(new.size) - run_start

    # slot id: rank of (r, k) within each block, ordered by (r, k)
    o2 = np.lexsort((k, r, blk))
    blk2, lane2, r2, c2, k2 = blk[o2], lane[o2], r[o2], c[o2], k[o2]
    # radix for exact (blk, r, k) key packing (k can exceed the typical
    # P1 bound of ~64 for high-order elements: a P4 row reaches ~100+
    # entries inside one 128-column tile under locality ordering)
    k_radix = int(k2.max(initial=0)) + 1
    key_brk = (blk2 * vrows + r2) * k_radix + k2
    new2 = np.ones(key_brk.shape[0], bool)
    new2[1:] = key_brk[1:] != key_brk[:-1]
    # slot index = number of distinct (r,k) seen so far within the block
    blk_change = np.ones(key_brk.shape[0], bool)
    blk_change[1:] = blk2[1:] != blk2[:-1]
    slot_cum = np.cumsum(new2)
    blk_base = np.maximum.accumulate(
        np.where(blk_change, slot_cum - 1, 0)
    )
    s = slot_cum - 1 - blk_base

    S_b = np.zeros(n_sb * 8, np.int64)
    if s.size:
        np.maximum.at(S_b, blk2, s + 1)
    s_pad = int(max(S_b.max(initial=1), 1))
    nsl = S_b.reshape(n_sb, 8).max(axis=1).astype(np.int32)

    srow = np.zeros((n_sb * 8, s_pad), np.int32)
    cidx = np.zeros((n_sb * 8, s_pad, 128), np.int32)
    srow[blk2, s] = r2.astype(np.int32)
    cidx[blk2, s, lane2] = c2.astype(np.int32)

    meta = SlotMeta(n2=n2, n_in=n_in, n_sb=n_sb, s_pad=s_pad, vrows=vrows)
    return meta, nsl, srow, cidx, (blk2, s, lane2), o[o2]


def slot_csr_positions(K_csr, meta: "SlotMeta") -> np.ndarray:
    """Flat destination of every CSR nonzero inside the slot `vals` tensor.

    Re-runs the (deterministic) `_slot_pack` on the SAME matrix the
    operator was built from and converts each entry's (block, slot, lane)
    cell to its flat index in the packed value array — the dense tiled
    layout (n_sb, s_pad, 8, 128) or the ragged chunk layout
    (n_ch, u, 8, 128), matching `meta`.  Returns (nnz,) int64, aligned
    with `K_csr.data`.

    This is the host half of the static-structure tangent refresh
    (`solve/newton.py` corr_dest): because the assembled operator's
    sparsity is FIXED across Newton iterations (SURVEY §7 "same fixed
    sparsity every iteration"), per-integration-point tangent corrections
    can be scatter-added into a copy of the value stream once per Newton
    iteration — every CG matvec then runs the plain slot kernel with no
    per-iteration gather/segment-sum correction operator.
    """
    meta2, nsl, srow, cidx, (blk2, s, lane2), perm = _slot_pack(K_csr)
    assert (meta2.n2, meta2.n_in, meta2.n_sb, meta2.s_pad) == (
        meta.n2, meta.n_in, meta.n_sb, meta.s_pad,
    ), (meta2, meta)
    sb = blk2 >> 3
    p = blk2 & 7
    if meta.n_ch:
        # ragged chunk layout (_ragged_pack): chunk = base[sb] + s // u,
        # cell (chunk, s % u, p, lane)
        u = meta.u
        nch_b = np.maximum((nsl.astype(np.int64) + u - 1) // u, 1)
        base = np.cumsum(nch_b) - nch_b
        ch = base[sb] + s // u
        flat = ((ch * u + s % u) * 8 + p) * 128 + lane2
    else:
        flat = ((sb * meta.s_pad + s) * 8 + p) * 128 + lane2
    pos = np.empty(K_csr.nnz, np.int64)
    pos[perm] = flat
    return pos


def csr_lookup(K_csr, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    """Vectorized CSR entry lookup: index k with (row, col), else -1."""
    n2 = K_csr.shape[1]
    deg = np.diff(K_csr.indptr)
    all_keys = (
        np.repeat(np.arange(K_csr.shape[0], dtype=np.int64), deg) * n2
        + K_csr.indices.astype(np.int64)
    )
    q = rows.astype(np.int64) * n2 + cols.astype(np.int64)
    k = np.searchsorted(all_keys, q)
    k = np.minimum(k, max(all_keys.size - 1, 0))
    hit = all_keys[k] == q if all_keys.size else np.zeros(q.shape, bool)
    return np.where(hit, k, -1)


def element_corr_dest(
    K_csr, meta: "SlotMeta", elems: np.ndarray, free_flat: np.ndarray
) -> np.ndarray:
    """(n_e, 2n_p, 2n_p) i32 scatter destinations for per-element tangent
    correction blocks into the slot value stream of the assembled
    (BC-masked) operator built from `K_csr`.

    Entries whose row or column DOF is constrained get -1 (dropped by the
    runtime scatter, mode='drop'): the assembled operator zeroes those
    rows/cols (`apply_bc_csr`) and CG masks them, so omitting the
    correction there is exact.  Local DOF order is the interleaved
    [2v0, 2v0+1, 2v1, ...] convention of `Geometry.edofs` /
    `plastic_correction_gather`.
    """
    pos = slot_csr_positions(K_csr, meta)
    edofs = np.stack([2 * elems, 2 * elems + 1], axis=-1).reshape(
        elems.shape[0], -1
    )
    n2p = edofs.shape[1]
    rows = np.repeat(edofs, n2p, axis=1).reshape(-1)
    cols = np.tile(edofs, (1, n2p)).reshape(-1)
    free = np.asarray(free_flat).reshape(-1)
    k = csr_lookup(K_csr, rows, cols)
    ok = (k >= 0) & free[rows] & free[cols]
    dest = np.where(ok, pos[np.maximum(k, 0)], -1)
    assert dest.max(initial=-1) < np.iinfo(np.int32).max
    return dest.reshape(elems.shape[0], n2p, n2p).astype(np.int32)


def _slot_tile(x, n_sb, s_pad):
    """(n_sb*8, s_pad, 128) -> (n_sb, s_pad, 8, 128) contiguous."""
    return jnp.asarray(
        np.ascontiguousarray(
            x.reshape(n_sb, 8, s_pad, 128).transpose(0, 2, 1, 3)
        )
    )


def _staged_asarray(x: np.ndarray, limit_mb: int = 96):
    """Host -> device in <= limit_mb pieces (concatenated on device).

    Single large device_puts through the axon tunnel have killed the
    worker outright (~0.4 GB measured; CLAUDE.md landmine #7) — stage
    anything bigger than the limit along axis 0.
    """
    if x.nbytes <= limit_mb * 1_000_000 or x.ndim == 0:
        return jnp.asarray(x)
    n_pieces = -(-x.nbytes // (limit_mb * 1_000_000))
    step = max(1, -(-x.shape[0] // n_pieces))
    return jnp.concatenate(
        [jnp.asarray(x[i:i + step]) for i in range(0, x.shape[0], step)],
        axis=0,
    )


def _ragged_pack(meta, nsl, srow, cidx, vals_named, u):
    """Dense slot tensors -> chunk-compacted ragged arrays (or None).

    nsl: (n_sb,) per-superblock slot bound.  srow: (n_sb*8, s_pad).
    cidx: (n_sb*8, s_pad, 128).  vals_named: {key: (n_sb*8, s_pad, 128)}
    value tensors.  Returns (arrays, meta) with meta.n_ch/u set, or None
    when chunking would save <15% of the dense slot volume (uniform
    operators: the dense layout is already tight and avoids the
    scalar-prefetch machinery).
    """
    n_sb, s_pad = meta.n_sb, meta.s_pad
    u = int(min(u, s_pad))
    nch_b = np.maximum((nsl.astype(np.int64) + u - 1) // u, 1)
    n_ch = int(nch_b.sum())
    if n_ch * u > 0.85 * n_sb * s_pad:
        return None
    n_cmax = (s_pad + u - 1) // u
    sp_u = n_cmax * u
    sb_of = np.repeat(np.arange(n_sb, dtype=np.int32), nch_b)
    base = np.cumsum(nch_b) - nch_b
    lc = np.arange(n_ch, dtype=np.int64) - np.repeat(base, nch_b)

    srow_p = np.zeros((n_sb, 8, sp_u), np.int32)
    srow_p[:, :, :s_pad] = srow.reshape(n_sb, 8, s_pad)
    srow_r = srow_p.reshape(n_sb, 8, n_cmax, u).transpose(0, 2, 1, 3)[
        sb_of, lc
    ]

    def tile_chunks(x, dt):
        # numpy-only variant of _slot_tile + chunk gather (no device
        # round-trip: these tensors reach GBs at refinement level 5)
        xp = np.zeros((n_sb, sp_u, 8, 128), dt)
        xp[:, :s_pad] = x.reshape(n_sb, 8, s_pad, 128).transpose(0, 2, 1, 3)
        return _staged_asarray(
            np.ascontiguousarray(
                xp.reshape(n_sb, n_cmax, u, 8, 128)[sb_of, lc]
            )
        )

    arrays = dict(
        sbmap=jnp.asarray(sb_of),
        srow=jnp.asarray(np.ascontiguousarray(srow_r)),
        cidx=tile_chunks(cidx, np.int32),
    )
    for k, v in vals_named.items():
        arrays[k] = tile_chunks(v, v.dtype)
    return arrays, meta._replace(n_ch=n_ch, u=u)


def build_slot(K_csr, dtype=np.float32, ragged=False, u=16):
    """CSR -> compacted-slot arrays for `slot_matvec`.

    Returns (arrays, meta).  Dense layout (ragged=False, or ragged
    chunking would save <15%):
      nsl  (n_sb,)              i32  slot bound per superblock (SMEM)
      srow (n_sb, 8, s_pad)     i32  source vector row per (block, slot)
      cidx (n_sb, s_pad, 8,128) i32  lane index within the source row
      vals (n_sb, s_pad, 8,128) f32  matrix values (0 on padding)
    Ragged layout (meta.n_ch > 0; see SlotMeta): sbmap (n_ch,) i32 plus
    srow (n_ch, 8, u) / cidx / vals (n_ch, u, 8, 128) chunk-compacted.
    """
    meta, nsl, srow, cidx, (blk2, s, lane2), perm = _slot_pack(K_csr)
    vals = np.zeros((meta.n_sb * 8, meta.s_pad, 128), dtype)
    vals[blk2, s, lane2] = K_csr.data[perm].astype(dtype)
    if ragged:
        rg = _ragged_pack(meta, nsl, srow, cidx, dict(vals=vals), u)
        if rg is not None:
            return rg
    arrays = dict(
        nsl=jnp.asarray(nsl),
        srow=jnp.asarray(srow.reshape(meta.n_sb, 8, meta.s_pad)),
        cidx=_slot_tile(cidx, meta.n_sb, meta.s_pad),
        vals=_slot_tile(vals, meta.n_sb, meta.s_pad),
    )
    return arrays, meta


def build_slot_df(K_csr, ragged=False, u=16):
    """CSR (f64 values) -> slot arrays for `slot_matvec_df`.

    Like `build_slot` but the f64 values are split exactly into two-f32
    (hi, lo) pairs, for the double-float kernel that preserves ~1e-14
    relative accuracy (the Newton residual path).  ragged: see
    `build_slot` / SlotMeta.
    """
    meta, nsl, srow, cidx, (blk2, s, lane2), perm = _slot_pack(K_csr)
    d64 = K_csr.data[perm].astype(np.float64)
    d_hi = d64.astype(np.float32)
    d_lo = (d64 - d_hi.astype(np.float64)).astype(np.float32)
    vh = np.zeros((meta.n_sb * 8, meta.s_pad, 128), np.float32)
    vl = np.zeros_like(vh)
    vh[blk2, s, lane2] = d_hi
    vl[blk2, s, lane2] = d_lo
    if ragged:
        rg = _ragged_pack(
            meta, nsl, srow, cidx, dict(vals_hi=vh, vals_lo=vl), u
        )
        if rg is not None:
            return rg
    arrays = dict(
        nsl=jnp.asarray(nsl),
        srow=jnp.asarray(srow.reshape(meta.n_sb, 8, meta.s_pad)),
        cidx=_slot_tile(cidx, meta.n_sb, meta.s_pad),
        vals_hi=_slot_tile(vh, meta.n_sb, meta.s_pad),
        vals_lo=_slot_tile(vl, meta.n_sb, meta.s_pad),
    )
    return arrays, meta


class EllDfMeta(NamedTuple):
    """Static metadata of a double-float windowed-ELL operator.

    `ov` is the SlotMeta of the exact overflow side operator (entries
    outside the window cap run through `slot_matvec_df`, preserving the
    compensated accumulation — a plain XLA scatter-add side path would
    break the ~1e-14 accuracy of rows containing overflow entries).
    """

    ell: EllMeta
    ov: Optional[SlotMeta]


def build_ell_df(K_csr, max_overflow_frac=0.005):
    """CSR (f64 values) -> windowed-ELL arrays for `ell_matvec_df`.

    The dense-in-rows ELL layout stores deg*n2_pad value pairs — for the
    low-degree residual operators (G: 2n_p entries/row) this is ~an order
    of magnitude smaller than the compacted-slot layout, whose padded
    size is n_sb * max-block-slots (outlier blocks inflate every block).
    Window selection is structure-only, so the hi and lo value streams
    share one `build_ell` layout.
    """
    import scipy.sparse as sp

    d64 = K_csr.data.astype(np.float64)
    d_hi = d64.astype(np.float32)
    d_lo = (d64 - d_hi.astype(np.float64)).astype(np.float32)
    Kh = sp.csr_matrix(
        (d_hi.astype(np.float64), K_csr.indices, K_csr.indptr),
        shape=K_csr.shape,
    )
    Kl = sp.csr_matrix(
        (d_lo.astype(np.float64), K_csr.indices, K_csr.indptr),
        shape=K_csr.shape,
    )
    ah, meta = build_ell(Kh, np.float32, max_overflow_frac)
    al, meta_l = build_ell(Kl, np.float32, max_overflow_frac)
    assert meta_l == meta  # same structure -> same layout
    arrays = dict(
        w0=ah["w0"], li=ah["li"],
        vals_hi=ah["vals"], vals_lo=al["vals"],
    )
    ov = None
    if meta.n_overflow:
        # exact df32 side path: slot-df operator over the overflow COO.
        # Rows are COMPACTED to the occupied set first: the slot layout
        # pads n_sb * s_pad slots across ALL output blocks, so building
        # it over the full row space pays ~100x memory for the ~1% of
        # rows that actually hold overflow entries (~100 MB for the G
        # operator at refinement level 4 — ROADMAP r2 #1).  The compact
        # result is df-added back into the kernel output by row index;
        # two_sum with an exact zero is the identity, so untouched rows
        # are bit-identical to the uncompacted operator.
        ov_r = np.asarray(ah["ov_r"], np.int64)
        ov_c = np.asarray(ah["ov_c"], np.int64)
        ov_v = np.asarray(ah["ov_v"], np.float64) + np.asarray(
            al["ov_v"], np.float64
        )
        rows_nz = np.unique(ov_r)
        Kov = sp.coo_matrix(
            (ov_v, (np.searchsorted(rows_nz, ov_r), ov_c)),
            shape=(rows_nz.size, K_csr.shape[1]),
        ).tocsr()
        Kov.sum_duplicates()
        ov_arrays, ov_meta = build_slot_df(Kov)
        for k, v in ov_arrays.items():
            arrays["ovdf_" + k] = v
        arrays["ovdf_rows"] = jnp.asarray(rows_nz.astype(np.int32))
        ov = ov_meta
    return arrays, EllDfMeta(ell=meta, ov=ov)


def _ell_kernel_df(meta: EllMeta, deg: int, unroll: bool = True):
    """Double-float windowed-ELL matvec (see `_slot_kernel_df` for the
    error-free-transform details; same math, ELL traversal)."""
    J = meta.J

    def kern(w0_ref, li_ref, vh_ref, vl_ref, xh_ref, xl_ref, oh_ref, ol_ref):
        import jax.experimental.pallas as pl

        blk = pl.program_id(0)
        DR = li_ref.shape[1]

        def group_body(g, _):
            w = w0_ref[blk * GPB + g]
            lid = li_ref[g]  # (deg*RPG, 128)
            r = lid >> 7
            c = lid & 127

            # static unroll over the window (see _slot_iter / _ell_kernel)
            def j_body(jj, carry):
                gh, gl = carry
                rowh = xh_ref[pl.ds(w + jj, 1), :]
                rowl = xl_ref[pl.ds(w + jj, 1), :]
                gath = jnp.take_along_axis(
                    jnp.broadcast_to(rowh, (DR, 128)), c, axis=1
                )
                gatl = jnp.take_along_axis(
                    jnp.broadcast_to(rowl, (DR, 128)), c, axis=1
                )
                m = r == jj
                return jnp.where(m, gath, gh), jnp.where(m, gatl, gl)

            zero = jnp.zeros((DR, 128), jnp.float32)
            gh, gl = _slot_iter(J, j_body, (zero, zero), unroll)
            ah = vh_ref[g]
            al = vl_ref[g]
            p, e = _two_prod(ah, gh)
            e = e + (ah * gl + al * gh)
            p3 = p.reshape(deg, RPG, 128)
            e3 = e.reshape(deg, RPG, 128)
            acc_hi = jnp.zeros((RPG, 128), jnp.float32)
            acc_lo = jnp.zeros((RPG, 128), jnp.float32)
            for d in range(deg):  # static unroll: compensated reduction
                s_hi, s_err = _two_sum(acc_hi, p3[d])
                t = acc_lo + e3[d] + s_err
                acc_hi = s_hi + t
                acc_lo = t - (acc_hi - s_hi)
            oh_ref[pl.ds(g * RPG, RPG), :] = acc_hi
            ol_ref[pl.ds(g * RPG, RPG), :] = acc_lo
            return 0

        jax.lax.fori_loop(0, GPB, group_body, 0)

    return kern


def ell_matvec_df(arrays: dict, meta: EllDfMeta, v_hi, v_lo):
    """A v in double-float via the windowed-ELL Pallas kernel.

    Returns (out_hi, out_lo) flat (n2,), ~1e-14-relative (validated in
    tests/test_spmv.py).  Window-overflow entries run through the exact
    slot-df side operator and are df-added to the kernel output.
    """
    import jax.experimental.pallas as pl

    em = meta.ell
    xh = _pad_vec(v_hi, em)
    xl = _pad_vec(v_lo, em)
    DR = arrays["li"].shape[1]
    interpret = jax.default_backend() != "tpu"
    with jax.enable_x64(False):
        oh, ol = pl.pallas_call(
            _ell_kernel_df(em, em.deg, unroll=not interpret),
            grid=(em.n_groups // GPB,),
            in_specs=[
                pl.BlockSpec(memory_space=_smem()),
                pl.BlockSpec((GPB, DR, 128), lambda b: (b, 0, 0)),
                pl.BlockSpec((GPB, DR, 128), lambda b: (b, 0, 0)),
                pl.BlockSpec((GPB, DR, 128), lambda b: (b, 0, 0)),
                pl.BlockSpec((em.vrows, 128), lambda b: (0, 0)),
                pl.BlockSpec((em.vrows, 128), lambda b: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((GPB * RPG, 128), lambda b: (b, 0)),
                pl.BlockSpec((GPB * RPG, 128), lambda b: (b, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((em.n2r, 128), jnp.float32),
                jax.ShapeDtypeStruct((em.n2r, 128), jnp.float32),
            ],
            interpret=interpret,
        )(
            arrays["w0"], arrays["li"], arrays["vals_hi"],
            arrays["vals_lo"], xh, xl,
        )
    oh = oh.reshape(-1)[: em.n2]
    ol = ol.reshape(-1)[: em.n2]
    if meta.ov is not None:
        from .df32 import DF, df_add, df_barrier

        ov_arrays = {
            k[len("ovdf_"):]: v
            for k, v in arrays.items()
            if k.startswith("ovdf_")
        }
        rows = ov_arrays.pop("rows")  # compacted row index (build_ell_df)
        ovh, ovl = slot_matvec_df(ov_arrays, meta.ov, v_hi, v_lo)
        sub = df_barrier(
            df_add(DF(oh[rows], ol[rows]), DF(ovh, ovl))
        )
        return oh.at[rows].set(sub.hi), ol.at[rows].set(sub.lo)
    return oh, ol


class SplitColsDfMeta(NamedTuple):
    """Column-split double-float operator: A v = sum_k A_k v[k-th slice].

    Used for operators whose columns live in widely separated index
    regions (the S force operator's columns are component-major
    integration points at offsets 0 / n_int / 2*n_int): one windowed-ELL
    layout can never cover all regions (measured 59% overflow at level
    4), but each per-region part windows tightly.  Partial results are
    combined with the compensated `df_add`.
    """

    metas: tuple  # per-part EllDfMeta/SlotMeta (equal column slices)
    n_in: int


def sp_matvec_df(arrays: dict, meta, v_hi, v_lo):
    """Format-generic double-float A v: dispatches on the meta type."""
    if isinstance(meta, ShardedMeta):
        return _sharded_matvec_df(arrays, meta, v_hi, v_lo)
    if isinstance(meta, SplitColsDfMeta):
        from .df32 import DF, df_add, df_barrier

        w = meta.n_in // len(meta.metas)
        acc = None
        for k, m in enumerate(meta.metas):
            pre = f"p{k}_"
            sub = {
                kk[len(pre):]: vv
                for kk, vv in arrays.items()
                if kk.startswith(pre)
            }
            oh, ol = sp_matvec_df(
                sub, m, v_hi[k * w:(k + 1) * w], v_lo[k * w:(k + 1) * w]
            )
            acc = (
                DF(oh, ol) if acc is None else df_add(acc, DF(oh, ol))
            )
        out = df_barrier(acc)
        return out.hi, out.lo
    if isinstance(meta, EllDfMeta):
        return ell_matvec_df(arrays, meta, v_hi, v_lo)
    assert isinstance(meta, SlotMeta), meta
    return slot_matvec_df(arrays, meta, v_hi, v_lo)


def build_residual_slot_df(
    gdf, fmt: str = "slot", max_overflow_frac: float = 0.005
):
    """Assembled strain/force operators for the df32 Newton residual.

    The matrix-free df32 residual (`ops.assembly_df`) is bound by XLA's
    serialized gather lowering (~8 ns/element: 12.6 ms per strain+force
    pass at level 3).  Both halves are CONSTANT sparse operators of the
    mesh (the state dependence is entirely in the return map between
    them), so they are assembled once on the host in f64 and applied with
    the double-float kernels (`sp_matvec_df`, ~1e-14 relative):

      e_flat = G u      G: (3*n_int, 2*n_n), G[a*n_int+q, dof(e_q,p)] = B[a,p,q]
      F      = S s_flat S: (2*n_n, 3*n_int), S[dof, a*n_int+q] = w_q B[a,p,q]

    Row/col layout is comp-major, matching the (3, n_int) lane layout
    reshape.  gdf: an `ops.assembly_df.GeometryDF` (padding slots have
    zero B/w and are simply absent).  Element ordering should be
    node-locality-sorted for small slot counts (models/tsx_tunnel.py).
    fmt: "slot" (compacted-slot; fastest at small/mid mesh sizes),
    "rslot" (ragged slot: chunk-compacted stream — the dense slot
    layout's global padding AND the outlier-block inflation both
    disappear, so it stays compact at large levels too) or "ell"
    (windowed-ELL df; the pre-rslot large-level answer).
    Returns (G_arrays, G_meta, S_arrays, S_meta).
    """
    import scipy.sparse as sp

    hi = gdf.hi
    B64 = np.asarray(hi.B, np.float64) + np.asarray(gdf.B_lo, np.float64)
    w64 = np.asarray(hi.weight, np.float64) + np.asarray(
        gdf.w_lo, np.float64
    )
    edofs = np.asarray(hi.edofs, np.int64)          # (n_e, 2n_p)
    n_int, n_p2, n_q = hi.n_int, hi.n_p2, hi.n_q
    n2 = 2 * hi.n_nodes
    qp = np.arange(n_int, dtype=np.int64)
    dof_pq = edofs[qp // n_q]                        # (n_int, 2n_p)

    a_ix = np.repeat(np.arange(3, dtype=np.int64), n_p2 * n_int)
    p_ix = np.tile(np.repeat(np.arange(n_p2, dtype=np.int64), n_int), 3)
    q_ix = np.tile(qp, 3 * n_p2)
    vals = B64.reshape(-1)
    nz = vals != 0.0
    a_ix, p_ix, q_ix, vals = a_ix[nz], p_ix[nz], q_ix[nz], vals[nz]
    rows_e = a_ix * n_int + q_ix
    cols_u = dof_pq[q_ix, p_ix]

    G = sp.coo_matrix(
        (vals, (rows_e, cols_u)), shape=(3 * n_int, n2)
    ).tocsr()
    G.sum_duplicates()
    if fmt == "ell":
        # S's columns are component-major integration points (offsets 0 /
        # n_int / 2*n_int): split per component so each part's columns
        # cluster and window tightly (SplitColsDfMeta note)
        Ga, Gm = build_ell_df(G, max_overflow_frac)
        Sa: dict = {}
        parts = []
        for a3 in range(3):
            m = a_ix == a3
            Sc = sp.coo_matrix(
                (vals[m] * w64[q_ix[m]], (cols_u[m], q_ix[m])),
                shape=(n2, n_int),
            ).tocsr()
            Sc.sum_duplicates()
            aa, mm = build_ell_df(Sc, max_overflow_frac)
            for kk, vv in aa.items():
                Sa[f"p{a3}_{kk}"] = vv
            parts.append(mm)
        return Ga, Gm, Sa, SplitColsDfMeta(
            metas=tuple(parts), n_in=3 * n_int
        )
    S = sp.coo_matrix(
        (vals * w64[q_ix], (cols_u, rows_e)), shape=(n2, 3 * n_int)
    ).tocsr()
    S.sum_duplicates()
    ragged = fmt == "rslot"
    Ga, Gm = build_slot_df(G, ragged=ragged)
    Sa, Sm = build_slot_df(S, ragged=ragged)
    return Ga, Gm, Sa, Sm


_RAGGED_U = 16      # ragged-slot chunk size (build_sparse fmt="rslot")
_UNROLL_FULL = 128  # fully unroll the slot loop up to this s_pad
_UNROLL_CHUNK = 32  # above that, unroll in chunks of this many slots
# (chunk granularity measured on the L4 elastic slot operator: 32 ->
# 0.158 ms, 16 -> 0.197, 8 -> 0.211, 4 -> 0.357; full unroll 0.13-0.17
# with no reliable edge over chunk32.  Kernel compile cost is ~1 s for
# either at s_pad 48 — the pathological first-compile walls are tunnel
# warmup, not unroll-generated code size.)


def _slot_iter(s_pad: int, body, init, unroll: bool = True):
    """Iterate body(s, carry) over all s_pad slots with static unrolling.

    A dynamic `fori_loop` bounded by the runtime slot count serializes
    the per-slot dynamic row loads behind the loop carry — measured
    0.80 ms for the level-4 elastic matvec.  Fully unrolling the
    (static) slot loop lets Mosaic software-pipeline the VMEM loads
    across slots: 0.127 ms on the same operator (6.3x, ~690 GB/s —
    bandwidth-bound).  Padding slots carry zero values, so running them
    is exact; the DMA already streamed them regardless of the old
    runtime bound.  Above _UNROLL_FULL slots (high-order residual
    operators reach s_pad ~344) the loop runs in unrolled _UNROLL_CHUNK
    chunks to bound Mosaic code size.

    unroll=False (interpret mode / CPU tests) keeps a single fori_loop:
    eager interpret execution of an unrolled body is ~10x slower there,
    and the pipelining argument only applies to Mosaic.
    """
    if not unroll:
        return jax.lax.fori_loop(0, s_pad, body, init)
    if s_pad <= _UNROLL_FULL:
        acc = init
        for s in range(s_pad):
            acc = body(s, acc)
        return acc
    U = _UNROLL_CHUNK
    n_chunks = s_pad // U

    def chunk(t, acc):
        for u in range(U):
            acc = body(t * U + u, acc)
        return acc

    acc = jax.lax.fori_loop(0, n_chunks, chunk, init)
    for s in range(n_chunks * U, s_pad):
        acc = body(s, acc)
    return acc


def _slot_kernel(meta: SlotMeta, unroll: bool = True):
    def kern(srow_ref, cidx_ref, vals_ref, v_ref, o_ref):
        import jax.experimental.pallas as pl

        def body(s, acc):
            tile = jnp.concatenate(
                [
                    v_ref[pl.ds(srow_ref[0, p, s], 1), :]
                    for p in range(8)
                ],
                axis=0,
            )                                             # (8, 128)
            gat = jnp.take_along_axis(tile, cidx_ref[0, s], axis=1)
            return acc + vals_ref[0, s] * gat

        o_ref[...] = _slot_iter(
            meta.s_pad, body, jnp.zeros((8, 128), jnp.float32), unroll
        )

    return kern


def _rslot_first(sb_ref):
    """True on the first chunk of each output superblock."""
    import jax.experimental.pallas as pl

    c = pl.program_id(0)
    prev = sb_ref[jnp.maximum(c - 1, 0)]
    return jnp.logical_or(c == 0, sb_ref[c] != prev)


def _rslot_last(sb_ref):
    """True on the last chunk of each output superblock."""
    import jax.experimental.pallas as pl

    c = pl.program_id(0)
    n = pl.num_programs(0)
    nxt = sb_ref[jnp.minimum(c + 1, n - 1)]
    return jnp.logical_or(c == n - 1, sb_ref[c] != nxt)


def _rslot_chunk(u, srow_ref, cidx_ref, vals_ref, v_ref):
    """Partial K v of one u-slot chunk -> (8, 128) accumulator."""
    import jax.experimental.pallas as pl

    acc = jnp.zeros((8, 128), jnp.float32)
    for s in range(u):
        tile = jnp.concatenate(
            [v_ref[pl.ds(srow_ref[0, p, s], 1), :] for p in range(8)],
            axis=0,
        )
        gat = jnp.take_along_axis(tile, cidx_ref[0, s], axis=1)
        acc = acc + vals_ref[0, s] * gat
    return acc


def _rslot_kernel(meta: SlotMeta):
    """Ragged slot matvec: scalar-prefetch grid over chunks, the output
    block revisited across a superblock's consecutive chunks (accumulated
    in VMEM, written back once when the block index advances)."""
    import jax.experimental.pallas as pl

    def kern(sb_ref, srow_ref, cidx_ref, vals_ref, v_ref, o_ref):
        acc = _rslot_chunk(meta.u, srow_ref, cidx_ref, vals_ref, v_ref)
        first = _rslot_first(sb_ref)

        @pl.when(first)
        def _():
            o_ref[...] = acc

        @pl.when(jnp.logical_not(first))
        def _():
            o_ref[...] = o_ref[...] + acc

    return kern


def _rslot_grid_spec(meta: SlotMeta, vspec, extra_blk=0, n_out=1):
    """PrefetchScalarGridSpec shared by the ragged kernels.

    Input order: sbmap (prefetch) | srow | cidx | vals... | v | extra
    per-block inputs (each an (n_sb*8, 128) tensor blocked by sbmap).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    chunk = lambda c, sb: (c, 0, 0, 0)
    blk = pl.BlockSpec((8, 128), lambda c, sb: (sb[c], 0))
    n_vals = 2 if n_out == 2 else 1
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(meta.n_ch,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, meta.u), lambda c, sb: (c, 0, 0),
                memory_space=_smem(),
            ),
            pl.BlockSpec((1, meta.u, 8, 128), chunk),
        ]
        + [pl.BlockSpec((1, meta.u, 8, 128), chunk)] * n_vals
        + [vspec] * (2 if n_out == 2 else 1)
        + [blk] * extra_blk,
        out_specs=(
            [blk] * n_out if n_out > 1
            else pl.BlockSpec((8, 128), lambda c, sb: (sb[c], 0))
        ),
    )


def _two_sum(a, b):
    """Error-free |a|,|b|-unordered f32 sum (Knuth, branch-free)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _two_prod(a, b):
    """Error-free f32 product via Dekker splitting.

    Correct with or without compiler mul-add contraction: the 12-bit
    half-products (ahi*bhi etc.) are exact in f32, so the error chain
    never relies on an fma being (or not being) emitted.
    """
    p = a * b
    split = jnp.float32(4097.0)  # 2^12 + 1
    ca = split * a
    ahi = ca - (ca - a)
    alo = a - ahi
    cb = split * b
    bhi = cb - (cb - b)
    blo = b - bhi
    err = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, err


def _slot_kernel_df(meta: SlotMeta, unroll: bool = True):
    """Double-float slot matvec: (A_hi+A_lo)(v_hi+v_lo) compensated.

    Per slot: Dekker two-product of the heads, cross terms folded into
    the error, running two-sum accumulation — the same error-free
    transforms as `ops/df32.py`, but inside Mosaic where XLA's
    EFT-destroying rewrites (df32.py hazard note) cannot reach.
    """

    def kern(
        srow_ref, cidx_ref, vh_ref, vl_ref, xh_ref, xl_ref,
        oh_ref, ol_ref,
    ):
        import jax.experimental.pallas as pl

        def body(s, carry):
            acc_hi, acc_lo = carry
            tile_h = jnp.concatenate(
                [xh_ref[pl.ds(srow_ref[0, p, s], 1), :] for p in range(8)],
                axis=0,
            )
            tile_l = jnp.concatenate(
                [xl_ref[pl.ds(srow_ref[0, p, s], 1), :] for p in range(8)],
                axis=0,
            )
            ci = cidx_ref[0, s]
            gh = jnp.take_along_axis(tile_h, ci, axis=1)
            gl = jnp.take_along_axis(tile_l, ci, axis=1)
            ah = vh_ref[0, s]
            al = vl_ref[0, s]
            # DF product (ah+al)*(gh+gl), |al*gl| below the df32 floor
            p, e = _two_prod(ah, gh)
            e = e + (ah * gl + al * gh)
            # accumulate: two-sum of heads, tails folded, renormalized
            s_hi, s_err = _two_sum(acc_hi, p)
            t = acc_lo + e + s_err
            hi = s_hi + t
            lo = t - (hi - s_hi)
            return hi, lo

        zero = jnp.zeros((8, 128), jnp.float32)
        acc_hi, acc_lo = _slot_iter(meta.s_pad, body, (zero, zero), unroll)
        oh_ref[...] = acc_hi
        ol_ref[...] = acc_lo

    return kern


def _rslot_kernel_df(meta: SlotMeta):
    """Ragged double-float slot matvec (see `_slot_kernel_df` for the
    error-free transforms; chunk partials are df-combined across the
    revisited output blocks — same compensated-accumulation class as the
    dense kernel's running renormalization)."""
    import jax.experimental.pallas as pl

    def kern(
        sb_ref, srow_ref, cidx_ref, vh_ref, vl_ref, xh_ref, xl_ref,
        oh_ref, ol_ref,
    ):
        zero = jnp.zeros((8, 128), jnp.float32)
        acc_hi, acc_lo = zero, zero
        for s in range(meta.u):
            tile_h = jnp.concatenate(
                [xh_ref[pl.ds(srow_ref[0, p, s], 1), :] for p in range(8)],
                axis=0,
            )
            tile_l = jnp.concatenate(
                [xl_ref[pl.ds(srow_ref[0, p, s], 1), :] for p in range(8)],
                axis=0,
            )
            ci = cidx_ref[0, s]
            gh = jnp.take_along_axis(tile_h, ci, axis=1)
            gl = jnp.take_along_axis(tile_l, ci, axis=1)
            p, e = _two_prod(vh_ref[0, s], gh)
            e = e + (vh_ref[0, s] * gl + vl_ref[0, s] * gh)
            s_hi, s_err = _two_sum(acc_hi, p)
            t = acc_lo + e + s_err
            acc_hi = s_hi + t
            acc_lo = t - (acc_hi - s_hi)
        first = _rslot_first(sb_ref)

        @pl.when(first)
        def _():
            oh_ref[...] = acc_hi
            ol_ref[...] = acc_lo

        @pl.when(jnp.logical_not(first))
        def _():
            s_hi, s_err = _two_sum(oh_ref[...], acc_hi)
            t = ol_ref[...] + acc_lo + s_err
            hi = s_hi + t
            oh_ref[...] = hi
            ol_ref[...] = t - (hi - s_hi)

    return kern


def slot_matvec_df(arrays: dict, meta: SlotMeta, v_hi, v_lo):
    """A v in double-float via the compacted-slot Pallas kernel.

    v_hi/v_lo: flat (n_in,) f32 two-float pair.  Returns (out_hi, out_lo)
    flat (n2,) — ~1e-14-relative accurate (validated vs host f64 in
    tests/test_spmv.py).  On non-TPU backends runs in interpret mode.
    """
    import jax.experimental.pallas as pl

    def pad(v):
        return (
            jnp.zeros((meta.vrows * 128,), jnp.float32)
            .at[: meta.n_in]
            .set(jnp.asarray(v, jnp.float32))
            .reshape(meta.vrows, 128)
        )

    interpret = jax.default_backend() != "tpu"
    if meta.n_ch:
        vec = pl.BlockSpec((meta.vrows, 128), lambda c, sb: (0, 0))
        out_sds = jax.ShapeDtypeStruct((meta.n_sb * 8, 128), jnp.float32)
        with jax.enable_x64(False):
            oh, ol = pl.pallas_call(
                _rslot_kernel_df(meta),
                grid_spec=_rslot_grid_spec(meta, vec, n_out=2),
                out_shape=[out_sds, out_sds],
                interpret=interpret,
            )(
                arrays["sbmap"], arrays["srow"], arrays["cidx"],
                arrays["vals_hi"], arrays["vals_lo"], pad(v_hi), pad(v_lo),
            )
        return oh.reshape(-1)[: meta.n2], ol.reshape(-1)[: meta.n2]
    tile = pl.BlockSpec((1, meta.s_pad, 8, 128), lambda b: (b, 0, 0, 0))
    vec = pl.BlockSpec((meta.vrows, 128), lambda b: (0, 0))
    with jax.enable_x64(False):
        oh, ol = pl.pallas_call(
            _slot_kernel_df(meta, unroll=not interpret),
            grid=(meta.n_sb,),
            in_specs=[
                pl.BlockSpec(
                    (1, 8, meta.s_pad), lambda b: (b, 0, 0),
                    memory_space=_smem(),
                ),
                tile, tile, tile, vec, vec,
            ],
            out_specs=[
                pl.BlockSpec((8, 128), lambda b: (b, 0)),
                pl.BlockSpec((8, 128), lambda b: (b, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((meta.n_sb * 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((meta.n_sb * 8, 128), jnp.float32),
            ],
            interpret=interpret,
        )(
            arrays["srow"], arrays["cidx"],
            arrays["vals_hi"], arrays["vals_lo"], pad(v_hi), pad(v_lo),
        )
    return oh.reshape(-1)[: meta.n2], ol.reshape(-1)[: meta.n2]


def slot_matvec(arrays: dict, meta: SlotMeta, v: jnp.ndarray) -> jnp.ndarray:
    """K v via the compacted-slot Pallas kernel.  v: flat (n_in,) f32.

    A 2-D `v` is taken as already-padded (rows, 128) blocks whose
    entries beyond `n_in` are ZERO (the `slot_sweep_b` layout invariant)
    — the pad copy becomes a contiguous reshape/slice.  Used by the
    V-cycle transfer operators on the in-layout residual (VERDICT r3 #4).

    On non-TPU backends runs in Pallas interpret mode (tests).
    """
    import jax.experimental.pallas as pl

    if v.ndim == 2:
        flat = v.reshape(-1)
        assert flat.shape[0] >= meta.vrows * 128, (v.shape, meta.vrows)
        v2 = flat[: meta.vrows * 128].reshape(meta.vrows, 128)
    else:
        v2 = jnp.zeros((meta.vrows * 128,), jnp.float32).at[
            : meta.n_in
        ].set(jnp.asarray(v, jnp.float32)).reshape(meta.vrows, 128)
    interpret = jax.default_backend() != "tpu"
    with jax.enable_x64(False):
        if meta.n_ch:
            vec = pl.BlockSpec((meta.vrows, 128), lambda c, sb: (0, 0))
            out = pl.pallas_call(
                _rslot_kernel(meta),
                grid_spec=_rslot_grid_spec(meta, vec),
                out_shape=jax.ShapeDtypeStruct(
                    (meta.n_sb * 8, 128), jnp.float32
                ),
                interpret=interpret,
            )(arrays["sbmap"], arrays["srow"], arrays["cidx"],
              arrays["vals"], v2)
            return out.reshape(-1)[: meta.n2]
        out = pl.pallas_call(
            _slot_kernel(meta, unroll=not interpret),
            grid=(meta.n_sb,),
            in_specs=[
                pl.BlockSpec(
                    (1, 8, meta.s_pad), lambda b: (b, 0, 0),
                    memory_space=_smem(),
                ),
                pl.BlockSpec((1, meta.s_pad, 8, 128), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, meta.s_pad, 8, 128), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((meta.vrows, 128), lambda b: (0, 0)),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((meta.n_sb * 8, 128), jnp.float32),
            interpret=interpret,
        )(arrays["srow"], arrays["cidx"], arrays["vals"], v2)
    return out.reshape(-1)[: meta.n2]


def _slot_sweep_kernel(
    meta: SlotMeta, update: bool, unroll: bool = True, split_z: bool = False
):
    """Fused block-Jacobi smoother sweep (see `slot_sweep`).

    res = mask * (r - K z); update=True additionally applies the damped
    2x2 nodal block inverse in lane-aligned form (the even/odd partner
    value comes from an in-kernel pairwise lane gather, iota^1) and
    returns z + mask * (msf*res + mpr*res_pair); update=False returns
    the masked residual alone (the restriction input).

    split_z: the block's own z rows arrive as a separate per-block input
    (`zb_ref`) instead of being read from the input vector at the block's
    global row offset — required under row sharding, where the kernel's
    block index is shard-local but the input vector is the full replicated
    z (`slot_sweep` ShardedMeta path).
    """

    def kern(*refs):
        import jax.experimental.pallas as pl

        if split_z:
            (srow_ref, cidx_ref, vals_ref, v_ref, zb_ref, r_ref,
             mask_ref, msf_ref, mpr_ref, o_ref) = refs
        else:
            (srow_ref, cidx_ref, vals_ref, v_ref, r_ref, mask_ref,
             msf_ref, mpr_ref, o_ref) = refs

        def body(s, acc):
            tile = jnp.concatenate(
                [v_ref[pl.ds(srow_ref[0, p, s], 1), :] for p in range(8)],
                axis=0,
            )
            gat = jnp.take_along_axis(tile, cidx_ref[0, s], axis=1)
            return acc + vals_ref[0, s] * gat

        acc = _slot_iter(
            meta.s_pad, body, jnp.zeros((8, 128), jnp.float32), unroll
        )
        res = (r_ref[...] - acc) * mask_ref[...]
        if not update:
            o_ref[...] = res
            return
        sw = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) ^ 1
        res_sw = jnp.take_along_axis(res, sw, axis=1)
        if split_z:
            zblk = zb_ref[...]
        else:
            blk = pl.program_id(0)
            zblk = v_ref[pl.ds(blk * 8, 8), :]
        o_ref[...] = zblk + (
            msf_ref[...] * res + mpr_ref[...] * res_sw
        ) * mask_ref[...]

    return kern


def _rslot_sweep_kernel(meta: SlotMeta, update: bool):
    """Ragged fused block-Jacobi sweep (see `slot_sweep`): the matvec
    accumulates across a superblock's chunks in the revisited output
    block; the residual mask / block-inverse update runs once, on the
    block's last chunk."""
    import jax.experimental.pallas as pl

    def kern(
        sb_ref, srow_ref, cidx_ref, vals_ref, v_ref, r_ref, mask_ref,
        msf_ref, mpr_ref, o_ref,
    ):
        acc = _rslot_chunk(meta.u, srow_ref, cidx_ref, vals_ref, v_ref)
        first = _rslot_first(sb_ref)
        last = _rslot_last(sb_ref)
        # program_id must be read at kernel top level: inside a pl.when
        # branch the interpret-mode evaluator does not rewrite it
        sb = sb_ref[pl.program_id(0)]

        @pl.when(first)
        def _():
            o_ref[...] = acc

        @pl.when(jnp.logical_not(first))
        def _():
            o_ref[...] = o_ref[...] + acc

        @pl.when(last)
        def _():
            res = (r_ref[...] - o_ref[...]) * mask_ref[...]
            if not update:
                o_ref[...] = res
                return
            sw = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) ^ 1
            res_sw = jnp.take_along_axis(res, sw, axis=1)
            zblk = v_ref[pl.ds(sb * 8, 8), :]
            o_ref[...] = zblk + (
                msf_ref[...] * res + mpr_ref[...] * res_sw
            ) * mask_ref[...]

    return kern


def build_sweep_aux(inv: np.ndarray, free_flat: np.ndarray, meta: SlotMeta):
    """Host build of the fused-sweep per-level constants.

    inv: (n_n, 2, 2) damped block-Jacobi inverse (omega included);
    free_flat: (2*n_n,) bool.  Returns dict(mask, msf, mpr) padded to the
    kernel's (n_sb*8, 128) output blocks: for DOF i = 2k+c,
    msf[i] = inv[k, c, c] (own-lane coefficient) and
    mpr[i] = inv[k, c, 1-c] (partner-lane coefficient).
    """
    n = free_flat.shape[0]
    rows = meta.n_sb * 8
    inv = np.asarray(inv, np.float32)
    msf = np.zeros((rows * 128,), np.float32)
    mpr = np.zeros((rows * 128,), np.float32)
    mask = np.zeros((rows * 128,), np.float32)
    k = np.arange(n) // 2
    cc = np.arange(n) % 2
    msf[:n] = inv[k, cc, cc]
    mpr[:n] = inv[k, cc, 1 - cc]
    mask[:n] = np.asarray(free_flat, np.float32)
    return dict(
        mask=jnp.asarray(mask.reshape(rows, 128)),
        msf=jnp.asarray(msf.reshape(rows, 128)),
        mpr=jnp.asarray(mpr.reshape(rows, 128)),
    )


def slot_sweep(
    arrays: dict,
    meta: SlotMeta,
    aux: dict,
    z: jnp.ndarray,
    r2: jnp.ndarray,
    update: bool = True,
) -> jnp.ndarray:
    """One fused smoother sweep / masked residual on a SQUARE slot operator.

    Collapses the V-cycle's per-sweep chain (Pallas matvec + subtract +
    mask + 2x2 block einsum + mask + add — each a separate full-vector
    XLA op between custom calls) into ONE Pallas kernel: the operator
    values stream once and the residual/update happen in VMEM.  The 2x2
    nodal inverse is applied lane-aligned (`aux` from `build_sweep_aux`);
    the partner component comes from a pairwise in-kernel lane gather.

    z: flat (n2,) current iterate.  r2: (n_sb*8, 128) padded residual
    blocks (`pad_rhs`).  update=False returns mask*(r - K z) flat.

    Numerics note vs the unfused path: the odd-component update computes
    d*r1 + c*r0 instead of the einsum's c*r0 + d*r1 — same values, one
    reordered addition, so results can differ by 1 ulp (the V-cycle is a
    preconditioner; CG trajectories remain within solver tolerance).

    ShardedMeta (under shard_map): `aux` and `r2` are the device-local
    row slices, z the full replicated iterate; the local sweep runs the
    split-z kernel and the updated rows are all_gathered back into the
    full vector (bit-identical per row to the single-device sweep).
    """
    import jax.experimental.pallas as pl

    if isinstance(meta, ShardedMeta):
        m = meta.local
        assert isinstance(m, SlotMeta) and m.n_ch == 0
        v2 = jnp.zeros((m.vrows * 128,), jnp.float32).at[: m.n_in].set(
            jnp.asarray(z, jnp.float32)
        ).reshape(m.vrows, 128)
        interpret = jax.default_backend() != "tpu"
        blk = pl.BlockSpec((8, 128), lambda b: (b, 0))
        in_specs = [
            pl.BlockSpec(
                (1, 8, m.s_pad), lambda b: (b, 0, 0), memory_space=_smem()
            ),
            pl.BlockSpec((1, m.s_pad, 8, 128), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, m.s_pad, 8, 128), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((m.vrows, 128), lambda b: (0, 0)),
        ]
        ops = [arrays["srow"], arrays["cidx"], arrays["vals"], v2]
        if update:
            # local z row blocks for the update term (split_z kernel doc)
            idx = jax.lax.axis_index(meta.axis)
            rows_tot = m.n_sb * meta.n_shards * 8
            zb_full = jnp.zeros((rows_tot * 128,), jnp.float32).at[
                : meta.n2
            ].set(jnp.asarray(z, jnp.float32)).reshape(rows_tot, 128)
            ops.append(
                jax.lax.dynamic_slice_in_dim(
                    zb_full, idx * m.n_sb * 8, m.n_sb * 8, axis=0
                )
            )
            in_specs.append(blk)
        ops += [r2, aux["mask"], aux["msf"], aux["mpr"]]
        in_specs += [blk, blk, blk, blk]
        with jax.enable_x64(False):
            out = pl.pallas_call(
                _slot_sweep_kernel(
                    m, update, unroll=not interpret, split_z=update
                ),
                grid=(m.n_sb,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((8, 128), lambda b: (b, 0)),
                out_shape=jax.ShapeDtypeStruct(
                    (m.n_sb * 8, 128), jnp.float32
                ),
                interpret=interpret,
            )(*ops)
        return _gather_rows(out.reshape(-1), meta)

    assert meta.n2 == meta.n_in, "fused sweep needs a square operator"
    rows = max(meta.vrows, meta.n_sb * 8)
    v2 = jnp.zeros((rows * 128,), jnp.float32).at[: meta.n_in].set(
        jnp.asarray(z, jnp.float32)
    ).reshape(rows, 128)
    return slot_sweep_b(arrays, meta, aux, v2, r2, update).reshape(-1)[
        : meta.n2
    ]


def slot_sweep_b(
    arrays: dict,
    meta: SlotMeta,
    aux: dict,
    z2: jnp.ndarray,
    r2: jnp.ndarray,
    update: bool = True,
) -> jnp.ndarray:
    """`slot_sweep` in padded-block layout end to end (non-sharded only).

    z2: (n_sb*8, 128) current iterate blocks, r2: same-shape residual
    blocks (`pad_rhs`).  Returns the updated iterate (or masked residual,
    update=False) as (n_sb*8, 128) blocks — no flat round-trip.  The
    V-cycle keeps z/r in this layout through all sweeps of a level
    (`solve.multigrid.make_vcycle_ell`), eliminating the per-sweep
    pad/truncate full-vector copies that cost ~0.25 ms of the ~1.9 ms
    per-CG-iteration wall at the 228k-DOF level (VERDICT r3 #4).

    Invariant: entries of z2 beyond meta.n2 are zero (the masked updates
    preserve this; `pad_rhs` establishes it).
    """
    import jax.experimental.pallas as pl

    assert not isinstance(meta, ShardedMeta), "padded IO is single-device"
    assert meta.n2 == meta.n_in, "fused sweep needs a square operator"
    rows = max(meta.vrows, meta.n_sb * 8)
    assert rows == meta.n_sb * 8, (rows, meta.n_sb)
    assert z2.shape == (rows, 128), z2.shape
    v2 = z2
    interpret = jax.default_backend() != "tpu"
    if meta.n_ch:
        vec = pl.BlockSpec((rows, 128), lambda c, sb: (0, 0))
        with jax.enable_x64(False):
            out = pl.pallas_call(
                _rslot_sweep_kernel(meta, update),
                grid_spec=_rslot_grid_spec(meta, vec, extra_blk=4),
                out_shape=jax.ShapeDtypeStruct(
                    (meta.n_sb * 8, 128), jnp.float32
                ),
                interpret=interpret,
            )(
                arrays["sbmap"], arrays["srow"], arrays["cidx"],
                arrays["vals"], v2, r2, aux["mask"], aux["msf"],
                aux["mpr"],
            )
        return out
    blk = pl.BlockSpec((8, 128), lambda b: (b, 0))
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _slot_sweep_kernel(meta, update, unroll=not interpret),
            grid=(meta.n_sb,),
            in_specs=[
                pl.BlockSpec(
                    (1, 8, meta.s_pad), lambda b: (b, 0, 0),
                    memory_space=_smem(),
                ),
                pl.BlockSpec((1, meta.s_pad, 8, 128), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, meta.s_pad, 8, 128), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((rows, 128), lambda b: (0, 0)),
                blk, blk, blk, blk,
            ],
            out_specs=pl.BlockSpec((8, 128), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((meta.n_sb * 8, 128), jnp.float32),
            interpret=interpret,
        )(
            arrays["srow"], arrays["cidx"], arrays["vals"], v2,
            r2, aux["mask"], aux["msf"], aux["mpr"],
        )
    return out


def pad_rhs(r: jnp.ndarray, meta) -> jnp.ndarray:
    """Flat (n2,) -> (n_sb*8, 128) blocks for `slot_sweep`'s r input.

    ShardedMeta: returns this device's local row-block slice.
    """
    if isinstance(meta, ShardedMeta):
        m = meta.local
        rows_tot = m.n_sb * meta.n_shards * 8
        full = (
            jnp.zeros((rows_tot * 128,), jnp.float32)
            .at[: meta.n2]
            .set(jnp.asarray(r, jnp.float32))
            .reshape(rows_tot, 128)
        )
        idx = jax.lax.axis_index(meta.axis)
        return jax.lax.dynamic_slice_in_dim(
            full, idx * m.n_sb * 8, m.n_sb * 8, axis=0
        )
    rows = meta.n_sb * 8
    return (
        jnp.zeros((rows * 128,), jnp.float32)
        .at[: meta.n2]
        .set(jnp.asarray(r, jnp.float32))
        .reshape(rows, 128)
    )


# ---------------------------------------------------------------------------
# packed slot format: bf16 values + u8 lane indices (preconditioner ops)
# ---------------------------------------------------------------------------
#
# The V-cycle smoother is HBM-bandwidth-bound (the f32 slot matvec measures
# ~690 GB/s, ~84% of v5e peak), so the only way to make it faster is fewer
# bytes.  A preconditioner does not need f32 operator values: storing them
# in bf16 costs at most one extra CG iteration (measured on the level-2
# tangent: 7 -> 8 at nu=2, 10 -> 10 at nu=1), and the lane indices are
# < 128 so a byte each suffices.  Packing both into 32-bit words keeps the
# (8, 128) f32/i32 tile layout — narrow dtypes would retile to (16/32, 128)
# and give the bytes straight back as padding:
#   * vals: two bf16 per u32 (slot 2k in the HIGH half — a bf16 is the top
#     16 bits of the f32 with the same value, so unpacking is one mask or
#     shift plus a bitcast, no 16-bit types in-kernel),
#   * cidx: four u8 per i32 (slot 4q+j in bits 8j..8j+7).
# HBM traffic per matrix entry drops 8 -> 3 bytes (~2.7x on the stream
# that dominates every smoother sweep and masked-residual application).
# CG's operator A stays on the f32 arrays: an inexact-Newton tangent at
# cg_tol 1e-5 needs more than bf16's ~3e-3 relative operator accuracy.


def _bf16_bits(x32: np.ndarray) -> np.ndarray:
    """f32 -> round-to-nearest-even bf16, as u32 bit patterns (<= 0xFFFF)."""
    u = np.ascontiguousarray(x32, np.float32).view(np.uint32)
    return (u + np.uint32(0x7FFF) + ((u >> np.uint32(16)) & np.uint32(1))) >> np.uint32(16)


def pack_slot_bf16(arrays: dict, meta: SlotMeta) -> dict:
    """Pack a slot operator for `slot_matvec_pk` / `slot_sweep_pk`.

    Returns dict(srow (n_sb, 8, 4*n_q) i32 [slot-padded copy],
    cidx_pk (n_sb, n_q, 8, 128) i32, vals_pk (n_sb, 2*n_q, 8, 128) u32)
    with n_q = ceil(s_pad / 4); padding slots carry zero values (inert).
    """
    sp = meta.s_pad
    n_q = -(-sp // 4)
    s4 = 4 * n_q
    n_sb = meta.n_sb
    # back out the (n_sb*8, s_pad, ...) layouts from the tiled arrays
    vals = np.asarray(arrays["vals"], np.float32).transpose(0, 2, 1, 3)
    cidx = np.asarray(arrays["cidx"], np.int64).transpose(0, 2, 1, 3)
    srow = np.asarray(arrays["srow"], np.int32)
    assert cidx.max(initial=0) < 128 and cidx.min(initial=0) >= 0
    pad = ((0, 0), (0, 0), (0, s4 - sp), (0, 0))
    vals = np.pad(vals, pad)          # (n_sb, 8, s4, 128)
    cidx = np.pad(cidx, pad)
    srow = np.pad(srow, ((0, 0), (0, 0), (0, s4 - sp)))
    bits = _bf16_bits(vals)           # (n_sb, 8, s4, 128) u32
    vals_pk = (bits[:, :, 0::2] << np.uint32(16)) | bits[:, :, 1::2]
    c = cidx.astype(np.uint32)
    cidx_pk = (
        c[:, :, 0::4]
        | (c[:, :, 1::4] << np.uint32(8))
        | (c[:, :, 2::4] << np.uint32(16))
        | (c[:, :, 3::4] << np.uint32(24))
    ).astype(np.int64)
    return dict(
        srow=jnp.asarray(srow),
        cidx_pk=jnp.asarray(
            np.ascontiguousarray(cidx_pk.transpose(0, 2, 1, 3)), jnp.int32
        ),
        vals_pk=jnp.asarray(
            np.ascontiguousarray(vals_pk.transpose(0, 2, 1, 3)), jnp.uint32
        ),
    )


def _accum_pk(srow_ref, cidxp_ref, valsp_ref, v_ref, n_q: int, unroll: bool):
    """Shared packed-stream accumulation: sum_s vals[s] * gather(v, s)."""
    import jax.experimental.pallas as pl

    mask_hi = jnp.uint32(0xFFFF0000)

    def qbody(q, acc):
        ci_w = cidxp_ref[0, q]                             # (8,128) i32
        for half in range(2):
            w = valsp_ref[0, 2 * q + half]                 # (8,128) u32
            for j2 in range(2):
                j = 2 * half + j2
                s = 4 * q + j
                tile = jnp.concatenate(
                    [
                        v_ref[pl.ds(srow_ref[0, p, s], 1), :]
                        for p in range(8)
                    ],
                    axis=0,
                )
                ci = (ci_w >> (8 * j)) & 0xFF if j else ci_w & 0xFF
                gat = jnp.take_along_axis(tile, ci, axis=1)
                # slot 2k sits in the high half: mask for j2=0, shift for 1
                vw = w & mask_hi if j2 == 0 else w << 16
                va = jax.lax.bitcast_convert_type(vw, jnp.float32)
                acc = acc + va * gat
        return acc

    return _slot_iter(n_q, qbody, jnp.zeros((8, 128), jnp.float32), unroll)


def _pk_specs(meta: SlotMeta, n_q: int):
    import jax.experimental.pallas as pl

    return [
        pl.BlockSpec(
            (1, 8, 4 * n_q), lambda b: (b, 0, 0), memory_space=_smem()
        ),
        pl.BlockSpec((1, n_q, 8, 128), lambda b: (b, 0, 0, 0)),
        pl.BlockSpec((1, 2 * n_q, 8, 128), lambda b: (b, 0, 0, 0)),
        pl.BlockSpec((meta.vrows, 128), lambda b: (0, 0)),
    ]


def slot_matvec_pk(arrays: dict, meta: SlotMeta, v: jnp.ndarray) -> jnp.ndarray:
    """K v with the packed (bf16-value) slot operator — preconditioner use."""
    import jax.experimental.pallas as pl

    n_q = -(-meta.s_pad // 4)
    v2 = jnp.zeros((meta.vrows * 128,), jnp.float32).at[: meta.n_in].set(
        jnp.asarray(v, jnp.float32)
    ).reshape(meta.vrows, 128)
    interpret = jax.default_backend() != "tpu"

    def kern(srow_ref, cidxp_ref, valsp_ref, v_ref, o_ref):
        o_ref[...] = _accum_pk(
            srow_ref, cidxp_ref, valsp_ref, v_ref, n_q, not interpret
        )

    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(meta.n_sb,),
            in_specs=_pk_specs(meta, n_q),
            out_specs=pl.BlockSpec((8, 128), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((meta.n_sb * 8, 128), jnp.float32),
            interpret=interpret,
        )(arrays["srow"], arrays["cidx_pk"], arrays["vals_pk"], v2)
    return out.reshape(-1)[: meta.n2]


def slot_sweep_pk(
    arrays_pk: dict,
    meta: SlotMeta,
    aux: dict,
    z: jnp.ndarray,
    r2: jnp.ndarray,
    update: bool = True,
) -> jnp.ndarray:
    """`slot_sweep` on the packed operator stream (same fused epilogue)."""
    import jax.experimental.pallas as pl

    assert meta.n2 == meta.n_in, "fused sweep needs a square operator"
    n_q = -(-meta.s_pad // 4)
    rows = max(meta.vrows, meta.n_sb * 8)
    v2 = jnp.zeros((rows * 128,), jnp.float32).at[: meta.n_in].set(
        jnp.asarray(z, jnp.float32)
    ).reshape(rows, 128)
    interpret = jax.default_backend() != "tpu"

    def kern(
        srow_ref, cidxp_ref, valsp_ref, v_ref, r_ref, mask_ref,
        msf_ref, mpr_ref, o_ref,
    ):
        acc = _accum_pk(
            srow_ref, cidxp_ref, valsp_ref, v_ref, n_q, not interpret
        )
        res = (r_ref[...] - acc) * mask_ref[...]
        if not update:
            o_ref[...] = res
            return
        sw = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) ^ 1
        res_sw = jnp.take_along_axis(res, sw, axis=1)
        blk = pl.program_id(0)
        zblk = v_ref[pl.ds(blk * 8, 8), :]
        o_ref[...] = zblk + (
            msf_ref[...] * res + mpr_ref[...] * res_sw
        ) * mask_ref[...]

    blk = pl.BlockSpec((8, 128), lambda b: (b, 0))
    specs = _pk_specs(meta, n_q)
    specs[3] = pl.BlockSpec((rows, 128), lambda b: (0, 0))
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(meta.n_sb,),
            in_specs=specs + [blk, blk, blk, blk],
            out_specs=pl.BlockSpec((8, 128), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((meta.n_sb * 8, 128), jnp.float32),
            interpret=interpret,
        )(
            arrays_pk["srow"], arrays_pk["cidx_pk"], arrays_pk["vals_pk"],
            v2, r2, aux["mask"], aux["msf"], aux["mpr"],
        )
    return out.reshape(-1)[: meta.n2]


# ---------------------------------------------------------------------------
# multi-chip SPMD: output-row partitioning over a device mesh (shard_map)
# ---------------------------------------------------------------------------
#
# TPU-native scaling design for the assembled operators (SURVEY.md §2.4;
# the reference has no parallelism at all — `tsx-tunnel/pythonFEM.py` is a
# single NumPy process).  An assembled operator maps a REPLICATED input
# vector to output rows; both the slot and windowed-ELL layouts block
# output rows (128-lane blocks grouped into superblocks / GPB groups) and
# pack each block independently of every other block.  Row-partitioning on
# block boundaries therefore gives every device a contiguous slice of the
# UNCHANGED arrays: the local kernel arithmetic is bit-identical to the
# single-device kernel on those rows, and the full output vector is
# reassembled with one `all_gather` (pure concatenation — exact, unlike a
# psum, so df32 pairs survive with their compensation intact).
#
# Collectives per operator application: ONE all_gather of n2/n_dev * f32
# (x2 for df pairs), riding ICI.  No halo exchange is needed — the input
# vector is replicated, and rows are whole per device.

OP_AXIS = "oprows"


class ShardedMeta(NamedTuple):
    """Row-sharded operator meta: `local` is each device's kernel meta.

    Hashable/static like the metas it wraps.  `n2` is the FULL output row
    count (the gathered result is trimmed to it); the padding superblocks
    added to make the row blocks divide evenly hold zero values and are
    inert.  Dispatch happens inside `sp_matvec` / `sp_matvec_df` /
    `slot_sweep` / `pad_rhs`: call sites (solve/newton.py,
    solve/multigrid.py) are unchanged — under `shard_map` they receive the
    local array slices and a ShardedMeta, outside they never see one.
    """

    local: NamedTuple  # SlotMeta or EllMeta with per-shard n_sb/n_groups
    n2: int            # full (unsharded) output rows
    n_shards: int
    axis: str = OP_AXIS


def shard_rows(arrays: dict, meta, n_shards: int, axis: str = OP_AXIS):
    """Pad an operator's row blocks to split evenly over `n_shards`.

    Returns (arrays', ShardedMeta, specs) where `specs` maps each array
    key to a `jax.sharding.PartitionSpec` — leading-axis sharding for the
    row-blocked tensors, replicated for global side arrays (ELL overflow
    COO, applied identically on every device after the gather).
    """
    from jax.sharding import PartitionSpec as P

    def _pad0(v, n):
        if n == 0:
            return v
        z = jnp.zeros((n,) + tuple(v.shape[1:]), v.dtype)
        return jnp.concatenate([jnp.asarray(v), z], axis=0)

    out, specs = {}, {}
    if isinstance(meta, SlotMeta):
        assert meta.n_ch == 0, "ragged-slot sharding: use shard_rows_rslot"
        sbl = -(-meta.n_sb // n_shards)
        pad = sbl * n_shards - meta.n_sb
        for k, v in arrays.items():
            out[k] = _pad0(v, pad)
            specs[k] = P(axis)
        local = meta._replace(n_sb=sbl, n2=sbl * 8 * 128)
        return out, ShardedMeta(local, meta.n2, n_shards, axis), specs
    assert isinstance(meta, EllMeta), meta
    gmult = GPB * n_shards
    ngl = -(-meta.n_groups // gmult) * gmult // n_shards
    pad = ngl * n_shards - meta.n_groups
    for k in ("w0", "li", "vals"):
        out[k] = _pad0(arrays[k], pad)
        specs[k] = P(axis)
    for k in ("ov_r", "ov_c", "ov_v"):
        if k in arrays:
            out[k] = arrays[k]
            specs[k] = P()
    # local kernel: no trim (n2 = all local rows), overflow applied by the
    # caller on the gathered full vector
    local = meta._replace(
        n_groups=ngl, n2r=ngl * RPG, n2=ngl * RPG * 128, n_overflow=0
    )
    return out, ShardedMeta(local, meta.n2, n_shards, axis), specs


def _gather_rows(y_local: jnp.ndarray, meta: ShardedMeta) -> jnp.ndarray:
    """Concatenate per-device row blocks -> full (n2,) vector (exact)."""
    y = jax.lax.all_gather(y_local, meta.axis, tiled=True)
    return y[: meta.n2]


def _sharded_matvec(arrays: dict, meta: ShardedMeta, v: jnp.ndarray):
    m = meta.local
    if isinstance(m, SlotMeta):
        y = slot_matvec(arrays, m, v)
    else:
        y = ell_matvec(
            {k: arrays[k] for k in ("w0", "li", "vals")}, m, v
        )
    y = _gather_rows(y, meta)
    if "ov_r" in arrays:
        # replicated COO side path on the gathered vector — identical on
        # every device, so the result stays replicated
        v32 = jnp.asarray(v, jnp.float32)
        y = y.at[arrays["ov_r"]].add(arrays["ov_v"] * v32[arrays["ov_c"]])
    return y


def _sharded_matvec_df(arrays: dict, meta: ShardedMeta, v_hi, v_lo):
    m = meta.local
    assert isinstance(m, SlotMeta), (
        "sharded df residual operators use the slot format"
    )
    oh, ol = slot_matvec_df(arrays, m, v_hi, v_lo)
    return _gather_rows(oh, meta), _gather_rows(ol, meta)
