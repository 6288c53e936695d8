"""Blocked Cholesky factorization + solves as Pallas TPU kernels (f32).

XLA:TPU's Cholesky lowers to hundreds of small sequential kernels (~8 ms
at n=908 even in f32, dominated by dispatch), and its triangular solves
are similarly latency-bound.  These kernels keep the whole matrix in VMEM
and do the entire factorization in ONE kernel launch:

  * right-looking blocked factorization, 128-wide panels,
  * the unblocked panel factor and panel inverse run as `fori_loop`s on
    VMEM tiles,
  * panel solves and trailing updates are MXU matmuls,
  * the diagonal-block inverses are emitted alongside L, so the solve
    kernel is a short unrolled sequence of small matmuls (no per-row
    substitution at solve time).

Scope: f32, single matrix, n <= ~2000 (whole matrix in VMEM).  This
covers the reference-parity meshes; larger meshes use the matrix-free CG
path.  Interpreter mode on CPU keeps tests backend-independent.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

BLOCK = 128


def _factor_kernel(nb, k_ref, l_ref, inv_ref, a_ref):
    """Factor A = L L^T; A is staged through a VMEM scratch.

    Outputs: l_ref (n, n) lower factor (strict upper left as zeros),
    inv_ref (nb*B, B): per-panel inverses of the diagonal blocks.
    """
    B = BLOCK
    a_ref[:, :] = k_ref[:, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)

    for k in range(nb):
        off = k * B

        # --- unblocked Cholesky of the BxB diagonal block.  Mosaic has no
        # dynamic indexing into register values, so scalar/row/column
        # extraction uses full-tile masked reductions.
        def chol_step(j, D):
            colmask = cols == j
            djj = jnp.sum(jnp.where(colmask & (rows == j), D, 0.0))
            pivot = jax.lax.rsqrt(djj)
            col = jnp.sum(jnp.where(colmask, D, 0.0), axis=1) * pivot  # (B,)
            r1 = rows[:, 0]
            colm = jnp.where(r1 > j, col, 0.0)
            D = D - colm[:, None] * colm[None, :]
            newcol = jnp.where(r1 >= j, col, 0.0)
            return jnp.where(colmask, newcol[:, None], D)

        D0 = a_ref[pl.ds(off, B), pl.ds(off, B)]
        Lk = jax.lax.fori_loop(0, B, chol_step, D0)
        Lk = jnp.where(rows >= cols, Lk, 0.0)
        l_ref[pl.ds(off, B), pl.ds(off, B)] = Lk

        # --- invert the panel: solve Lk X = I by forward substitution
        def inv_step(j, X):
            rowmask = rows == j
            lrow = jnp.sum(jnp.where(rowmask, Lk, 0.0), axis=0)  # Lk[j, :]
            ljj = jnp.sum(jnp.where(rowmask & (cols == j), Lk, 0.0))
            lrow_m = jnp.where(cols[0, :] < j, lrow, 0.0)
            acc = jnp.dot(
                lrow_m[None, :], X, preferred_element_type=jnp.float32
            )[0]
            ej = (cols[0, :] == j).astype(X.dtype)
            xrow = (ej - acc) / ljj
            return jnp.where(rowmask, xrow[None, :], X)

        Li = jax.lax.fori_loop(0, B, inv_step, jnp.zeros((B, B), jnp.float32))
        inv_ref[pl.ds(off, B), :] = Li

        # --- panel below: L21 = A21 Li^T ; trailing: A22 -= L21 L21^T (MXU)
        if k < nb - 1:
            rest = (nb - 1 - k) * B
            A21 = a_ref[pl.ds(off + B, rest), pl.ds(off, B)]
            L21 = jnp.dot(A21, Li.T, preferred_element_type=jnp.float32)
            l_ref[pl.ds(off + B, rest), pl.ds(off, B)] = L21
            A22 = a_ref[pl.ds(off + B, rest), pl.ds(off + B, rest)]
            a_ref[pl.ds(off + B, rest), pl.ds(off + B, rest)] = A22 - jnp.dot(
                L21, L21.T, preferred_element_type=jnp.float32
            )


def _solve_kernel(nb, l_ref, inv_ref, b_ref, x_ref, y_ref):
    """Solve L L^T x = b using the stored panel inverses (fully unrolled)."""
    B = BLOCK

    # row-vector block substitution (all offsets static -> plain slices)
    # forward: y_k = (b_k - sum_{j<k} y_j Lkj^T) Li^T
    for k in range(nb):
        off = k * B
        Li = inv_ref[pl.ds(off, B), :]
        acc = b_ref[:, pl.ds(off, B)]  # (1, B)
        for j in range(k):
            Lkj = l_ref[pl.ds(off, B), pl.ds(j * B, B)]
            yj = y_ref[:, pl.ds(j * B, B)]
            acc = acc - jnp.dot(yj, Lkj.T, preferred_element_type=jnp.float32)
        y_ref[:, pl.ds(off, B)] = jnp.dot(
            acc, Li.T, preferred_element_type=jnp.float32
        )

    # backward: x_k = (y_k - sum_{j>k} x_j Ljk) Li
    for k in range(nb - 1, -1, -1):
        off = k * B
        Li = inv_ref[pl.ds(off, B), :]
        acc = y_ref[:, pl.ds(off, B)]
        for j in range(k + 1, nb):
            Ljk = l_ref[pl.ds(j * B, B), pl.ds(off, B)]
            xj = x_ref[:, pl.ds(j * B, B)]
            acc = acc - jnp.dot(xj, Ljk, preferred_element_type=jnp.float32)
        x_ref[:, pl.ds(off, B)] = jnp.dot(
            acc, Li, preferred_element_type=jnp.float32
        )


def _pad_to_block(n: int) -> int:
    return -(-n // BLOCK) * BLOCK


def _no_x64(fn, *args):
    with jax.enable_x64(False):
        return fn(*args)


def cholesky_factor(
    K: jnp.ndarray, interpret: Optional[bool] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Factor an SPD matrix (f32): returns (L, inv_blocks).

    K is padded with an identity tail to a BLOCK multiple; L is
    (n_pad, n_pad), inv_blocks (n_pad, BLOCK).
    """
    n = K.shape[0]
    n_pad = _pad_to_block(n)
    nb = n_pad // BLOCK
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    Kp = jnp.zeros((n_pad, n_pad), jnp.float32)
    Kp = Kp.at[:n, :n].set(K.astype(jnp.float32))
    Kp = Kp.at[jnp.arange(n, n_pad), jnp.arange(n, n_pad)].set(1.0)

    kern = functools.partial(_factor_kernel, nb)

    def call(Kp):
        scratch = (
            [pltpu.VMEM((n_pad, n_pad), jnp.float32)]
            if pltpu is not None
            else []
        )
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, BLOCK), jnp.float32),
            ),
            scratch_shapes=scratch,
            interpret=interpret,
        )(Kp)

    return _no_x64(call, Kp)


def cholesky_solve(
    L: jnp.ndarray,
    inv_blocks: jnp.ndarray,
    b: jnp.ndarray,
    n: int,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Solve K x = b from `cholesky_factor` output; returns (n,) f32."""
    n_pad = L.shape[0]
    nb = n_pad // BLOCK
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bp = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(b.astype(jnp.float32))

    kern = functools.partial(_solve_kernel, nb)

    def call(L, inv_blocks, bp):
        x, _ = pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            ),
            interpret=interpret,
        )(L, inv_blocks, bp)
        return x

    x = _no_x64(call, L, inv_blocks, bp)
    return x[0, :n]
