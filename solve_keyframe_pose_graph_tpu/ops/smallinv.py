"""Batched small-matrix inverse without LU pivoting.

XLA's jnp.linalg.inv lowers to batched LU with partial pivoting — a long
sequential dependency chain of tiny ops that runs poorly on TPU. The BCR
band factorization only ever inverts SPD (damped) blocks, so unpivoted
Gauss-Jordan is numerically safe. Implemented as a lax.fori_loop over the d
pivot steps (NOT unrolled: the BCR factorization calls this at ~log2(M)
levels, and an unrolled tableau would multiply the XLA graph by d,
inflating remote AOT compile times from seconds to minutes)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gauss_jordan_inv(A, unroll: bool = False):
    """Inverse of a batch of SPD matrices A (..., d, d), no pivoting.

    d fused VPU steps over a (..., d, 2d) tableau; valid for SPD/strongly
    diagonally dominant blocks (all BCR inputs are damped SPD).

    unroll=True emits the d steps as straight-line code (static slices) —
    faster on device (no loop-carried fori overhead) at the cost of a larger
    XLA graph; use for latency-critical small-d factorizations."""
    d = A.shape[-1]
    batch = A.shape[:-2]
    eye = jnp.broadcast_to(jnp.eye(d, dtype=A.dtype), batch + (d, d))
    buf0 = jnp.concatenate([A, eye], axis=-1)          # (..., d, 2d)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)

    def step(k, buf):
        rowk = jax.lax.dynamic_slice_in_dim(buf, k, 1, axis=-2)  # (...,1,2d)
        piv = jax.lax.dynamic_slice_in_dim(rowk, k, 1, axis=-1)  # (...,1,1)
        rowk = rowk / piv
        colk = jax.lax.dynamic_slice_in_dim(buf, k, 1, axis=-1)  # (...,d,1)
        colk = jnp.where(row_ids == k, 0.0, colk)                # keep row k
        buf = buf - colk * rowk                                   # outer prod
        return jax.lax.dynamic_update_slice_in_dim(buf, rowk, k, axis=-2)

    if unroll:
        buf = buf0
        for k in range(d):
            buf = step(k, buf)
    else:
        buf = jax.lax.fori_loop(0, d, step, buf0)
    return buf[..., :, d:]


def block_gj_inv(A, b: int = 6):
    """Batched SPD inverse via BLOCK Gauss-Jordan with (b,b) pivot blocks.

    d/b block-pivot steps instead of d scalar steps — each step is a batched
    (b,b) inverse (recursing into gauss_jordan_inv unrolled) plus two block
    matmul updates. Cuts the serial dependency chain ~b-fold, which is what
    the BCR levels are bound by on TPU."""
    d = A.shape[-1]
    assert d % b == 0, (d, b)
    nb = d // b
    batch = A.shape[:-2]
    eye = jnp.broadcast_to(jnp.eye(d, dtype=A.dtype), batch + (d, d))
    buf = jnp.concatenate([A, eye], axis=-1)           # (..., d, 2d)

    for k in range(nb):
        r0 = k * b
        rows = buf[..., r0:r0 + b, :]                  # (..., b, 2d)
        piv = rows[..., :, r0:r0 + b]                  # (..., b, b)
        piv_inv = gauss_jordan_inv(piv, unroll=True)
        rows = piv_inv @ rows                          # normalize block row
        cols = buf[..., :, r0:r0 + b]                  # (..., d, b)
        # zero the pivot block's contribution to itself (block row is kept)
        mask = jnp.zeros((d, 1), A.dtype).at[r0:r0 + b].set(1.0)
        cols = cols * (1.0 - mask)
        buf = buf - cols @ rows
        buf = buf.at[..., r0:r0 + b, :].set(rows)
    return buf[..., :, d:]
