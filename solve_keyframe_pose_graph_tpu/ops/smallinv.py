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


def gauss_jordan_inv(A):
    """Inverse of a batch of SPD matrices A (..., d, d), no pivoting.

    d fused VPU steps over a (..., d, 2d) tableau; valid for SPD/strongly
    diagonally dominant blocks (all BCR inputs are damped SPD)."""
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

    buf = jax.lax.fori_loop(0, d, step, buf0)
    return buf[..., :, d:]
