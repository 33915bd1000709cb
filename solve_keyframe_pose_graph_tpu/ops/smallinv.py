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


def _gj_pallas_kernel(a_ref, o_ref, *, d: int):
    # the unrolled tableau GJ runs entirely in VMEM: one kernel instead of
    # the ~100 small XLA ops the unrolled/blocked forms emit, whose
    # per-op dispatch dominates in-context (the BCR factorization's batched
    # inversions measured ~2.8 ms/LM-iteration at bench scale; see
    # BASELINE.md round 3). Static slices only — Mosaic has no
    # dynamic_slice lowering here, and k is a Python constant anyway.
    A = a_ref[...]                                       # (Bm, d, d)
    bm = A.shape[0]
    eye = jnp.broadcast_to(
        jnp.eye(d, dtype=A.dtype)[None], (bm, d, d))
    buf = jnp.concatenate([A, eye], axis=-1)             # (Bm, d, 2d)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, d, 1), 1)
    for k in range(d):
        rowk = buf[:, k:k + 1, :]                        # (Bm, 1, 2d)
        piv = rowk[:, :, k:k + 1]                        # (Bm, 1, 1)
        rowk = rowk / piv
        colk = buf[:, :, k:k + 1]                        # (Bm, d, 1)
        upd = buf - colk * rowk
        buf = jnp.where(row_ids == k,
                        jnp.broadcast_to(rowk, buf.shape), upd)
    o_ref[...] = buf[:, :, d:]


def pallas_gj_inv(A, block_batch: int = 64):
    """Batched SPD inverse as ONE Pallas kernel (TPU): grid over the batch,
    statically-unrolled Gauss-Jordan tableau per block, all in VMEM.

    A (..., d, d) float32. Falls back to block_gj_inv off-TPU (the kernel
    is f32-only and Mosaic-only)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = A.shape[-1]
    batch = A.shape[:-2]
    n = 1
    for s in batch:
        n *= s
    Af = A.reshape((n, d, d))
    bm = min(block_batch, n)
    pad = (-n) % bm
    if pad:
        eye = jnp.broadcast_to(jnp.eye(d, dtype=A.dtype), (pad, d, d))
        Af = jnp.concatenate([Af, eye], axis=0)
    grid = ((n + pad) // bm,)
    out = pl.pallas_call(
        lambda a_ref, o_ref: _gj_pallas_kernel(a_ref, o_ref, d=d),
        grid=grid,
        in_specs=[pl.BlockSpec((bm, d, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, d, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((n + pad), d, d), A.dtype),
    )(Af)
    return out[:n].reshape(A.shape)


def best_inv(A, b: int = 6):
    """Backend-dispatched batched SPD inverse: the Pallas GJ kernel on TPU
    (f32) for supernode-sized blocks, blocked Gauss-Jordan elsewhere.
    Measured (bench scale, in-context): pallas wins at d=30 but LOSES at
    d=6 (the (6,12) tableau wastes ~95% of the (8,128) vector lanes and the
    grid overhead dominates — jacobi's (Nc,6,6) inverse was 1.7 ms/solve
    slower through the kernel)."""
    d = A.shape[-1]
    if (jax.default_backend() == "tpu" and A.dtype == jnp.float32
            and d >= 12
            # Mosaic cannot lower kernels traced under x64 (its layout
            # inference aborts on 64-bit vector types that the x64 trace
            # context introduces); the mixed-precision solve path therefore
            # takes the XLA blocked form
            and not jax.config.read("jax_enable_x64")):
        return pallas_gj_inv(A)
    if d % b == 0:
        return block_gj_inv(A, b=b)
    return gauss_jordan_inv(A)


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
