"""Entry-major block-tridiagonal band preconditioner (BCR, lanes = batch).

Same algorithm as ops/band.py (cyclic reduction over 6*fanout super-nodes;
the reference's analog is the sparse-Cholesky band structure Ceres exploits
implicitly, PoseGraphSLAM.cpp:1270), but every tensor keeps the BATCH axis
minor (in lanes) instead of AoS (m, d, d) blocks:

    A_em[p, q, m] = A[m][p, q]          shape (d, d, M)

Why (measured, round 3): the AoS pipeline costs ~2.8 ms per LM iteration at
bench scale, and the cost is NOT the batched inverses — it is (a) the six
(36, Nc) -> (Nc, 6, 6) relayout transposes feeding it, (b) the ~50-concat
super-node build, and (c) streaming tile-padded (M, 30, 30) -> (M, 32, 128)
level tensors (4.5x HBM waste) through the reduction einsums. Entry-major
kills all three: the build is strided lane slices + ROW gathers from a
static index map (both ~free on TPU), the (d, d, M) layout pads only
30 -> 32 sublanes (1.07x), and every reduction einsum/inverse is a
lane-parallel VPU op at full lane occupancy. This obeys the repo's layout
law: per-iteration data stays entry-major end to end — the CG residual
enters and leaves as (6, Nc).

Super-node entry ordering is p = 6*k + i? NO — p = i*g + k (state entry i
major, node offset k minor) so that the (6, n_pad) <-> (d, M) bridge in
band_precond_apply_em is a pure strided-lane reshape, no 6-way interleave.
Block-tridiagonal convention matches ops/band.py:

    C[m] x[m-1] + A[m] x[m] + C[m+1]^T x[m+1] = b[m]
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from solve_keyframe_pose_graph_tpu.ops.band import _next_pow2


class BCRFactorEM(NamedTuple):
    # per level: Aoinv, Co, Ce, Aoinv_prev (lane-shifted at factorize time:
    # the AoS path re-shifts per CG application, this one pays it once),
    # Ce_next — all (d, d, m)
    levels: tuple
    root_inv: jax.Array        # (d, d, m_root)


def _shift_prev(x):
    """out[..., m] = x[..., m-1], zeros at m=0 (lane shift down by 1)."""
    pad = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    return jnp.concatenate([pad, x[..., :-1]], axis=-1)


def _shift_next(x):
    """out[..., m] = x[..., m+1], zeros at the last lane."""
    pad = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    return jnp.concatenate([x[..., 1:], pad], axis=-1)


def _row_maps(group: int):
    """Static (d, d) row-index maps into the stacked de-interleaved source
    T = [slices of D then B[0..g-1] at node offsets k = 0..g-1] + zero row.

    Source row of (src, k, entry e) = (k * (1+g) + src) * 36 + e, src 0 = D,
    src 1+f = B[f]. Entry ordering p = i*g + k (module docstring)."""
    g = group
    d = 6 * g
    n_rows = g * (1 + g) * 36
    zero_row = n_rows                       # appended all-zero row

    def row(src, k, i, j):
        return (k * (1 + g) + src) * 36 + 6 * i + j

    A_idx = np.zeros((d, d), np.int32)
    C_idx = np.full((d, d), zero_row, np.int32)
    for i in range(6):
        for r in range(g):
            p = i * g + r
            for j in range(6):
                for c in range(g):
                    q = j * g + c
                    if r == c:
                        A_idx[p, q] = row(0, r, i, j)
                    elif r > c:             # B[f], f = r - c, at node k=r
                        A_idx[p, q] = row(r - c, r, i, j)
                    else:                   # transpose of block (c, r)
                        A_idx[p, q] = row(c - r, c, j, i)
                    # C[p, q]: node m*g+r (rows) vs node (m-1)*g+c (cols),
                    # f = g + r - c in 1..g  <=>  c >= r
                    if c >= r:
                        C_idx[p, q] = row(g + r - c, r, i, j)
    return A_idx, C_idx


def build_band_system_em(Dh, Bh, group: int):
    """Entry-major super-node assembly.

    Dh (36, Nc) node diagonal blocks (scaled/damped, inert-identity padding
    already applied by schur_reduce_t), Bh (F, 36, Nc) band blocks
    (Bh[f-1, :, u] couples node u rows with node u-f cols). F must equal
    group. Returns A (d, d, Mp), C (d, d, Mp), n_pad with d = 6*group and
    Mp = next_pow2(ceil(Nc/group)); padding super-nodes are identity."""
    F, _, Nc = Bh.shape
    g = group
    assert F == g, (F, g)
    d = 6 * g
    M = -(-Nc // g)
    Mp = _next_pow2(M)
    n_pad = Mp * g
    dt = Dh.dtype

    pad = n_pad - Nc
    if pad:
        eyecol = jnp.zeros((36,), dt).at[
            jnp.arange(0, 36, 7, dtype=jnp.int32)].set(1.0)
        Dh = jnp.concatenate(
            [Dh, jnp.broadcast_to(eyecol[:, None], (36, pad))], axis=1)
        Bh = jnp.concatenate([Bh, jnp.zeros((g, 36, pad), dt)], axis=2)

    # stacked source, de-interleaved by node offset k (strided lane slices)
    S = jnp.concatenate([Dh[None], Bh], axis=0)          # (1+g, 36, n_pad)
    T = jnp.stack([S[:, :, k::g] for k in range(g)], axis=0)
    T = T.reshape(g * (1 + g) * 36, Mp)
    T = jnp.concatenate([T, jnp.zeros((1, Mp), dt)], axis=0)

    A_idx, C_idx = _row_maps(g)
    A = T[A_idx.reshape(-1)].reshape(d, d, Mp)           # row gathers
    C = T[C_idx.reshape(-1)].reshape(d, d, Mp)
    # C[0] couples super-node 0 to -1: zero it (masked upstream; explicit)
    C = C * (jnp.arange(Mp) > 0).astype(dt)
    return A, C, n_pad


def build_band_system_emb(Dh, Bh, group: int):
    """Entry-major BUILD for the AoS factorize ("emb" in lm_solve): the same
    strided-slice + static-row-gather assembly as build_band_system_em, but
    with the index maps pre-permuted to the AoS super-node entry ordering
    (p = 6*k + i) and one (d*d, Mp) -> (Mp, d, d) transpose per output so
    the result is bitwise band.build_band_system's (A, C) — without the six
    (36, Nc) -> (Nc, 6, 6) relayouts and the ~50-concat super-node build
    that dominate the AoS build's cost. The permutation costs nothing: it is
    applied to the STATIC numpy index maps at trace time."""
    import dataclasses  # noqa: F401  (parallel structure with _em)

    F, _, Nc = Bh.shape
    g = group
    assert F == g, (F, g)
    d = 6 * g
    M = -(-Nc // g)
    Mp = _next_pow2(M)
    n_pad = Mp * g
    dt = Dh.dtype

    pad = n_pad - Nc
    if pad:
        eyecol = jnp.zeros((36,), dt).at[
            jnp.arange(0, 36, 7, dtype=jnp.int32)].set(1.0)
        Dh = jnp.concatenate(
            [Dh, jnp.broadcast_to(eyecol[:, None], (36, pad))], axis=1)
        Bh = jnp.concatenate([Bh, jnp.zeros((g, 36, pad), dt)], axis=2)

    S = jnp.concatenate([Dh[None], Bh], axis=0)          # (1+g, 36, n_pad)
    T = jnp.stack([S[:, :, k::g] for k in range(g)], axis=0)
    T = T.reshape(g * (1 + g) * 36, Mp)
    T = jnp.concatenate([T, jnp.zeros((1, Mp), dt)], axis=0)

    A_idx, C_idx = _row_maps(g)
    # em entry p = i*g + k  ->  AoS entry 6*k + i
    pe = np.empty(d, np.int32)
    for k in range(g):
        for i in range(6):
            pe[6 * k + i] = i * g + k
    A_idx = A_idx[np.ix_(pe, pe)]
    C_idx = C_idx[np.ix_(pe, pe)]
    A = T[A_idx.reshape(-1)].reshape(d * d, Mp)          # row gathers
    C = T[C_idx.reshape(-1)].reshape(d * d, Mp)
    C = C * (jnp.arange(Mp) > 0).astype(dt)
    A = jnp.transpose(A, (1, 0)).reshape(Mp, d, d)
    C = jnp.transpose(C, (1, 0)).reshape(Mp, d, d)
    return A, C, n_pad


def gj_inv_em(A):
    """Batched unpivoted Gauss-Jordan inverse of (d, d, m) with the batch in
    lanes: d augmented elimination sweeps, each a lane-parallel rank-1
    update of the (d, 2d, m) tableau (pure VPU work, full lane use). SPD
    inputs (damped GN blocks) need no pivoting — same contract as
    smallinv.pallas_gj_inv on the AoS path."""
    d, _, m = A.shape
    dt = A.dtype
    eye = jnp.broadcast_to(jnp.eye(d, dtype=dt)[:, :, None], (d, d, m))
    B = jnp.concatenate([A, eye], axis=1)                # (d, 2d, m)
    for j in range(d):
        rowj = B[j] / B[j, j][None, :]                   # (2d, m)
        col = B[:, j].at[j].set(0.0)                     # (d, m)
        B = B - col[:, None, :] * rowj[None, :, :]
        B = B.at[j].set(rowj)
    return B[:, d:]


def _mm(x, y):
    """(d,d,m) @ (d,d,m) lane-batched matmul."""
    return jnp.einsum("ijm,jkm->ikm", x, y)


def _mmT(x, y):
    """x^T @ y lane-batched ((d,d,m) transposed on the two major dims)."""
    return jnp.einsum("jim,jkm->ikm", x, y)


def bcr_factorize_em(A, C, max_levels: int | None = None) -> BCRFactorEM:
    """Cyclic reduction in entry-major form — mirrors band.bcr_factorize
    level by level (odd-block elimination; max_levels truncates to a
    block-diagonal root approximation, see the AoS docstring)."""
    d = A.shape[0]
    levels = []
    m = A.shape[-1]
    lvl = 0
    while m > 1 and (max_levels is None or lvl < max_levels):
        Ae, Ao = A[..., 0::2], A[..., 1::2]
        Ce, Co = C[..., 0::2], C[..., 1::2]
        Aoinv = gj_inv_em(Ao)
        Aoinv_prev = _shift_prev(Aoinv)
        Co_prev = _shift_prev(Co)
        levels.append((Aoinv, Co, Ce, Aoinv_prev, _shift_next(Ce)))

        A = (Ae
             - _mmT(Co, _mm(Aoinv, Co))
             - _mm(Ce, jnp.einsum("jkm,lkm->jlm", Aoinv_prev, Ce)))
        C = -_mm(Ce, _mm(Aoinv_prev, Co_prev))
        C = C * (jnp.arange(C.shape[-1]) > 0).astype(C.dtype)
        m //= 2
        lvl += 1
    return BCRFactorEM(levels=tuple(levels), root_inv=gj_inv_em(A))


def _mv(x, v):
    """(d,d,m) @ (d,m) lane-batched matvec."""
    return jnp.einsum("ijm,jm->im", x, v)


def bcr_solve_em(fac: BCRFactorEM, b):
    """Apply the factored band inverse to b (d, m_top). Returns (d, m_top)."""
    bs = [b]
    for (Aoinv, Co, Ce, Aoinv_prev, _) in fac.levels:
        be, bo = b[:, 0::2], b[:, 1::2]
        b = (be
             - _mv(jnp.swapaxes(Co, 0, 1), _mv(Aoinv, bo))
             - _mv(Ce, _mv(Aoinv_prev, _shift_prev(bo))))
        bs.append(b)

    x = _mv(fac.root_inv, b)

    for (Aoinv, Co, Ce, _, Ce_next), b_lvl in zip(
            reversed(fac.levels), reversed(bs[:-1])):
        bo = b_lvl[:, 1::2]
        rhs = (bo - _mv(Co, x)
               - _mv(jnp.swapaxes(Ce_next, 0, 1), _shift_next(x)))
        x_odd = _mv(Aoinv, rhs)
        m2 = x.shape[-1]
        x = jnp.stack([x, x_odd], axis=-1).reshape(x.shape[0], 2 * m2)
    return x


def band_precond_apply_em(fac: BCRFactorEM, r_n):
    """Preconditioner application straight on the entry-major CG residual
    r_n (6, Nc) -> (6, Nc). The (6, n_pad) <-> (d, m) bridge is a strided
    lane reshape thanks to the p = i*g + k entry ordering."""
    d = fac.root_inv.shape[0]
    g = d // 6
    m_top = (2 * fac.levels[0][0].shape[-1] if fac.levels
             else fac.root_inv.shape[-1])
    n_pad = m_top * g
    Nc = r_n.shape[-1]
    pad = n_pad - Nc
    rp = (jnp.concatenate([r_n, jnp.zeros((6, pad), r_n.dtype)], axis=-1)
          if pad else r_n)
    b = jnp.stack([rp[:, k::g] for k in range(g)], axis=1)  # (6, g, m)
    x = bcr_solve_em(fac, b.reshape(d, m_top))
    out = jnp.swapaxes(x.reshape(6, g, m_top), 1, 2)         # (6, m, g)
    return out.reshape(6, n_pad)[:, :Nc]
