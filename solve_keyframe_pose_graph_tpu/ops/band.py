"""Block-tridiagonal band preconditioner via cyclic reduction (BCR).

Why: block-Jacobi PCG on a pose chain conditions as O(N^2) — at 5k nodes the
inner CG needs thousands of iterations (measured: 500-cap exhausted every LM
step, 2.4 s/solve). The odometry band IS the chain; factoring it exactly
turns the preconditioned system into "identity + loop-closure corrections",
which CG polishes off in tens of iterations.

How (TPU-native): group `g = fanout` consecutive nodes into one super-node of
dimension d = 6g. The odometry band (offsets 1..g) then couples only adjacent
super-nodes => an exactly block-TRIDIAGONAL system. Cyclic reduction
eliminates odd super-nodes level by level: log2(M) levels, each a batch of
dense (d,d) inverses and matmuls — no sequential scan, everything batched,
which is the whole point on a TPU. Factor once per LM iteration (the damping
changes), apply once per CG iteration (log-depth matmuls).

The preconditioner matrix is the scaled+damped band part of the full GN
Hessian: diagonal blocks D (which already include loop-closure and prior
diagonal contributions) plus the odometry off-diagonal blocks B. Loop-edge
OFF-diagonal blocks are excluded (they are the sparse correction CG handles).

System convention: block-tridiagonal with diag blocks A[i] (d,d) and
sub-diagonal C[i] coupling row-block i to col-block i-1 (C[0] = 0):

    C[i] x[i-1] + A[i] x[i] + C[i+1]^T x[i+1] = b[i]
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BCRFactor(NamedTuple):
    # per level (outer list, static length): inverse of odd diag blocks,
    # odd sub-diagonals Co = C[1::2], even sub-diagonals Ce = C[0::2]
    levels: tuple
    root_inv: jax.Array        # (d, d)
    group: int                 # nodes per super-node
    n_pad: int                 # padded node count = m_pad * group


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def build_band_system(Dh, Bh, group: int):
    """Assemble the block-tridiagonal (A, C) from PRE-scaled/damped blocks.

    Dh: (Nc,6,6) node diagonal blocks (scaling, damping and any Schur
    corrections already applied — e.g. gn.ReducedSystem.Dh), Bh: (F,Nc,6,6)
    scaled band blocks (Bh[f-1,u] couples node u rows with node u-f cols).
    F must equal group. Returns A (M,d,d), C (M,d,d) with M = ceil(Nc/g)
    padded to a power of 2 and d = 6g. Padding blocks are identity."""
    F, Nc = Bh.shape[0], Dh.shape[0]
    g = group
    assert F == g, (F, g)
    d = 6 * g
    M = -(-Nc // g)
    Mp = _next_pow2(M)
    n_pad = Mp * g
    dt = Dh.dtype

    def pad_nodes(x):
        pad = n_pad - Nc
        if pad == 0:
            return x
        shape = (pad,) + x.shape[1:]
        return jnp.concatenate([x, jnp.zeros(shape, dt)], axis=0)

    Dp = pad_nodes(Dh)
    if n_pad > Nc:
        eye = jnp.broadcast_to(jnp.eye(6, dtype=dt), (n_pad - Nc, 6, 6))
        Dp = Dp.at[Nc:].set(eye)

    # super-node assembly, concat-built (no dynamic-update-slices: TPU
    # handles big concatenations far better than strided tile writes)
    Dr = Dp.reshape(Mp, g, 6, 6)
    Br = [pad_nodes(Bh[f - 1]).reshape(Mp, g, 6, 6) for f in range(1, g + 1)]
    zero66 = jnp.zeros((Mp, 6, 6), dt)

    a_rows = []
    c_rows = []
    for r in range(g):
        a_blocks = []
        c_blocks = []
        for c in range(g):
            # A[r, c]: coupling between node gI+r and node gI+c
            if r == c:
                a_blocks.append(Dr[:, r])
            elif r > c:                      # f = r - c in 1..g-1
                a_blocks.append(Br[r - c - 1][:, r])
            else:                            # upper triangle: transpose
                a_blocks.append(jnp.swapaxes(Br[c - r - 1][:, c], -1, -2))
            # C[r, c]: coupling node gI+r (row) with node g(I-1)+c (col);
            # f = g + r - c in 1..g  <=>  c >= r
            if c >= r:
                c_blocks.append(Br[g + r - c - 1][:, r])
            else:
                c_blocks.append(zero66)
        a_rows.append(jnp.concatenate(a_blocks, axis=-1))   # (Mp, 6, d)
        c_rows.append(jnp.concatenate(c_blocks, axis=-1))
    A = jnp.concatenate(a_rows, axis=-2)                    # (Mp, d, d)
    C = jnp.concatenate(c_rows, axis=-2)
    # C[0] couples super-node 0 to -1: zero it (those B rows are masked
    # upstream, but be explicit)
    C = C.at[0].set(jnp.zeros((d, d), dt))
    return A, C, n_pad


def bcr_factorize(A, C, group: int, max_levels: int | None = None
                  ) -> BCRFactor:
    """Cyclic-reduction factorization. Static log2(M) levels of batched
    (d,d) inverses (unpivoted Gauss-Jordan — SPD inputs) and matmuls.

    max_levels truncates the reduction: the remaining coarse block-
    tridiagonal system is approximated by its BLOCK-DIAGONAL inverse
    (SPD-preserving), dropping band coupling beyond ~group*2^L nodes —
    scales where loop closures dominate anyway. Cuts both factorization and
    apply cost (each level is a serial round of small batched ops)."""
    from solve_keyframe_pose_graph_tpu.ops.smallinv import best_inv

    dt = A.dtype
    d = A.shape[-1]

    # batched SPD inverse: ONE Pallas GJ kernel on TPU (the blocked XLA
    # forms emit ~100 small ops whose dispatch dominated the LM intercept);
    # blocked 6x6-pivot Gauss-Jordan elsewhere
    inv = best_inv

    levels = []
    m = A.shape[0]
    n_pad = m * group
    lvl = 0
    while m > 1 and (max_levels is None or lvl < max_levels):
        Ae, Ao = A[0::2], A[1::2]
        Ce, Co = C[0::2], C[1::2]
        Aoinv = inv(Ao)
        levels.append((Aoinv, Co, Ce))

        # shifted quantities for the j-1 terms (j = reduced index)
        zero = jnp.zeros((1, d, d), dt)
        Aoinv_prev = jnp.concatenate([zero, Aoinv[:-1]], axis=0)
        Co_prev = jnp.concatenate([zero, Co[:-1]], axis=0)

        CoT = jnp.swapaxes(Co, -1, -2)
        A_new = (
            Ae
            - jnp.einsum("mij,mjk,mkl->mil", CoT, Aoinv, Co)
            - jnp.einsum("mij,mjk,mlk->mil", Ce, Aoinv_prev, Ce)
        )
        C_new = -jnp.einsum("mij,mjk,mkl->mil", Ce, Aoinv_prev, Co_prev)
        C_new = C_new.at[0].set(jnp.zeros((d, d), dt))
        A, C = A_new, C_new
        m //= 2
        lvl += 1
    # coarse solve: exact root at m == 1, block-diagonal approx otherwise
    root_inv = inv(A)
    return BCRFactor(levels=tuple(levels), root_inv=root_inv, group=group,
                     n_pad=n_pad)


def _prev_blocks(x):
    """x[j] -> x[j-1], zeros at j=0."""
    zero = jnp.zeros((1,) + x.shape[1:], x.dtype)
    return jnp.concatenate([zero, x[:-1]], axis=0)


def cast_factor(fac: BCRFactor, dtype) -> BCRFactor:
    """Cast the factor TENSORS (not the apply arithmetic) to `dtype` —
    bfloat16 halves the dominant HBM stream of every CG iteration (the
    (m, d, d) level tensors re-read per application). The apply stays a
    fixed, symmetric linear-ish operator; the ~4e-3 relative rounding is a
    preconditioner perturbation CG absorbs (validated by unchanged
    iteration counts — see BASELINE.md round 3)."""
    c = lambda a: a.astype(dtype)
    return BCRFactor(
        levels=tuple((c(Ai), c(Co), c(Ce)) for (Ai, Co, Ce) in fac.levels),
        root_inv=c(fac.root_inv), group=fac.group, n_pad=fac.n_pad)


def bcr_solve(fac: BCRFactor, b):
    """Apply the factored band inverse to b (n_pad//group, d) node-stacked
    rhs. Returns x of the same shape (in b's dtype).

    When the factor tensors are lower precision (cast_factor), the vector
    operands are cast to match AT EACH USE — loop-variant casts fuse into
    the einsums instead of hoisting f32 copies of the (loop-invariant)
    factor out of the CG loop — and every contraction accumulates in b's
    dtype via preferred_element_type."""
    d = fac.root_inv.shape[-1]
    dt = b.dtype
    lo = fac.root_inv.dtype
    cv = (lambda v: v.astype(lo)) if lo != dt else (lambda v: v)

    # forward: reduce rhs level by level
    bs = [b]
    for (Aoinv, Co, Ce) in fac.levels:
        be, bo = b[0::2], b[1::2]
        bo_prev = _prev_blocks(bo)
        CoT = jnp.swapaxes(Co, -1, -2)
        b = (
            be
            - jnp.einsum("mij,mjk,mk->mi", CoT, Aoinv, cv(bo),
                         preferred_element_type=dt)
            - jnp.einsum("mij,mjk,mk->mi", Ce, _prev_blocks(Aoinv),
                         cv(bo_prev), preferred_element_type=dt)
        )
        bs.append(b)

    # coarse solve (exact root at m == 1; block-diagonal approx when the
    # reduction was truncated)
    x = jnp.einsum("mij,mj->mi", fac.root_inv, cv(b),
                   preferred_element_type=dt)            # (m_coarse, d)

    # backward: recover odd blocks
    for (Aoinv, Co, Ce), b_lvl in zip(reversed(fac.levels), reversed(bs[:-1])):
        bo = b_lvl[1::2]
        m2 = bo.shape[0]
        x_even = x                      # (m2, d)
        zero = jnp.zeros((1, d), dt)
        x_even_next = jnp.concatenate([x_even[1:], zero], axis=0)
        Ce_next = jnp.concatenate(
            [Ce[1:], jnp.zeros((1, d, d), Ce.dtype)], axis=0)
        rhs = (bo
               - jnp.einsum("mij,mj->mi", Co, cv(x_even),
                            preferred_element_type=dt)
               - jnp.einsum("mji,mj->mi", Ce_next, cv(x_even_next),
                            preferred_element_type=dt))
        x_odd = jnp.einsum("mij,mj->mi", Aoinv, cv(rhs),
                           preferred_element_type=dt)
        x = jnp.stack([x_even, x_odd], axis=1).reshape(2 * m2, d)
    return x


def band_precond_apply(fac: BCRFactor, r_n):
    """Preconditioner application for the node part: reshape (Nc,6) residual
    into super-node blocks, band-solve, reshape back.

    Padding amounts are derived from STATIC level shapes (fac.n_pad/group
    become tracers under jit since BCRFactor is a pytree)."""
    Nc = r_n.shape[0]
    d = fac.root_inv.shape[-1]
    g = d // 6
    m_top = (2 * fac.levels[0][0].shape[0] if fac.levels
             else fac.root_inv.shape[0])
    n_pad = m_top * g
    pad = n_pad - Nc
    rp = (jnp.concatenate([r_n, jnp.zeros((pad, 6), r_n.dtype)], axis=0)
          if pad else r_n)
    x = bcr_solve(fac, rp.reshape(-1, d))
    return x.reshape(-1, 6)[:Nc]
