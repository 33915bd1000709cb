"""Loop-aware coarse-grid correction for the PCG preconditioner.

Why: the band BCR preconditioner (ops/band.py) factors the odometry chain
exactly but ignores every loop-closure off-diagonal block, so on loop-dense
graphs (the 5k/10k benchmark has 2 loop edges per node) CG still needs
~40+ iterations per LM step — the solve is CG-bound. The reference never
has this problem because Ceres factors the FULL sparse system
(SPARSE_NORMAL_CHOLESKY, /root/reference/src/PoseGraphSLAM.cpp:1270).

How (two-level aggregation, TPU-native): group `c` consecutive nodes into
one 6-DOF coarse variable (piecewise-constant prolongation P over the
trajectory — the rigid-segment motion space). The coarse operator
H_c = P^T H P is assembled from the SAME entry-major blocks the fine matvec
uses, via flat-36 scatter-adds into an (M*M, 36) table — every loop-closure
block lands in it, so long-range loop coupling is solved EXACTLY at the
coarse level. H_c is small (6M = 6*Nc/c, e.g. 960 for Nc=5120, c=32):
one dense Cholesky + explicit inverse per LM iteration puts the per-CG-
iteration cost at a single (6M,6M) matvec — MXU food.

Combined with the band smoother either additively

    M^-1 = B^-1 + P H_c^-1 P^T          ("band+coarse")

or as a symmetrized multiplicative two-grid ("band*coarse"):

    x1 = P H_c^-1 P^T r
    x2 = x1 + B^-1 (r - H x1)
    x3 = x2 + P H_c^-1 P^T (r - H x2)

Both are SPD on the free subspace (prolongation is masked by free_mask so
frozen/padded nodes never receive updates). The additive form costs one
extra matvec-free apply per CG iteration; the multiplicative form costs two
extra full matvecs but contracts more per iteration.

Measured outcome (BASELINE.md): the additive form with 64-node aggregates at
the DEFAULT CG forcing is the chi^2-parity configuration — +0.4% of the fp64
exact-step reference on the 5k/10k benchmark at essentially band-only cost,
+1.8% on sphere, +0.35% on torus, and it rescues manhattan outright (whose
band-only CG never converges even at 3x the iteration cap). Stability is
empirical: coarse_group=32 needs tighter forcing (3e-3) on loop-dense
graphs and tolerances looser than 2e-2 are rejection-chaotic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from solve_keyframe_pose_graph_tpu.ops import gn as gn_ops
from solve_keyframe_pose_graph_tpu.solver.problem import Problem

# entry permutation implementing the 6x6 transpose on flat-36 blocks
_T36 = tuple(6 * (k % 6) + k // 6 for k in range(36))


def auto_coarse_group(n_cap: int,
                      median_loop_offset: float | None = None) -> int:
    """Hands-free aggregate size for the two-level preconditioners (the
    reference needs zero per-dataset tuning, PoseGraphSLAM.cpp:1270-1272,
    so coarse_group=None resolves here instead of being a benchmark knob).

    Two measured rules compose (benchmarks/{results,sphere_quality}.json,
    BASELINE.md):

    1. STRUCTURE: ring-revisit graphs (sphere/torus class) place their
       loop endpoints a near-constant |b-a| apart; when that offset is
       under ~2 aggregates the loop blocks land on the same/adjacent
       coarse variables and the ring coupling ALIASES out of the coarse
       solve — the round-3 "+3.2% sphere edge" (sphere offset ~50 vs
       group 64: +3.17%; group 32 unchanged +3.18%; group 16 — offset ~3
       segments — +1.45% at identical forcing and CG count). The rule
       halves the group until 2*group <= median offset (floor 8).
       Loop-dense diameter-offset graphs (the 5k/10k bench: every offset
       2500) keep group 64 — the certified parity configuration.
    2. SIZE: the dense coarse factorize/apply scales as (6*Nc/group)^3/^2;
       group-64 at n_cap 32768 outgrew its payback (round-2 regression,
       1097 ms/solve) while 128 is 35% faster than band-only. The clamp
       keeps the coarse dimension 6*ceil(n_cap/group) <= 1536 — the
       largest dense coarse solve that measured profitable.

    median_loop_offset comes from host edge arrays (coarse.
    median_loop_offset, like gn.tile_k_for); callers without host data
    (direct lm_solve users) get the size-only rule."""
    group = 64
    if median_loop_offset is not None and median_loop_offset > 0:
        while group > 8 and 2 * group > median_loop_offset:
            group //= 2
    while n_cap // group > 256:          # coarse dim 6*256 = 1536 ceiling
        group *= 2
    return group


def median_loop_offset(loop_b, loop_a, loop_mask=None) -> float | None:
    """Host-side median |b - a| over VALID loop edges (None when there are
    none) — the structure statistic feeding auto_coarse_group."""
    import numpy as np
    b = np.asarray(loop_b)
    a = np.asarray(loop_a)
    if loop_mask is not None:
        m = np.asarray(loop_mask) > 0.5
        b, a = b[m], a[m]
    if b.size == 0:
        return None
    return float(np.median(np.abs(b - a)))


def build_coarse_inverse(red: "gn_ops.ReducedSystemT", problem: Problem,
                         group: int) -> jax.Array:
    """Assemble H_c = P^T H_reduced P over `group`-node aggregates and
    return its explicit inverse, shape (6M, 6M).

    All contributions come from the already scaled/damped/Schur-reduced
    blocks, so the coarse operator tracks the trust region exactly. The
    frozen-node projection in schur_reduce_t (identity diag, zeroed
    couplings) makes frozen/padded nodes contribute +I to their segment's
    diagonal block — inert, since the prolongation masks them out.
    """
    return build_coarse_inverse_arrays(
        red.Dh, red.Bh, red.Aba_h, problem.loop_b, problem.loop_a,
        problem.fanout, group)


def build_coarse_inverse_arrays(Dh, Bh, Aba_h, loop_b, loop_a,
                                fanout: int, group: int) -> jax.Array:
    """Raw-array core of build_coarse_inverse (also used by the explicitly
    sharded path, which has no Problem object)."""
    dt = Dh.dtype
    Nc = Dh.shape[-1]
    c = int(group)
    M = -(-Nc // c)
    u = jnp.arange(Nc, dtype=jnp.int32)
    seg = u // c                                        # (Nc,)

    perm = jnp.asarray(_T36, jnp.int32)

    def seg_sum(rows):
        """Per-segment row sums via reshape (nodes are segment-contiguous,
        so NO scatter is needed for node-aligned contributions — scatters
        of (Nc, 36) payloads cost ~0.1 ms each and the band used to need
        ten of them per LM iteration)."""
        pad = M * c - Nc
        if pad:
            rows = jnp.concatenate(
                [rows, jnp.zeros((pad, 36), dt)], axis=0)
        return rows.reshape(M, c, 36).sum(axis=1)       # (M, 36)

    # node-diagonal and band contributions, segment-aligned:
    #   in-segment (u-f-1 in the same segment)   -> (s, s) diagonal block
    #   boundary   (u-f-1 in the previous one)   -> (s, s-1) + transpose
    Hdiag = seg_sum(Dh.T)
    Hsub = jnp.zeros((M, 36), dt)                       # block (s, s-1)
    for f in range(fanout):
        # Bh[f][:, u] couples node u (rows) with node u-f-1 (cols); the
        # first f+1 lanes are zero blocks (masked upstream), so u < f+1
        # contributes nothing either way
        BT = Bh[f].T                                    # (Nc, 36)
        cross = ((u % c) <= f) & (u >= f + 1)
        BTc = BT * cross[:, None]
        BTi = BT - BTc
        in_sum = seg_sum(BTi)
        Hdiag = Hdiag + in_sum + in_sum[:, perm]
        Hsub = Hsub + seg_sum(BTc)

    Hc = jnp.zeros((M * M, 36), dt)
    dsl = jnp.arange(M, dtype=jnp.int32)
    Hc = Hc.at[dsl * M + dsl].add(Hdiag)                # M rows: cheap
    sub_idx = dsl * M + jnp.maximum(dsl - 1, 0)
    Hsub = Hsub.at[0].set(0.0)                          # seg 0 has no s-1
    Hc = Hc.at[sub_idx].add(Hsub)
    Hc = Hc.at[jnp.maximum(dsl - 1, 0) * M + dsl].add(Hsub[:, perm])

    # loop blocks couple arbitrary segment pairs: these two scatters stay
    sb = seg[loop_b]
    sa = seg[loop_a]
    AT = Aba_h.T                                        # (Ec, 36)
    Hc = Hc.at[sb * M + sa].add(AT)
    Hc = Hc.at[sa * M + sb].add(AT[:, perm])

    H = (Hc.reshape(M, M, 6, 6)
           .transpose(0, 2, 1, 3)
           .reshape(6 * M, 6 * M))
    # fp32 safety jitter relative to the (Jacobi-scaled ~ O(1)) diagonal
    diag_mean = jnp.mean(jnp.diagonal(H))
    H = H + (1e-5 * diag_mean) * jnp.eye(6 * M, dtype=dt)

    L = jnp.linalg.cholesky(H)
    Linv = jax.scipy.linalg.solve_triangular(
        L, jnp.eye(6 * M, dtype=dt), lower=True)
    X = Linv.T @ Linv
    # Newton refinement X <- X (2I - H X): the TPU's fp32 blocked
    # triangular solve loses ~4.5% accuracy at 6M ~ 1536 (vs min-eig 0.068
    # on the bench graph), which is enough to break the preconditioner's
    # effective positive-definiteness and destabilize the trust region at
    # scale. Two refinement steps (4 MXU matmuls, ~1-2 ms/LM iteration)
    # drive the residual to ~1e-5; symmetrize to keep M^-1 exactly
    # symmetric for CG.
    eye2 = 2.0 * jnp.eye(6 * M, dtype=dt)
    for _ in range(2):
        X = X @ (eye2 - H @ X)
        X = 0.5 * (X + X.T)
    return X


def coarse_apply(Hc_inv: jax.Array, free_mask: jax.Array, r_n: jax.Array,
                 group: int) -> jax.Array:
    """x = F P H_c^-1 P^T r for a (6, Nc) entry-major residual; returns
    (6, Nc). F = diag(free_mask) keeps frozen/padded nodes at exactly zero
    so CG never moves them (their residual is identically zero, so the
    restriction side needs no mask)."""
    Nc = r_n.shape[-1]
    c = int(group)
    M = Hc_inv.shape[0] // 6
    pad = M * c - Nc
    rT = r_n.T                                          # (Nc, 6)
    if pad:
        rT = jnp.concatenate(
            [rT, jnp.zeros((pad, 6), rT.dtype)], axis=0)
    rc = rT.reshape(M, c, 6).sum(axis=1).reshape(M * 6)
    y = (Hc_inv @ rc).reshape(M, 1, 6)
    x = jnp.broadcast_to(y, (M, c, 6)).reshape(M * c, 6)[:Nc]
    return x.T * free_mask[None, :]
