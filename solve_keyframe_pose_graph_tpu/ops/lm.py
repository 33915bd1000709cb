"""Levenberg-Marquardt trust-region driver (Ceres-compatible semantics).

One jitted program = one full LM solve (the reference's per-trigger
ceres::Solve, PoseGraphSLAM.cpp:1887-1924). Semantics mirrored from Ceres'
LevenbergMarquardtStrategy + TrustRegionMinimizer so that a 10-iteration cap
lands at a comparable chi^2:

  * jacobi column scaling s_i = 1 / (1 + sqrt(diag(J'J)_i))
  * solve (H' + diag(H')/radius) dx' = -g'   (primes = scaled quantities)
  * LM diagonal clamped to [1e-6, 1e32] (min/max_lm_diagonal)
  * step quality rho = actual_reduction / model_cost_change;
    accept if rho > 1e-3 (min_relative_decrease)
  * radius update: accept: r / max(1/3, 1 - (2rho-1)^3), cap 1e16;
    reject: r / decrease_factor, decrease_factor *= 2 (reset 2 on accept)
  * max_num_iterations counts both accepted and rejected steps
  * convergence: |cost_change| <= function_tolerance * cost, or
    step_norm <= parameter_tolerance * (x_norm + parameter_tolerance)

The inner solve is preconditioned CG (ops/pcg.py) on the structured GN
blocks (ops/gn.py) rather than a sparse Cholesky — iterative linear algebra
is the TPU-native choice. Preconditioners: band BCR (ops/band.py, default),
two-level band+coarse (ops/coarse.py — the chi^2-parity configuration, see
BASELINE.md), block-Jacobi. Two guards make the trust region robust to the
inexact solve: a rejection safeguard (a rejected step's retry solves CG
with 10x tighter forcing — a no-op when every step accepts) and the
model-cost computation from exact CG-recurrence quantities.

Execution shapes: `lm_solve` runs the whole LM loop as ONE jitted program
(the fast path); `lm_solve_chunked` runs the IDENTICAL loop as per-chunk
device dispatches with the loop state carried device-resident between them
— semantically the same trajectory, but no single dispatch exceeds one LM
iteration's work. The chunked form is what lets the emulated-fp64
escalation rung run at ANY capacity: a single whole-solve fp64 dispatch
beyond ~100 s reproducibly faults the device (UNAVAILABLE), which
previously capped the full-precision rung at 8192 nodes (VERDICT round-3
item 1); chunked, the 30k-capacity fp64 re-solve is just ~10 bounded
dispatches.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from solve_keyframe_pose_graph_tpu.ops import band as band_ops
from solve_keyframe_pose_graph_tpu.ops import coarse as coarse_ops
from solve_keyframe_pose_graph_tpu.ops import gn as gn_ops
from solve_keyframe_pose_graph_tpu.ops import pcg as pcg_ops
from solve_keyframe_pose_graph_tpu.ops import se3
from solve_keyframe_pose_graph_tpu.ops import smallinv
from solve_keyframe_pose_graph_tpu.solver.problem import Problem

MIN_LM_DIAGONAL = 1e-6
MAX_LM_DIAGONAL = 1e32
MIN_RELATIVE_DECREASE = 1e-3
MAX_RADIUS = 1e16
MIN_RADIUS = 1e-32


class LMResult(NamedTuple):
    q: jax.Array
    t: jax.Array
    switch: jax.Array
    initial_cost: jax.Array
    final_cost: jax.Array
    iterations: jax.Array          # total LM steps attempted
    successful_steps: jax.Array
    distress_rejects: jax.Array    # rejected steps whose candidate cost
                                   # OVERSHOT materially (> 0.1% above the
                                   # current cost): the fp32-conditioning
                                   # failure signature. Benign noise-floor
                                   # rejections (candidate ~= current cost at
                                   # the fp32 resolution limit, common on any
                                   # converged solve) are excluded — they
                                   # must not trigger the fp64 escalation.
    total_cg_iterations: jax.Array
    converged: jax.Array           # bool: hit a tolerance before the cap
    cg_truncation: jax.Array       # max over LM iterations of the CG exit
                                   # residual over its forcing target
                                   # (sol.rel_residual / tol): ~<=1 means
                                   # every linear solve met its forcing;
                                   # >>1 means CG was CAP-TRUNCATED far
                                   # above tolerance — the quality
                                   # signature of preconditioner-hard
                                   # graphs (sphere-class ring modes,
                                   # BASELINE.md) whose steps are inexact
                                   # without any fp32 distress


class _LoopState(NamedTuple):
    q: jax.Array
    t: jax.Array
    s: jax.Array
    blocks: object               # GNBlocksT at the CURRENT accepted point
                                 # (speculative assembly: each iteration
                                 # assembles at its candidate, fusing the
                                 # candidate cost evaluation into the same
                                 # residual pass — one residual sweep per
                                 # LM iteration instead of two)
    cost: jax.Array
    radius: jax.Array
    decrease_factor: jax.Array
    k: jax.Array
    accepted: jax.Array
    distress: jax.Array          # overshoot-rejection count (LMResult doc)
    cg_total: jax.Array
    cg_trunc: jax.Array          # running max of rel_residual / forcing
    done: jax.Array
    tighten: jax.Array           # bool: previous step was rejected ->
                                 # tighten the CG forcing for the retry
    # NOTE: no CG warm-start slot — carrying the previous scaled step across
    # re-linearizations was measured harmful (the scaling changes every
    # iteration) and a dead field in a jitted loop invites drift.


def _apply_step(q, t, s, dx_n, dx_s, node_mask, renormalize: bool):
    dth = dx_n[:, 0:3]
    dt_ = dx_n[:, 3:6]
    q_new = se3.quat_box_plus(q, dth)
    if renormalize:
        q_new = se3.quat_normalize(q_new)
    m = node_mask[:, None]
    return q * (1 - m) + q_new * m, t + dt_ * m, s + dx_s


def _lm_setup(
    problem: Problem,
    *,
    cost0=None,
    max_iterations: int = 10,
    max_cg_iterations: int = 60,
    cg_tolerance=1e-2,
    cg_q_tolerance: float = 0.0,
    initial_radius=1e4,
    function_tolerance=1e-6,
    parameter_tolerance=1e-8,
    renormalize: bool = True,
    preconditioner: str = "band",
    freeze_preconditioner: bool = False,
    residual_mode: str = "6dof",
    use_switch: bool = True,
    bcr_levels=3,
    matvec_impl: str = "auto",
    coarse_group=None,
    cg_warm_iters: int = 0,
    cg_warm_mult=3.0,
    tile_k: int = 768,
    loop_impl: str = "sorted2",
    band_impl: str = "emb",
    precision: str = "native",
):
    """Build (init_state, body, cond) for the LM while-loop — the single
    source of the loop semantics, shared by lm_solve (one whole-solve
    program) and lm_solve_chunked (per-chunk dispatches, device-resident
    state between them).

    cost0: None for a fresh solve (the initial linearization is assembled
    here and `init` is returned); a traced scalar when resuming a chunked
    solve (the caller carries the loop state — `init` comes back None and
    no initial assembly is traced into the program)."""
    if coarse_group is None:
        coarse_group = coarse_ops.auto_coarse_group(problem.q.shape[0])
    dt = problem.dtype
    f32 = lambda v: jnp.asarray(v, dt)
    mixed = precision == "mixed" and dt != jnp.float64
    hi = jnp.float64 if mixed else dt
    fhi = lambda v: jnp.asarray(v, hi)

    if matvec_impl == "auto":
        matvec_impl = "xla" if jax.default_backend() == "cpu" else "pallas"
    if matvec_impl == "pallas" and jax.config.read("jax_enable_x64"):
        # Mosaic aborts on kernels traced under the x64 context (64-bit
        # vector layouts); the XLA band matvec measured within ~0.1 ms/iter
        matvec_impl = "xla"

    if mixed:
        from solve_keyframe_pose_graph_tpu.solver.problem import (
            problem_astype,
        )
        problem_hi = problem_astype(problem, jnp.float64)
    else:
        problem_hi = problem
    if residual_mode == "4dof":
        assemble_fn = lambda q, t, s: gn_ops.assemble_4dof_t(
            problem_hi, q, t, s)
    else:
        assemble_fn = lambda q, t, s: gn_ops.assemble_t(
            problem_hi, q, t, s, use_switch=use_switch)
    # demote the hi-precision blocks for the linear algebra (no-op when
    # precision == "native")
    _lo = lambda blocks: (jax.tree_util.tree_map(f32, blocks)
                          if mixed else blocks)

    q0, t0, s0 = problem_hi.q, problem_hi.t, problem_hi.switch
    if cost0 is None:
        blocks0 = assemble_fn(q0, t0, s0)
        cost0 = blocks0.cost
    else:
        assert not freeze_preconditioner, (
            "chunked resumption cannot rebuild a frozen preconditioner "
            "from the initial linearization")
        blocks0 = None
    # dest-sorted duplicated loop incidence: once per solve, loop-invariant
    # (enables the scatter-free loop matvec — gn.loop_matvec_sorted)
    if loop_impl in ("sorted", "sorted36"):
        inc = gn_ops.build_sorted_incidence(problem)
    elif loop_impl in ("sorted2", "sorted2ng"):
        inc = gn_ops.build_sorted_incidence2(problem)
    elif loop_impl in ("tiled", "tiledng", "tiledrows", "tiledrows16",
                       "tiledrows6"):
        inc = gn_ops.build_tiled_incidence(problem, tile_k)
        import dataclasses as _dc
        if loop_impl == "tiledng":   # diagnostic, wrong results
            inc = _dc.replace(inc, fake_gather=True)
        elif loop_impl == "tiledrows":
            inc = _dc.replace(inc, gather_mode="rowsdot")
        elif loop_impl == "tiledrows16":
            # bf16 MXU one-hot contraction (f32 accumulate): the one-hot is
            # exact in bf16; only the dup-block values round to bf16
            inc = _dc.replace(
                inc, gather_mode="rowsdot",
                onehot=inc.onehot.astype(jnp.bfloat16))
        elif loop_impl == "tiledrows6":
            inc = _dc.replace(inc, gather_mode="rows6")
    elif loop_impl == "none":
        inc = "none"     # diagnostic: drop loop rows from the matvec
    else:
        inc = None

    def make_precond(red, mv=None):
        """Preconditioner application for a ReducedSystemT ((6,Nc) vectors).
        The BCR factorization runs on AoS super-node blocks (real (d,d)
        matmuls want batched-matmul form); the bridge transposes are small.
        mv (the reduced matvec) is required by the multiplicative two-grid
        variant only."""
        if preconditioner in ("band", "band+coarse", "band*coarse"):
            if band_impl == "em":
                from solve_keyframe_pose_graph_tpu.ops import band_em
                A_em, C_em, _ = band_em.build_band_system_em(
                    red.Dh, red.Bh, group=problem.fanout)
                fac_em = band_em.bcr_factorize_em(
                    A_em, C_em, max_levels=bcr_levels)
                band = lambda r: band_em.band_precond_apply_em(fac_em, r)
            else:
                if band_impl in ("emb", "emb16"):
                    # entry-major BUILD (strided lane slices + static row
                    # gathers — no 6x (36,Nc)->(Nc,6,6) relayouts, no
                    # ~50-concat super-node assembly), one (d*d,M)->(M,d,d)
                    # transpose per output; the factorize/apply keep their
                    # MXU batched-matmul form. Same (A, C) as the AoS build
                    # (test_band_em.test_build_emb_matches_aos); the full
                    # "em" pipeline loses 1.6x in-context because
                    # lane-batched (d,d,m) einsums run on the VPU and
                    # forfeit the MXU.
                    from solve_keyframe_pose_graph_tpu.ops import band_em
                    A_band, C_band, _ = band_em.build_band_system_emb(
                        red.Dh, red.Bh, group=problem.fanout)
                else:
                    Dh_aos = gn_ops.t_blocks_to_aos(red.Dh)
                    Bh_aos = jnp.stack([gn_ops.t_blocks_to_aos(red.Bh[f])
                                        for f in range(problem.fanout)])
                    A_band, C_band, _ = band_ops.build_band_system(
                        Dh_aos, Bh_aos, group=problem.fanout
                    )
                fac = band_ops.bcr_factorize(A_band, C_band,
                                             group=problem.fanout,
                                             max_levels=bcr_levels)
                if band_impl in ("aos16", "emb16"):
                    # factor in f32 (quality), STORE bf16: halves the
                    # dominant HBM stream of every CG iteration
                    fac = band_ops.cast_factor(fac, jnp.bfloat16)
                band = lambda r: band_ops.band_precond_apply(fac, r.T).T
            if preconditioner == "band":
                return band
            Hc_inv = coarse_ops.build_coarse_inverse(red, problem,
                                                     coarse_group)
            coarse = lambda r: coarse_ops.coarse_apply(
                Hc_inv, problem.free_mask, r, coarse_group)
            if preconditioner == "band+coarse":
                return lambda r: band(r) + coarse(r)
            assert mv is not None, "band*coarse needs the reduced matvec"

            def two_grid(r):
                x1 = coarse(r)
                x2 = x1 + band(r - mv(x1))
                return x2 + coarse(r - mv(x2))
            return two_grid
        if preconditioner == "identity":
            # diagnostic: no preconditioning (cost-decomposition probes)
            return lambda r: r
        Minv = smallinv.best_inv(gn_ops.t_blocks_to_aos(red.Dh))
        return lambda r: jnp.einsum("uij,uj->ui", Minv, r.T).T

    def _reduce(blocks, radius):
        diag_n = blocks.D[jnp.arange(0, 36, 7, dtype=jnp.int32)]                # (6, Nc)
        diag_s = blocks.ds                                     # (Ec,)
        scale_n = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(diag_n, 0)))
        scale_s = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(diag_s, 0)))
        # LM diagonal of the SCALED system, clamped as in Ceres
        d2_n = jnp.clip(diag_n * scale_n * scale_n, MIN_LM_DIAGONAL,
                        MAX_LM_DIAGONAL)
        d2_s = jnp.clip(diag_s * scale_s * scale_s, MIN_LM_DIAGONAL,
                        MAX_LM_DIAGONAL)
        lm_n = d2_n / radius
        lm_s = d2_s / radius
        red = gn_ops.schur_reduce_t(blocks, problem, scale_n, scale_s,
                                    lm_n, lm_s)
        return red, scale_n, scale_s, lm_n, lm_s

    pc_frozen = None
    if freeze_preconditioner:
        # Factor ONCE per solve from the initial linearization/trust region.
        # Staleness after big early steps costs CG iterations, so this is
        # worthwhile only when factorization dominates (huge graphs).
        assert preconditioner != "band*coarse", (
            "freeze_preconditioner is incompatible with the multiplicative "
            "two-grid (its internal matvec must match the live system)")
        red0, *_ = _reduce(_lo(blocks0), initial_radius)
        pc_frozen = make_precond(red0)

    def body(state: _LoopState) -> _LoopState:
        blocks = _lo(state.blocks)
        red, scale_n, scale_s, lm_n, lm_s = _reduce(blocks, state.radius)

        g_n_hat = blocks.g_n * scale_n                         # (6, Nc)

        if matvec_impl == "pallas":
            from solve_keyframe_pose_graph_tpu.ops import pallas_band
            Bup = pallas_band.shift_band_up(red.Bh)   # hoisted out of CG
        else:
            Bup = None
        if loop_impl == "sorted36":
            blocks_dup = gn_ops.dup_sorted_blocks36(red, inc)   # hoisted
            Aba_aos = None
        elif loop_impl == "sorted":
            blocks_dup = gn_ops.dup_sorted_blocks(red, inc)     # hoisted
            Aba_aos = None
        elif loop_impl in ("tiledrows", "tiledrows16", "tiledrows6"):
            blocks_dup = gn_ops.tiled_blocks_rows(red, inc)     # hoisted
            Aba_aos = None
        elif loop_impl in ("tiled", "tiledng"):
            blocks_dup = gn_ops.tiled_blocks36(red, inc)        # hoisted
            Aba_aos = None
        elif loop_impl == "none":
            blocks_dup = None
            Aba_aos = None
        else:   # scatter / sorted2 share v0's AoS einsum operands
            blocks_dup = None
            Aba_aos = gn_ops.t_blocks_to_aos(red.Aba_h)         # hoisted
        mv_impl = "s2ng" if loop_impl == "sorted2ng" else matvec_impl
        mv_red = lambda p: gn_ops.reduced_matvec_t(
            red, problem, p, impl=mv_impl, Bup=Bup, Aba_aos=Aba_aos,
            inc=inc, blocks_dup=blocks_dup)
        pc = pc_frozen if freeze_preconditioner else make_precond(red, mv_red)

        # Rejection safeguard (Eisenstat-Walker flavored): after a REJECTED
        # step, the retry at smaller radius solves with a 10x tighter CG
        # forcing. An inexact step that just failed is the signal the
        # forcing was too loose for this landscape; without this, graphs
        # like the manhattan analog rejection-cascade chaotically at the
        # 10-iteration cap. No-op on trajectories where every step accepts
        # (the common case) — those are bit-identical with or without it.
        tol_k = jnp.where(state.k < cg_warm_iters,
                          f32(cg_tolerance * cg_warm_mult),
                          f32(cg_tolerance))
        tol_k = jnp.where(state.tighten, f32(cg_tolerance * 0.1), tol_k)
        sol = pcg_ops.pcg_nodes(
            mv_red, pc, red.rhs_n,
            max_iterations=max_cg_iterations, r_tolerance=tol_k,
            q_tolerance=cg_q_tolerance,
        )
        dxh_n = sol.x                                          # (6, Nc)
        dxh_s = gn_ops.recover_switches_t(red, problem, dxh_n)

        # model cost change: -g'.dx' - 0.5 dx'.H'.dx' (H' without the LM
        # diagonal, per Ceres' model), computed from REDUCED quantities — no
        # full matvec. With S = scaled+damped H, u = 1/ds_h, bs = rhs_s,
        # bn = -g' (pre-reduction), and xs recovered exactly as u(bs - c):
        #   dx'.S dx' = xn.(H_red xn) + sum(u bs^2)      [c-terms telescope]
        #   H_red xn  = rhs_n - r_cg                      [CG recurrence]
        #   g'.dx'    = -(bn.xn + bs.xs)
        #   dx'.H'dx' = dx'.S dx' - lm_n.xn^2 - lm_s.xs^2
        bs = red.rhs_s
        quad_S = jnp.vdot(dxh_n, red.rhs_n - sol.r) + jnp.vdot(
            red.ds_inv * bs, bs)
        quad_lm = jnp.vdot(lm_n * dxh_n, dxh_n) + jnp.vdot(
            lm_s * dxh_s, dxh_s)
        dxHdx = quad_S - quad_lm
        gTdx = jnp.vdot(g_n_hat, dxh_n) - jnp.vdot(bs, dxh_s)
        model_cost_change = -gTdx - 0.5 * dxHdx

        # un-scale and apply (step application is AoS over nodes; the
        # transpose of a (6,Nc) vector is cheap). In mixed precision the
        # step is promoted so the parameter state stays float64.
        dx_n = fhi((dxh_n * scale_n).T)
        dx_s = fhi(dxh_s * scale_s)
        q_new, t_new, s_new = _apply_step(
            state.q, state.t, state.s, dx_n, dx_s, problem_hi.free_mask,
            renormalize
        )
        # speculative assembly at the candidate: its cost IS the candidate
        # cost (same residual sweep also yields the blocks the next
        # iteration needs if the step is accepted — and rejected steps are
        # rare at the parity configuration)
        blocks_new = assemble_fn(q_new, t_new, s_new)
        new_cost = blocks_new.cost

        # accept/reject arithmetic in hi precision: the cost difference of
        # two nearly equal chi^2 values is exactly the cancellation fp32
        # cannot survive on ill-conditioned graphs
        cost_change = state.cost - new_cost
        mcc_hi = fhi(model_cost_change)
        rho = cost_change / jnp.where(mcc_hi <= 0, fhi(1.0), mcc_hi)
        step_valid = model_cost_change > 0
        accept = jnp.logical_and(step_valid, rho > MIN_RELATIVE_DECREASE)

        # radius updates (Ceres LevenbergMarquardtStrategy); the radius
        # feeds the lo-precision reduce, so it stays in the problem dtype
        shrink = f32(1.0 - (2.0 * rho - 1.0) ** 3)
        radius_acc = jnp.minimum(
            state.radius / jnp.maximum(f32(1.0 / 3.0), shrink), f32(MAX_RADIUS)
        )
        radius_rej = state.radius / state.decrease_factor
        radius = jnp.where(accept, radius_acc, radius_rej)
        decrease_factor = jnp.where(accept, f32(2.0), state.decrease_factor * 2.0)

        q1 = jnp.where(accept, q_new, state.q)
        t1 = jnp.where(accept, t_new, state.t)
        s1 = jnp.where(accept, s_new, state.s)
        cost1 = jnp.where(accept, new_cost, state.cost)
        blocks1 = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), blocks_new, blocks)

        # convergence tests (on accepted steps; Ceres also stops when the
        # radius collapses)
        step_norm = jnp.sqrt(jnp.vdot(dx_n, dx_n) + jnp.vdot(dx_s, dx_s))
        x_norm = jnp.sqrt(
            jnp.vdot(state.t, state.t)
            + jnp.vdot(state.q, state.q)
            + jnp.vdot(state.s, state.s)
        )
        f_conv = jnp.abs(cost_change) <= function_tolerance * state.cost
        p_conv = step_norm <= parameter_tolerance * (x_norm + parameter_tolerance)
        done = jnp.where(
            accept,
            jnp.logical_or(f_conv, p_conv),
            radius < MIN_RADIUS,
        )

        # distress signature: a REJECTED step that moved the cost materially
        # UP (overshooting Newton step from fp32 assembly error). Rejections
        # at the fp32 noise floor (candidate within 0.1% of current) are the
        # benign end-of-descent pattern and are not counted. The absolute
        # floor (1e-9 x initial cost) keeps the RELATIVE test from misfiring
        # on perfectly-consistent graphs whose optimum cost is ~0 (e.g. the
        # engine's warmup dummy converges to ~1e-15, where any noise-floor
        # rejection exceeds 0.1% "relative" and falsely escalated).
        overshoot = jnp.logical_and(
            jnp.logical_not(accept),
            new_cost > state.cost * fhi(1.0 + 1e-3) + cost0 * fhi(1e-9))

        return _LoopState(
            q=q1, t=t1, s=s1, blocks=blocks1, cost=cost1, radius=radius,
            decrease_factor=decrease_factor, k=state.k + 1,
            accepted=state.accepted + accept.astype(jnp.int32),
            distress=state.distress + overshoot.astype(jnp.int32),
            cg_total=state.cg_total + sol.iterations,
            cg_trunc=jnp.maximum(state.cg_trunc,
                                 sol.rel_residual / tol_k),
            done=done,
            tighten=jnp.logical_not(accept),
        )

    def cond(state: _LoopState):
        return jnp.logical_and(state.k < max_iterations, jnp.logical_not(state.done))

    if blocks0 is None:
        init = None
    else:
        init = _LoopState(
            q=q0, t=t0, s=s0, blocks=blocks0, cost=cost0,
            radius=f32(initial_radius), decrease_factor=f32(2.0),
            k=jnp.int32(0), accepted=jnp.int32(0), distress=jnp.int32(0),
            cg_total=jnp.int32(0), cg_trunc=jnp.zeros((), dt),
            done=jnp.asarray(False), tighten=jnp.asarray(False),
        )
    return init, body, cond


@partial(
    jax.jit,
    static_argnames=(
        "max_iterations", "max_cg_iterations", "renormalize", "preconditioner",
        "freeze_preconditioner", "residual_mode", "use_switch",
        "bcr_levels", "outer_unroll", "matvec_impl", "coarse_group",
        "loop_impl", "cg_q_tolerance", "tile_k", "cg_warm_iters",
        "precision", "band_impl",
    ),
)
def lm_solve(
    problem: Problem,
    *,
    max_iterations: int = 10,
    max_cg_iterations: int = 60,
    cg_tolerance: float = 1e-2,
    cg_q_tolerance: float = 0.0,    # 0 = off. Ceres' eta Q-rule (0.1) is
                                    # implemented but OFF by default: with a
                                    # strong preconditioner it truncates CG
                                    # to ~2 iterations and the resulting
                                    # inexact steps make the 10-iteration
                                    # trust region rejection-chaotic
                                    # (final chi2 varied 1.4-37 run to run).
                                    # Residual forcing at 1e-2 + cap 60
                                    # reproduces the reference's exact-solve
                                    # chi2 on every benchmark graph.
    initial_radius: float = 1e4,
    function_tolerance: float = 1e-6,
    parameter_tolerance: float = 1e-8,
    renormalize: bool = True,
    preconditioner: str = "band",   # "band" (BCR) | "jacobi" |
                                    # "band+coarse" (additive two-level:
                                    # band smoother + aggregation coarse
                                    # grid carrying the loop blocks) |
                                    # "band*coarse" (symmetrized
                                    # multiplicative two-grid)
    freeze_preconditioner: bool = False,  # factor once per solve (stale but
                                          # cheap) vs once per LM iteration
    residual_mode: str = "6dof",    # "6dof" (active path) | "4dof" (Euler
                                    # variant, CeresResidues.h:252-422)
    use_switch: bool = True,        # False: plain loop edges, no switch vars
    bcr_levels=3,                   # truncate band cyclic reduction (see
                                    # band.bcr_factorize): measured equal or
                                    # BETTER chi2 than the full reduction at
                                    # a fraction of the factorize/apply cost
    outer_unroll: bool = False,     # unroll the LM loop (see below)
    matvec_impl: str = "auto",      # "auto" (pallas on TPU, xla on CPU) |
                                    # "xla" | "pallas"
    coarse_group: int | None = None,  # nodes per coarse aggregate for the
                                    # two-level preconditioners; None =
                                    # auto from problem size (coarse.
                                    # auto_coarse_group — the hands-free
                                    # product default, VERDICT r3 item 2)
    cg_warm_iters: int = 0,         # first K LM iterations solve CG with a
                                    # cg_warm_mult-times looser forcing: far
                                    # from the optimum the trust region
                                    # accepts crude steps, so tight inner
                                    # solves there only burn iterations
    cg_warm_mult: float = 3.0,
    tile_k: int = 768,              # static per-tile dup-edge capacity for
                                    # loop_impl="tiled" (gn.tile_k_for picks
                                    # it from the actual edge distribution;
                                    # must be >= the max 128-node-tile load)
    loop_impl: str = "sorted2",     # "sorted2" (per-endpoint permute +
                                    # cumsum + boundary-diff; v0's cheap
                                    # einsums untouched) | "scatter"
                                    # (at[].add) | "sorted" | "sorted36"
                                    # (duplicated-edge cumsum forms).
                                    # Measured IN-CONTEXT on the 5k/10k
                                    # bench: sorted2 190 ms/solve, scatter
                                    # 221, sorted 245, sorted36 381. The
                                    # duplicated forms win 1.8x in isolated
                                    # fori_loop probes but LOSE in the real
                                    # nested while_loop (padded (K,6,6)
                                    # intermediates get materialized);
                                    # sorted2 keeps the einsum operands
                                    # identical to scatter and only
                                    # replaces the two scatter-adds.
    band_impl: str = "emb",         # band-BCR preconditioner pipeline:
                                    # "emb" (entry-major BUILD feeding the
                                    # MXU AoS factorize —
                                    # band_em.build_band_system_emb;
                                    # bitwise = aos, MEASURED -11.3 ms/solve
                                    # at bench scale: 120.2 -> 108.9) |
                                    # "aos" ((m,d,d) batched-matmul form,
                                    # ops/band.py — the differential oracle)
                                    # | "em" (entry-major end to end;
                                    # MEASURED 1.6x SLOWER in-context:
                                    # lane-batched (d,d,m) einsums are VPU
                                    # work and lose the MXU) | "emb16" /
                                    # "aos16" (same build, factor STORED
                                    # bf16 — halves the band-factor HBM
                                    # stream of every CG iteration; factor
                                    # computed in f32)
    precision: str = "native",      # "native" (problem dtype end-to-end) |
                                    # "mixed" (float64 residual/Jacobian
                                    # assembly, parameter state and
                                    # accept/reject cost arithmetic; the
                                    # reduced system, preconditioner and CG
                                    # stay in the problem dtype). The cheap
                                    # middle rung of the adaptive-precision
                                    # ladder: fixes fp32-conditioning-
                                    # limited graphs whose failure mode is
                                    # assembly/cost cancellation (manhattan
                                    # class) without paying the ~50x of an
                                    # emulated-fp64 CG loop on TPU. Callers
                                    # must trace under jax.enable_x64().
) -> LMResult:
    init, body, cond = _lm_setup(
        problem, cost0=None,
        max_iterations=max_iterations,
        max_cg_iterations=max_cg_iterations,
        cg_tolerance=cg_tolerance, cg_q_tolerance=cg_q_tolerance,
        initial_radius=initial_radius,
        function_tolerance=function_tolerance,
        parameter_tolerance=parameter_tolerance,
        renormalize=renormalize, preconditioner=preconditioner,
        freeze_preconditioner=freeze_preconditioner,
        residual_mode=residual_mode, use_switch=use_switch,
        bcr_levels=bcr_levels, matvec_impl=matvec_impl,
        coarse_group=coarse_group, cg_warm_iters=cg_warm_iters,
        cg_warm_mult=cg_warm_mult, tile_k=tile_k, loop_impl=loop_impl,
        band_impl=band_impl, precision=precision,
    )
    cost0 = init.cost
    if outer_unroll:
        # Unroll the outer LM loop into straight-line code with a done-mask
        # (semantically identical to the while loop; converged iterations
        # waste compute). Why: XLA generates ~2.5x slower code for the inner
        # CG loop when it is nested inside an outer while_loop (measured
        # 1.23 ms vs 0.46 ms per CG iteration at bench scale); unrolling
        # removes the nesting. Costs a ~max_iterations-times larger program
        # (one-time compile).
        state = init
        for _ in range(max_iterations):
            new = body(state)
            keep = state.done
            state = jax.tree_util.tree_map(
                lambda old, nw: jnp.where(keep, old, nw), state, new)
        final = state
    else:
        final = jax.lax.while_loop(cond, body, init)

    return LMResult(
        q=final.q, t=final.t, switch=final.s,
        initial_cost=cost0, final_cost=final.cost,
        iterations=final.k, successful_steps=final.accepted,
        distress_rejects=final.distress,
        total_cg_iterations=final.cg_total, converged=final.done,
        cg_truncation=final.cg_trunc,
    )


# In-process AOT-executable caches. The escalation paths compile via
# .lower().compile() so the device lock is never held through a compile —
# but unlike jax.jit, AOT results are not cached by JAX, so repeated
# escalations would re-lower/re-compile (the persistent cache makes that
# seconds, not minutes, but seconds per escalation is still waste). Keyed
# by (solver kwargs, problem shape signature, x64 mode). Optionally backed
# by the ON-DISK executable cache (utils/cache.aot_load/aot_save,
# opt-in KPG_AOT_DISK=1 — measured a LOSS over the tunneled TPU, see
# utils/cache.py); the production warm-startup answer is
# engine.warmup(background=True) instead (the reference's
# zero-per-process-compile analog, keyframe_pose_graph_slam_node.cpp:233).
_AOT_CACHE: dict = {}


def _aot_get(key):
    compiled = _AOT_CACHE.get(key)
    if compiled is not None:
        return compiled
    from solve_keyframe_pose_graph_tpu.utils import cache as _cache

    compiled = _cache.aot_load(key)
    if compiled is not None:
        _AOT_CACHE[key] = compiled
    return compiled


def _aot_put(key, compiled):
    _AOT_CACHE[key] = compiled
    from solve_keyframe_pose_graph_tpu.utils import cache as _cache

    _cache.aot_save(key, compiled)


# lm_solve kwargs that are NOT in its static_argnames (traced scalars): the
# AOT-compiled executable is called with exactly these.
_LM_DYNAMIC = ("cg_tolerance", "initial_radius", "function_tolerance",
               "parameter_tolerance", "cg_warm_mult")


def lm_solve_aot_prepare(problem: Problem, **kw):
    """Get-or-compile the lm_solve executable for (kw, problem shapes)
    WITHOUT dispatching it — pure host work, safe off-thread while the
    device lock is held by a live trigger. Background warmup compiles
    every bucket program through this, then primes each with one dummy
    dispatch under the lock (engine.warmup)."""
    key = ("solve", tuple(sorted(kw.items())), _shape_key(problem))
    compiled = _aot_get(key)
    if compiled is None:
        compiled = lm_solve.lower(problem, **kw).compile()
        _aot_put(key, compiled)
    return compiled


def lm_solve_aot(problem: Problem, **kw) -> LMResult:
    """lm_solve through the AOT executable cache.

    Semantically identical to lm_solve(problem, **kw) (same HLO, and the
    XLA persistent cache makes the compile itself reproducible); the
    difference is dispatch machinery: on an in-process hit this is a
    direct compiled-executable call shared with the warmup/escalation
    paths (one executable per bucket program process-wide), on a full
    miss it lowers+compiles once. The engine's trigger and warmup paths
    route through this so a warmed executable is exactly the one the
    trigger later dispatches."""
    compiled = lm_solve_aot_prepare(problem, **kw)
    dyn = {k: kw[k] for k in _LM_DYNAMIC if k in kw}
    return compiled(problem, **dyn)


def _sharding_desc(x) -> tuple | None:
    """Repr-stable descriptor of a Problem leaf's device placement.

    None for host (numpy) leaves — they commit to the default device at
    dispatch, which is what an executable lowered from numpy inputs
    expects. For committed jax arrays the descriptor pins mesh shape, axis
    names, partition spec and the device assignment, so an executable
    compiled for single-device inputs is NEVER dispatched on a mesh-sharded
    problem (or vice versa) — the round-4 regression where the engine's
    production multi-chip path (config mesh.n_devices) reused a warmup's
    single-device executable and died with a sharding mismatch
    (tests/test_cli_g2o.py test_cli_config_driven_sharded_solve)."""
    import jax as _jax

    s = getattr(x, "sharding", None)
    if s is None:
        return None
    if isinstance(s, _jax.sharding.NamedSharding):
        return ("named", tuple(s.mesh.shape.items()), str(s.spec),
                tuple(str(d) for d in s.mesh.devices.flat))
    if isinstance(s, _jax.sharding.SingleDeviceSharding):
        dev = next(iter(s.device_set))
        if dev == _jax.devices()[0]:
            # committed to the DEFAULT device == where an uncommitted
            # (numpy) input lands at dispatch: the same executable serves
            # both. Without this normalization, warmup() (numpy problems)
            # and the incremental builder's device-resident problems got
            # DIFFERENT keys, so every first trigger per bucket re-lowered
            # and re-compiled the very program warmup had just built.
            return None
        return ("single", str(dev))
    return ("other", repr(s))


def _shape_key(problem: Problem):
    import jax as _jax

    return (problem.q.shape[0], problem.loop_a.shape[0],
            problem.prior_idx.shape[0], problem.odo_q.shape[0],
            str(problem.dtype), bool(_jax.config.read("jax_enable_x64")),
            tuple(_sharding_desc(leaf)
                  for leaf in jax.tree_util.tree_leaves(problem)))


@lru_cache(maxsize=64)
def _chunk_programs(kw_items: tuple):
    """Jitted (init, chunk) programs for lm_solve_chunked, cached per
    solver-kwarg tuple (all lm kwargs are hashable scalars/strings). The
    chunk program runs the SAME body/cond closures as lm_solve — only the
    outer loop is driven from the host, with the _LoopState pytree staying
    device-resident between dispatches."""
    kw = dict(kw_items)

    @jax.jit
    def init_fn(problem):
        init, _, _ = _lm_setup(problem, cost0=None, **kw)
        return init

    @jax.jit
    def chunk_fn(problem, state, k_end, cost0):
        _, body, cond = _lm_setup(problem, cost0=cost0, **kw)
        cond2 = lambda st: jnp.logical_and(cond(st), st.k < k_end)
        return jax.lax.while_loop(cond2, body, state)

    return init_fn, chunk_fn


def lm_solve_chunked(problem: Problem, *, chunk_iters: int = 1,
                     dispatch_lock=None, **lm_kw) -> LMResult:
    """lm_solve semantics as bounded per-chunk device dispatches.

    Identical trajectory to lm_solve (same body/cond closures, same loop
    state), but at most `chunk_iters` LM iterations run per dispatch and
    the host checks `done` between chunks. This bounds every dispatch to
    ~(chunk_iters x (assembly + CG-cap)) device time — which is what makes
    the emulated-fp64 escalation rung safe at ANY capacity: whole-solve
    fp64 dispatches beyond ~100 s reproducibly fault the device
    (UNAVAILABLE), the failure that used to cap the rung at 8192 nodes.
    Overhead vs lm_solve: one host round trip (the `done` fetch — the only
    reliable barrier over the tunneled device) plus one setup re-trace per
    chunk; negligible against emulated-fp64 iteration cost.

    dispatch_lock: optional threading.Lock acquired around each chunk's
    dispatch+fetch. A streaming engine running this in a background thread
    passes its device lock so latency-sensitive trigger solves get priority
    between chunks (they wait at most one chunk, never the whole solve)."""
    import contextlib

    kw = dict(lm_kw)
    kw.pop("outer_unroll", None)   # the host drive replaces any unrolling
    max_iterations = int(kw.get("max_iterations", 10))
    lock = (dispatch_lock if dispatch_lock is not None
            else contextlib.nullcontext())
    init_fn, chunk_fn = _chunk_programs(tuple(sorted(kw.items())))
    # AOT-compile BOTH programs before touching the lock: compilation does
    # not occupy the chip, and cold x64 chunk compiles run minutes — a
    # streaming engine's trigger solves must not queue behind them
    # (measured: a cold background escalation holding the device lock
    # through its compiles pushed trigger p90 to 253 s).
    base = (tuple(sorted(kw.items())), _shape_key(problem))
    init_c = _aot_get(("chunk-init",) + base)
    if init_c is None:
        init_c = init_fn.lower(problem).compile()
        _aot_put(("chunk-init",) + base, init_c)
    chunk_c = _aot_get(("chunk-step",) + base)
    with lock:
        state = init_c(problem)
        cost0 = state.cost
        k = 0
        done = bool(state.done)
    k_end0 = jnp.int32(min(k + chunk_iters, max_iterations))
    if chunk_c is None:
        chunk_c = chunk_fn.lower(problem, state, k_end0, cost0).compile()
        _aot_put(("chunk-step",) + base, chunk_c)
    while k < max_iterations and not done:
        k_end = jnp.int32(min(k + chunk_iters, max_iterations))
        with lock:
            state = chunk_c(problem, state, k_end, cost0)
            k = int(state.k)   # host fetch: the inter-chunk barrier
            done = bool(state.done)
    return LMResult(
        q=state.q, t=state.t, switch=state.s,
        initial_cost=cost0, final_cost=state.cost,
        iterations=state.k, successful_steps=state.accepted,
        distress_rejects=state.distress,
        total_cg_iterations=state.cg_total, converged=state.done,
        cg_truncation=state.cg_trunc,
    )


def lm_solve_adaptive(problem: Problem, *, escalate_rejects: int = 3,
                      fp64_backend: str = "auto",
                      **lm_kw) -> tuple[LMResult, bool]:
    """Adaptive-precision LM: fp32 solve first, fp64 re-solve on distress.

    The reference is fp64 end-to-end (Ceres doubles + SPARSE_NORMAL_CHOLESKY,
    /root/reference/src/PoseGraphSLAM.cpp:1270, CeresResidues.h:19-222) and
    never produces a chaotic outcome. Our fp32 device path is ~2% faster per
    FLOP but on ill-conditioned graphs (manhattan-class grids) the fp32
    Hessian's ~1e-3 relative assembly error turns into genuinely
    overshooting Newton steps that the trust region rejects — even with
    near-exact fp32 CG (BASELINE.md manhattan note). The observable symptom
    is OVERSHOOT rejections — rejected LM steps whose candidate cost rose
    materially (LMResult.distress_rejects). Plain rejection counts are NOT
    the signal: any converged fp32 solve can benignly reject a final step
    at its noise floor (candidate within ~1e-7 of current cost), and those
    must not trigger a ~50x-cost fp64 re-solve.

    Policy: run the fp32 solve; if distress_rejects >= escalate_rejects,
    re-run the whole solve from the same initial guesses in float64 (XLA
    emulates fp64 on TPU as double-double arithmetic — measured ~1e-14
    accurate) with the XLA matvec (Pallas kernels are fp32-only). On healthy
    graphs the escalation never fires and costs nothing but the two scalar
    fetches this wrapper does anyway.

    Returns (result, escalated)."""
    res = lm_solve(problem, **lm_kw)
    if problem.dtype == jnp.float64:
        return res, False
    if not needs_escalation(res, escalate_rejects):
        return res, False
    return escalate_resolve(problem, lm_kw, escalate_rejects,
                            fp64_backend=fp64_backend)


def needs_escalation(res: LMResult, escalate_rejects: int) -> bool:
    """Overshoot rejections alone are NOT distress: a healthy trust region
    mid-descent overshoots and rejects too (an exact fp64 solver rejects
    the same steps — e.g. the engine's warmup dummy rejects 2 of 10 while
    converging to chi^2 ~1e-15). The fp32-conditioning signature is
    overshoot rejections on a solve that FAILED to converge within its
    iteration budget (the manhattan-class pattern: 3-5/10 accepted, never
    reaching a tolerance). The threshold separates cleanly on every
    measured graph: healthy solves show 0-2 overshoot rejections (the
    warmup dummy's 2 are mid-descent trust-region overextensions an exact
    fp64 solver reproduces), conditioning-distressed ones show 5-7
    (benchmarks/warm_robust.json). escalate_rejects <= 0 forces escalation
    unconditionally (test/diagnostic hook)."""
    if escalate_rejects <= 0:
        return True
    if bool(res.converged):
        return False
    return int(res.distress_rejects) >= escalate_rejects


def escalate_resolve(problem: Problem, lm_kw: dict, escalate_rejects: int,
                     *, dispatch_lock=None, fp64_backend: str = "auto"
                     ) -> tuple[LMResult, str]:
    """The escalation ladder, entered once an fp32 solve has shown distress:
    first the cheap "mixed" rung (fp64 assembly/cost + fp32 CG — fixes the
    assembly/cost-cancellation failure mode at ~2x fp32 cost), then a full
    fp64 re-solve if mixed still shows overshoot rejections.

    The full rung runs on one of two processors (VERDICT round-4 item 3):
      * "cpu" — exact-step hardware-fp64 LM on the host: the framework's
        own residual assembly + the native block LDL^T
        (solver/cpu_rung.py). This is the reference's own mode — fp64
        Ceres SPARSE_NORMAL_CHOLESKY on CPU
        (/root/reference/src/PoseGraphSLAM.cpp:1270) — and MEASURED
        30-600x faster than TPU-emulated fp64 at every benchmark capacity
        (BASELINE.md fp64-rung table), while leaving the chip free for
        live trigger solves.
      * "tpu" — the chunked, repacked emulated-fp64 re-solve
        (lm_solve_chunked; near-exact CG forcing 1e-5:100). Available at
        every capacity; kept for processes without the native
        library/scipy and for non-6dof/switchless residual families.
    fp64_backend="auto" picks "cpu" whenever the native rung is available
    for this residual family, else "tpu".

    The CPU path goes STRAIGHT to exact fp64 — no mixed rung. The mixed
    rung exists as the cheap middle step of the DEVICE ladder (a full
    emulated-fp64 re-solve is ~50x fp32); with a 0.3-9 s exact-step rung
    available it is strictly dominated (measured: the mixed rung's one-time
    x64 trace+compile alone cost 140 s of a 151 s escalation wall on a
    fresh cache, and its quality is below the exact rung's by
    construction). Two rungs — fp32 then exact fp64 — is the reference's
    own ladder shape. Returns (result, rung) with rung in
    {"mixed", "fp64-cpu", "fp64"}."""
    if fp64_backend != "tpu":
        from solve_keyframe_pose_graph_tpu.solver import cpu_rung
        if cpu_rung.available(lm_kw):
            try:
                return cpu_rung.cpu_fp64_resolve(
                    problem, lm_kw, dispatch_lock=dispatch_lock), "fp64-cpu"
            except Exception:
                if fp64_backend == "cpu":
                    raise
                # auto: fall through to the device ladder — the insurance
                # rung must never fail outright for a recoverable reason
        elif fp64_backend == "cpu":
            raise RuntimeError(
                "fp64_backend='cpu' requested but the native CPU rung is "
                "unavailable (needs libkpg_ldl.so, scipy, a JAX CPU "
                "backend, and the 6dof+switch residual family)")
    res_m = mixed_resolve(problem, lm_kw, dispatch_lock=dispatch_lock)
    if not needs_escalation(res_m, escalate_rejects):
        return res_m, "mixed"
    return fp64_resolve(problem, lm_kw, dispatch_lock=dispatch_lock), "fp64"


def mixed_resolve(problem: Problem, lm_kw: dict, *,
                  dispatch_lock=None) -> LMResult:
    """Re-run a solve with precision="mixed" (fp64 assembly + parameter
    state, fp32 linear algebra). Traced under the scoped jax.enable_x64()
    like fp64_resolve; the Pallas matvec still applies (the CG operands
    stay fp32)."""
    import contextlib

    import jax as _jax

    kw = dict(lm_kw)
    kw["precision"] = "mixed"
    lock = (dispatch_lock if dispatch_lock is not None
            else contextlib.nullcontext())
    with _jax.enable_x64():
        # AOT-compile OUTSIDE the lock (compilation never occupies the
        # chip; see lm_solve_chunked), execute inside it. The compiled
        # callable still takes lm_solve's NON-static scalar kwargs.
        dyn = {k: kw[k] for k in ("cg_tolerance", "initial_radius",
                                  "function_tolerance",
                                  "parameter_tolerance", "cg_warm_mult")
               if k in kw}
        mkey = ("mixed", tuple(sorted(kw.items())), _shape_key(problem))
        compiled = _aot_get(mkey)
        if compiled is None:
            compiled = lm_solve.lower(problem, **kw).compile()
            _aot_put(mkey, compiled)
        with lock:
            res = compiled(problem, **dyn)
            # host fetch (not block_until_ready) — the reliable barrier
            # over a tunneled device, completed under the dispatch lock
            float(res.final_cost)
    return res


def solve_problem(problem: Problem, solver_cfg,
                  residual_mode: str = "6dof",
                  use_switch: bool = True,
                  tile_k: int | None = None) -> LMResult:
    """Convenience wrapper driven by config.SolverConfig.

    tile_k: static per-tile capacity for the tiled loop matvec, computed by
    the caller from HOST edge arrays (gn.tile_k_for). The tiled impls are
    only safe with a data-derived capacity, so when the config asks for one
    and tile_k is None this falls back to the capacity-free "sorted2"."""
    res, _ = solve_problem_adaptive(
        problem, solver_cfg, residual_mode=residual_mode,
        use_switch=use_switch, tile_k=tile_k)
    return res


def solve_problem_adaptive(problem: Problem, solver_cfg,
                           residual_mode: str = "6dof",
                           use_switch: bool = True,
                           tile_k: int | None = None
                           ) -> tuple[LMResult, bool]:
    """solve_problem + the adaptive fp64 escalation (config-gated by
    solver_cfg.adaptive_fp64 / escalate_rejects). Returns (res, escalated)
    so callers (engine solve_stats, benchmarks) can report escalations."""
    kw = cfg_lm_kwargs(solver_cfg, residual_mode=residual_mode,
                       use_switch=use_switch, tile_k=tile_k)
    if getattr(solver_cfg, "adaptive_fp64", False):
        return lm_solve_adaptive(
            problem,
            escalate_rejects=getattr(solver_cfg, "escalate_rejects", 2),
            fp64_backend=getattr(solver_cfg, "fp64_backend", "auto"),
            **kw)
    return lm_solve(problem, **kw), False


def fp64_resolve(problem: Problem, lm_kw: dict, *,
                 chunk_iters: int = 1, dispatch_lock=None) -> LMResult:
    """Re-run a solve in float64 (the escalation leg of lm_solve_adaptive,
    callable separately by hosts that defer the rejection check — e.g. the
    streaming engine's async collect path).

    The f64 trace runs under the SCOPED jax.enable_x64() context, so the
    global x64 flag — and with it every fp32 program's trace context and
    integer default widths — is untouched. Inside the scope, dtype-less
    integer constructors would default to int64, which the TPU compiler
    cannot lower (layout check: bitwidth <= 32); all traced index
    constructors in ops/ are therefore pinned to int32 explicitly.

    Two capacity measures (VERDICT round-3 items 1 and 7) make this rung
    available at EVERY problem size:
      * the problem is REPACKED to the smallest 1024-multiple capacity
        covering its live node/edge ranges (an 8.3k graph in a 16k bucket
        solves at 9216, not 16384 — the rung's cost tracks the graph, not
        the bucket), and the result is padded back to the caller's shapes;
      * the solve runs CHUNKED (lm_solve_chunked, one LM iteration per
        dispatch): no dispatch exceeds one iteration's work, so the ~100 s
        device dispatch envelope that used to cap the rung at 8192 nodes
        (MAX_FP64_NCAP, removed) no longer binds at any capacity."""
    import jax as _jax

    from solve_keyframe_pose_graph_tpu.solver.problem import (
        live_lengths, problem_astype, repack_problem,
    )

    kw64 = dict(lm_kw)
    kw64["matvec_impl"] = "xla"      # Pallas kernels are fp32-only
    # The insurance rung takes NEAR-EXACT steps: the reference's answer to
    # ill conditioning is exact fp64 Newton steps (Ceres
    # SPARSE_NORMAL_CHOLESKY, /root/reference/src/PoseGraphSLAM.cpp:1270),
    # and on chaotic instances an inexact-CG fp64 re-solve at the fp32
    # rung's loose forcing (1e-2:60) follows a different 10-iteration
    # trajectory than the exact-step reference — measured gaps to +341%
    # on perturbed bench instances (benchmarks/warm_robust.json). Tight
    # forcing makes the escalated trajectory track the exact one; the
    # extra CG iterations are irrelevant on a rung already paying ~50x
    # for emulated fp64 arithmetic. Forcing 1e-5 cap 100: certified on the
    # perturbed bench seeds (tracks the exact-step reference to +0.04% on
    # the worst instance); chunking means the cap is no longer a device-
    # envelope constraint, so it is purely the certified quality setting.
    kw64["cg_tolerance"] = min(1e-5, float(lm_kw.get("cg_tolerance", 1e-2)))
    kw64["max_cg_iterations"] = max(100,
                                    int(lm_kw.get("max_cg_iterations", 60)))
    kw64["cg_warm_iters"] = 0
    kw64["cg_q_tolerance"] = 0.0
    n_len, e_len = live_lengths(problem)
    small = repack_problem(problem, n_len, e_len)
    with _jax.enable_x64():
        res = lm_solve_chunked(problem_astype(small, jnp.float64),
                               chunk_iters=chunk_iters,
                               dispatch_lock=dispatch_lock, **kw64)
    if small.n_cap != problem.n_cap or small.e_cap != problem.e_cap:
        # pad the result back to the caller's capacities (truncated trailing
        # entries are masked-out padding/dead zones — keep their input
        # values so callers' fixed-shape slicing contracts hold)
        res = res._replace(
            q=jnp.asarray(problem.q, res.q.dtype).at[:small.n_cap].set(res.q),
            t=jnp.asarray(problem.t, res.t.dtype).at[:small.n_cap].set(res.t),
            switch=jnp.asarray(problem.switch, res.switch.dtype)
                      .at[:small.e_cap].set(res.switch),
        )
    return res


def cfg_lm_kwargs(solver_cfg, residual_mode: str = "6dof",
                  use_switch: bool = True,
                  tile_k: int | None = None) -> dict:
    """config.SolverConfig -> lm_solve keyword dict (shared by every host
    entry point so the engine, CLI, and benchmarks solve identically).

    Diagnostic-only lm_solve variants are FENCED out of this product
    surface (VERDICT round-4 item 8): "tiledng" (fake-gather A/B probe,
    wrong results), "sorted2ng" (no-gather probe, wrong results), "none"
    (drops the loop rows from the matvec) and the "identity"
    preconditioner exist only for benchmarks/ cost-decomposition A/Bs,
    which call lm_solve directly."""
    loop_impl = getattr(solver_cfg, "loop_impl", "sorted2")
    if loop_impl in ("tiledng", "sorted2ng", "none"):
        raise ValueError(
            f"loop_impl={loop_impl!r} is a diagnostic A/B variant with "
            "wrong/partial results — not a product configuration. Use "
            "'tiledrows6' (certified default) or 'sorted2'.")
    if getattr(solver_cfg, "preconditioner", "band+coarse") == "identity":
        raise ValueError(
            "preconditioner='identity' is a diagnostic probe — not a "
            "product configuration. Use 'band+coarse' (certified default), "
            "'band', or 'jacobi'.")
    if loop_impl in ("tiled", "tiledrows", "tiledrows16",
                     "tiledrows6") and tile_k is None:
        loop_impl = "sorted2"
    return dict(
        max_iterations=solver_cfg.max_lm_iterations,
        max_cg_iterations=solver_cfg.max_cg_iterations,
        cg_tolerance=solver_cfg.cg_tolerance,
        cg_q_tolerance=solver_cfg.cg_q_tolerance,
        initial_radius=solver_cfg.initial_trust_region_radius,
        function_tolerance=solver_cfg.function_tolerance,
        parameter_tolerance=solver_cfg.parameter_tolerance,
        renormalize=solver_cfg.renormalize,
        preconditioner=solver_cfg.preconditioner,
        residual_mode=residual_mode,
        use_switch=use_switch,
        bcr_levels=getattr(solver_cfg, "bcr_levels", None),
        coarse_group=getattr(solver_cfg, "coarse_group", None),
        cg_warm_iters=getattr(solver_cfg, "cg_warm_iters", 0),
        cg_warm_mult=getattr(solver_cfg, "cg_warm_mult", 3.0),
        band_impl=getattr(solver_cfg, "band_impl", "aos"),
        loop_impl=loop_impl,
        tile_k=tile_k if tile_k is not None else 768,
    )
