"""Native-CPU fp64 insurance rung: exact-step LM via the block LDL^T.

The adaptive-precision ladder's full-fp64 rung exists because the reference
is fp64 end-to-end (Ceres doubles + SPARSE_NORMAL_CHOLESKY,
/root/reference/src/PoseGraphSLAM.cpp:1270) and never yields a chaotic
outcome. Round 3/4 ran that rung as TPU-emulated fp64 (double-double
arithmetic, ~50x fp32 cost): measured walls of 179 s (2k/400 streaming
distress), 414 s (manhattan-3500) and 587 s (precision seed 11) — while
the repo's own native block-sparse LDL^T (native/kpg_ldl.cpp) solves the
SAME instances exactly, in hardware fp64, in 0.3-7 s. The reference's fp64
solve runs on CPU too — this rung is the faithful analog, not a fallback.

This module is that rung as a product path (VERDICT round-4 item 3):
  * repack the live problem (solver/problem.repack_problem) and fetch it
    to the host once (the only device work — done under the engine's
    dispatch lock, so trigger solves never queue behind it);
  * run an fp64 LM with EXACT Newton steps: assembly/cost via the
    framework's own residual algebra jitted on the CPU backend (the same
    closed-form block products the chi^2-parity tests certify), switch
    scalars Schur-eliminated exactly, node system factorized by the native
    up-looking block LDL^T with best-of(RCM, MMD) ordering and the symbolic
    analysis reused across LM iterations — the algorithm class of Ceres'
    SPARSE_NORMAL_CHOLESKY with the EIGEN_SPARSE backend;
  * trust-region semantics identical to ops/lm.lm_solve (jacobi scaling,
    clamped LM diagonal, rho/radius updates, function/parameter-tolerance
    convergence, overshoot-distress counting), so the escalated result
    plugs into the same LMResult contract.

Exact steps make the CG-forcing question moot: the near-exact-forcing
certification argument for the TPU fp64 rung (BASELINE.md adaptive
precision notes) holds a fortiori — an exact-step fp64 solve IS the
per-instance reference trajectory.

Availability: needs the native library (built on demand by
solver/native_ldl.load_library), scipy (orderings), a JAX CPU backend in
this process, and the product residual family (6dof + switch constraints).
`available(lm_kw)` reports it; ops/lm.escalate_resolve dispatches here by
the fp64_backend policy and falls back to the chunked TPU rung otherwise.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from functools import partial

import numpy as np

from solve_keyframe_pose_graph_tpu.solver.problem import (
    Problem,
    live_lengths,
    repack_problem,
)

MIN_LM_DIAGONAL = 1e-6
MAX_LM_DIAGONAL = 1e32
MIN_RELATIVE_DECREASE = 1e-3
MAX_RADIUS = 1e16
MIN_RADIUS = 1e-32

# serializes host LDL/symbolic work (the native handles are not re-entrant
# per instance; escalations are rare so one-at-a-time costs nothing)
_HOST_LOCK = threading.Lock()

# cooperative shutdown for background warm threads (engine._cpu_rung_warm):
# a daemon thread killed mid-XLA-compile at process exit aborts the
# interpreter (measured: SIGABRT "exception not rethrown" in pytest), so
# warm passes check this between jit compiles and the engine's atexit
# handler sets it then joins with a bounded timeout.
_WARM_STOP = threading.Event()

_FLOAT_FIELDS = (
    "q", "t", "node_mask", "free_mask", "odo_q", "odo_t", "odo_w",
    "odo_mask", "loop_q", "loop_t", "loop_w", "loop_mask", "switch",
    "prior_q", "prior_t", "prior_w", "prior_mask",
)
_INT_FIELDS = ("loop_a", "loop_b", "prior_idx")


def _cpu_device():
    import jax

    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def available(lm_kw: dict | None = None) -> bool:
    """Can the native CPU rung run in this process / for these kwargs?"""
    if lm_kw is not None:
        if lm_kw.get("residual_mode", "6dof") != "6dof":
            return False
        if not lm_kw.get("use_switch", True):
            return False
    try:
        import scipy  # noqa: F401
    except Exception:
        return False
    from solve_keyframe_pose_graph_tpu.solver import native_ldl

    if native_ldl.load_library() is None:
        return False
    return _cpu_device() is not None


# ---------------------------------------------------------------------------
# jitted CPU helpers (module-level so repeated escalations of the same
# capacity bucket reuse the compiled executables; the persistent compile
# cache additionally reuses them across processes)
# ---------------------------------------------------------------------------

def _jits():
    """Build the jitted helper set lazily (imports jax.numpy only when the
    rung actually runs)."""
    global _J
    if "_J" in globals() and _J is not None:
        return _J
    import jax
    import jax.numpy as jnp

    from solve_keyframe_pose_graph_tpu.ops import gn as gn_ops
    from solve_keyframe_pose_graph_tpu.ops import se3

    @jax.jit
    def eval_cost(problem, q, t, s):
        p = dataclasses.replace(problem, q=q, t=t, switch=s)
        return gn_ops.evaluate_cost(p, q, t, s)

    @jax.jit
    def assemble_reduce(problem, q, t, s, radius):
        p = dataclasses.replace(problem, q=q, t=t, switch=s)
        blocks = gn_ops.assemble(p, q, t, s)
        diag_n = jnp.diagonal(blocks.D, axis1=-2, axis2=-1)
        scale_n = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(diag_n, 0)))
        scale_s = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(blocks.ds, 0)))
        lm_n = jnp.clip(diag_n * scale_n**2, MIN_LM_DIAGONAL,
                        MAX_LM_DIAGONAL) / radius
        lm_s = jnp.clip(blocks.ds * scale_s**2, MIN_LM_DIAGONAL,
                        MAX_LM_DIAGONAL) / radius
        red = gn_ops.schur_reduce(blocks, p, scale_n, scale_s, lm_n, lm_s)
        F = p.fanout
        Nc = p.n_cap
        band_vals = (jnp.concatenate([red.Bh[f, f + 1:] for f in range(F)],
                                     axis=0)
                     if Nc > 1 else jnp.zeros((0, 6, 6), q.dtype))
        return (blocks.cost, red, band_vals, blocks.g_n,
                scale_n, scale_s, lm_n, lm_s)

    @jax.jit
    def recover(red, problem, dxh_n):
        return gn_ops.recover_switches(red, problem, dxh_n)

    @jax.jit
    def apply_step(q, t, s, dx_n, dx_s, free):
        q_new = se3.quat_normalize(se3.quat_box_plus(q, dx_n[:, :3]))
        m = free[:, None]
        return (q * (1 - m) + q_new * m, t + dx_n[:, 3:] * m, s + dx_s)

    _J = (eval_cost, assemble_reduce, recover, apply_step)
    return _J


_J = None


def _band_lists(Nc: int, F: int):
    if Nc <= 1:
        z = np.zeros(0, np.int64)
        return z, z
    band_f = np.concatenate(
        [np.full(Nc - f - 1, f, np.int64) for f in range(F)])
    band_u = np.concatenate(
        [np.arange(f + 1, Nc, dtype=np.int64) for f in range(F)])
    return band_f, band_u


def _host_problem64(dev_problem: Problem) -> Problem:
    """Device Problem -> host numpy Problem in hardware fp64."""
    import jax

    leaves = {}
    for f in dataclasses.fields(Problem):
        v = np.asarray(jax.device_get(getattr(dev_problem, f.name)))
        if f.name in _INT_FIELDS:
            leaves[f.name] = np.ascontiguousarray(v)
        else:
            leaves[f.name] = np.ascontiguousarray(v, np.float64)
    return Problem(**leaves)


def lm_solve_native(problem: Problem, lm_kw: dict):
    """Exact-step fp64 LM on the host (trust-region semantics of
    ops/lm.lm_solve; inner solve = native block LDL^T).

    `problem` must be a HOST (numpy) fp64 Problem. Returns an
    ops/lm.LMResult with numpy leaves, sized to this problem's capacities.
    """
    import jax

    from solve_keyframe_pose_graph_tpu.ops.lm import LMResult
    from solve_keyframe_pose_graph_tpu.solver.native_ldl import BlockSystem

    cpu = _cpu_device()
    assert cpu is not None, "JAX CPU backend unavailable"
    max_iterations = int(lm_kw.get("max_iterations", 10))
    function_tolerance = float(lm_kw.get("function_tolerance", 1e-6))
    parameter_tolerance = float(lm_kw.get("parameter_tolerance", 1e-8))
    radius = float(lm_kw.get("initial_radius", 1e4))

    Nc, F = problem.n_cap, problem.fanout
    lb = np.asarray(problem.loop_b, np.int64)
    la = np.asarray(problem.loop_a, np.int64)
    band_f, band_u = _band_lists(Nc, F)

    with jax.default_device(cpu), jax.enable_x64():
        eval_cost, assemble_reduce, recover, apply_step = _jits()
        with _HOST_LOCK:
            sys_ = BlockSystem(Nc, band_f, band_u, lb, la)

            q = np.asarray(problem.q, np.float64)
            t = np.asarray(problem.t, np.float64)
            s = np.asarray(problem.switch, np.float64)
            free = np.asarray(problem.free_mask, np.float64)
            decrease = 2.0
            cost = cost0 = float(eval_cost(problem, q, t, s))
            k = accepted = distress = 0
            done = False
            abort_ev = lm_kw.get("_abort_event")
            while k < max_iterations and not done:
                if abort_ev is not None and abort_ev.is_set():
                    break
                (_, red, band_vals, g_n, scale_n, scale_s, lm_n, lm_s
                 ) = assemble_reduce(problem, q, t, s, np.float64(radius))
                scale_n = np.asarray(scale_n)
                scale_s = np.asarray(scale_s)
                lm_n = np.asarray(lm_n)
                lm_s = np.asarray(lm_s)
                rhs_n = np.asarray(red.rhs_n)

                Ax = sys_.fill(np.asarray(red.Dh), np.asarray(band_vals),
                               band_f, np.asarray(red.Aba_h))
                ok, dxh_n = sys_.solve(Ax, rhs_n)
                if not ok:
                    # numerically singular factor: shrink the trust region
                    # and retry (counts as a rejected step, like lm_solve's
                    # invalid-step path)
                    radius /= decrease
                    decrease *= 2.0
                    k += 1
                    done = radius < MIN_RADIUS
                    continue
                dxh_s = np.asarray(recover(red, problem, dxh_n))

                # model cost change from reduced quantities; the exact solve
                # means H_red dx = rhs exactly (CG residual r = 0)
                bs = np.asarray(red.rhs_s)
                ds_inv = np.asarray(red.ds_inv)
                quad_S = np.vdot(dxh_n, rhs_n) + np.vdot(ds_inv * bs, bs)
                quad_lm = (np.vdot(lm_n * dxh_n, dxh_n)
                           + np.vdot(lm_s * dxh_s, dxh_s))
                g_n_hat = np.asarray(g_n) * scale_n
                gTdx = np.vdot(g_n_hat, dxh_n) - np.vdot(bs, dxh_s)
                model_cost_change = -gTdx - 0.5 * (quad_S - quad_lm)

                dx_n = dxh_n * scale_n
                dx_s = dxh_s * scale_s
                q_new, t_new, s_new = (np.asarray(a) for a in apply_step(
                    q, t, s, dx_n, dx_s, free))
                new_cost = float(eval_cost(problem, q_new, t_new, s_new))

                cost_change = cost - new_cost
                rho = (cost_change / model_cost_change
                       if model_cost_change > 0 else -1.0)
                accept = model_cost_change > 0 and rho > MIN_RELATIVE_DECREASE
                if accept:
                    step_norm = float(
                        np.sqrt(np.vdot(dx_n, dx_n) + np.vdot(dx_s, dx_s)))
                    x_norm = float(np.sqrt(
                        np.vdot(t, t) + np.vdot(q, q) + np.vdot(s, s)))
                    q, t, s, cost = q_new, t_new, s_new, new_cost
                    radius = min(
                        radius / max(1.0 / 3.0,
                                     1.0 - (2.0 * rho - 1.0) ** 3),
                        MAX_RADIUS)
                    decrease = 2.0
                    accepted += 1
                    done = (abs(cost_change) <= function_tolerance * (
                        cost + cost_change)      # vs pre-step cost, as lm.py
                        or step_norm <= parameter_tolerance
                        * (x_norm + parameter_tolerance))
                else:
                    if new_cost > cost * (1.0 + 1e-3) + cost0 * 1e-9:
                        distress += 1
                    radius /= decrease
                    decrease *= 2.0
                    done = radius < MIN_RADIUS
                k += 1

    z32 = np.int32
    return LMResult(
        q=q, t=t, switch=s,
        initial_cost=np.float64(cost0), final_cost=np.float64(cost),
        iterations=z32(k), successful_steps=z32(accepted),
        distress_rejects=z32(distress),
        total_cg_iterations=z32(0), converged=np.bool_(done),
        cg_truncation=np.float64(0.0),
    )


def cpu_fp64_resolve(problem: Problem, lm_kw: dict, *,
                     dispatch_lock=None):
    """The native-CPU fp64 insurance rung, drop-in for ops/lm.fp64_resolve.

    `problem` is the DEVICE problem the distressed fp32 solve ran on. The
    device is touched exactly once (repack slices + one host fetch, under
    dispatch_lock so live trigger solves keep priority); everything else is
    host work, so a background escalation through this rung leaves the chip
    entirely to the streaming engine. Returns an LMResult padded back to
    the caller's capacities (numpy leaves)."""
    import contextlib

    lock = (dispatch_lock if dispatch_lock is not None
            else contextlib.nullcontext())
    t0 = time.perf_counter()
    with lock:
        n_len, e_len = live_lengths(problem)
        # power-of-two repack capacities, NOT the default 1024-granular
        # ones: this aligns the rung's jit/compile keys with the engine's
        # capacity-bucket staircase, so engine.warmup's background
        # cpu-rung pass (warm(), below) pre-compiles exactly the shapes a
        # mid-stream escalation hits. Worst case 2x the live problem in
        # hardware-fp64 host work — seconds, vs a ~9 s cold x64
        # trace+compile at an unwarmed shape (measured 11.8 s first
        # escalation in the 2k/400 distress row).
        small = repack_problem(problem, _pow2(n_len, 1024),
                               _pow2(e_len, 256), granularity=1)
        host = _host_problem64(small)
        if small.n_cap != problem.n_cap or small.e_cap != problem.e_cap:
            import jax
            pad_q = np.asarray(jax.device_get(problem.q), np.float64)
            pad_t = np.asarray(jax.device_get(problem.t), np.float64)
            pad_s = np.asarray(jax.device_get(problem.switch), np.float64)
        else:
            pad_q = pad_t = pad_s = None
    fetch_s = time.perf_counter() - t0

    res = lm_solve_native(host, lm_kw)
    if pad_q is not None:
        # pad back to the caller's capacities (truncated trailing entries
        # are masked-out padding/dead zones — keep their input values so
        # fixed-shape slicing contracts hold, as fp64_resolve does)
        pad_q[: small.n_cap] = res.q
        pad_t[: small.n_cap] = res.t
        pad_s[: small.e_cap] = res.switch
        res = res._replace(q=pad_q, t=pad_t, switch=pad_s)
    res_wall = time.perf_counter() - t0
    _LAST_STATS.update(fetch_s=fetch_s, total_s=res_wall,
                       n_cap=host.n_cap, e_cap=host.e_cap)
    return res


# observability: benchmarks read the last rung decomposition
_LAST_STATS: dict = {}


def _pow2(x: int, lo: int = 256) -> int:
    c = lo
    while c < int(x):
        c *= 2
    return c


def warm(n_cap: int, e_cap: int, fanout: int = 1, p_cap: int = 16) -> bool:
    """Pre-trace/compile the rung at one capacity bucket (dummy graph,
    max_iterations=1). Pure HOST work — no device contact — so production
    startup runs it on a daemon thread (engine.warmup) and a first real
    escalation pays only the ~2.5 s exact solve, not the ~9 s cold x64
    trace+lower+compile of the four jitted helpers (measured: 11.8 s cold
    first escalation in the 2k/400 distress stream, 2.5 s warm)."""
    if _WARM_STOP.is_set() or not available():
        return False
    from solve_keyframe_pose_graph_tpu.graph import synthetic
    from solve_keyframe_pose_graph_tpu.solver.problem import build_problem_np

    g = synthetic.circle_graph(n_nodes=min(64, n_cap), n_loops=8, seed=0)
    prob = build_problem_np(
        q=g.vio_q, t=g.vio_t, vio_q=g.vio_q, vio_t=g.vio_t,
        node_valid=np.ones(g.n_nodes, bool),
        loop_pairs=g.loop_pairs, loop_q=g.loop_q,
        loop_t=g.loop_t, loop_w=g.loop_w,
        loop_valid=np.ones(g.n_loops, bool),
        switch=np.full(g.n_loops, 0.99),
        prior_idx=np.array([0]), prior_q=g.vio_q[:1],
        prior_t=g.vio_t[:1], prior_w=np.array([1.1]),
        n_cap=n_cap, e_cap=e_cap, p_cap=p_cap, fanout=fanout,
        dtype=np.float64,
    )
    # force hardware-fp64 leaves via the SAME converter the escalation path
    # uses: outside an x64 scope build_problem_np canonicalizes to f32, and
    # a f32-traced warm would miss the escalation's f64 jit keys entirely
    # (measured: 6.3 s first escalation after a "warm" — zero coverage)
    prob = _host_problem64(prob)
    lm_solve_native(prob, {"max_iterations": 1,
                           "_abort_event": _WARM_STOP})
    return True
