"""Reference-formulation CPU baseline (the Ceres stand-in).

Ceres itself is not in this environment, so the baseline reproduces the
reference solver's formulation as closely as the toolchain allows:

  * identical residuals/Jacobians (the framework's fp64 path, chi^2-parity
    tested against CeresResidues.h algebra)
  * identical LM trust-region semantics (jacobi scaling, clamped LM diagonal,
    rho/radius updates, 10-iteration cap - PoseGraphSLAM.cpp:1270-1272)
  * the inner linear solve is a CPU sparse direct factorization
    (scipy SuperLU) over the assembled normal equations - the stand-in for
    Ceres SPARSE_NORMAL_CHOLESKY.

Run standalone (forces the CPU platform, fp64):
  python benchmarks/cpu_reference.py --nodes 5000 --loops 10000
  python benchmarks/cpu_reference.py --g2o path.g2o
Prints one JSON line with chi2 trace + wall-clock.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import scipy.sparse as sp  # noqa: E402
import scipy.sparse.linalg as spla  # noqa: E402

sys.path.insert(0, "/root/repo")

from solve_keyframe_pose_graph_tpu.graph import synthetic  # noqa: E402
from solve_keyframe_pose_graph_tpu.ops import gn as gn_ops  # noqa: E402
from solve_keyframe_pose_graph_tpu.ops import se3  # noqa: E402
from solve_keyframe_pose_graph_tpu.solver.problem import (  # noqa: E402
    build_problem_np,
)

MIN_LM_DIAG, MAX_LM_DIAG = 1e-6, 1e32


def _blocks_to_sparse(blocks, problem, scale_n, scale_s, lm_n, lm_s):
    """Assemble the scaled+damped normal equations as one scipy CSC matrix
    over [node tangents (6N); switches (E)]."""
    Nc = problem.n_cap
    Ec = problem.e_cap
    F = problem.fanout
    D = np.asarray(blocks.D)
    B = np.asarray(blocks.B)
    Aba = np.asarray(blocks.Aba)
    cb = np.asarray(blocks.cb)
    ca = np.asarray(blocks.ca)
    ds = np.asarray(blocks.ds)
    sn = np.asarray(scale_n)
    ss = np.asarray(scale_s)
    la = np.asarray(problem.loop_a)
    lb = np.asarray(problem.loop_b)

    rows, cols, vals = [], [], []
    idx6 = np.arange(6)

    def add_blocks(bi, bj, M):
        """bi, bj (K,) block indices; M (K,6,6) scaled blocks."""
        r = (bi[:, None, None] * 6 + idx6[None, :, None])
        c = (bj[:, None, None] * 6 + idx6[None, None, :])
        rows.append(np.broadcast_to(r, M.shape).ravel())
        cols.append(np.broadcast_to(c, M.shape).ravel())
        vals.append(M.ravel())

    allu = np.arange(Nc)
    # diagonal blocks (scaled) + LM diagonal
    Mdiag = D * sn[:, :, None] * sn[:, None, :]
    Mdiag = Mdiag + lm_n[:, None, :] * np.eye(6)
    add_blocks(allu, allu, Mdiag)
    # band: B[f, u] couples u (rows) with u-f-1 (cols)
    for f in range(F):
        u = np.arange(f + 1, Nc)
        M = B[f, u] * sn[u, :, None] * sn[u - f - 1, None, :]
        add_blocks(u, u - f - 1, M)
        add_blocks(u - f - 1, u, np.swapaxes(M, -1, -2))
    # loop blocks: Aba couples b (rows) with a (cols)
    M = Aba * sn[lb, :, None] * sn[la, None, :]
    add_blocks(lb, la, M)
    add_blocks(la, lb, np.swapaxes(M, -1, -2))

    # switch couplings + diagonal
    off = 6 * Nc
    cbv = cb * sn[lb] * ss[:, None]          # (Ec,6)
    cav = ca * sn[la] * ss[:, None]
    er = (off + np.arange(Ec))[:, None].repeat(6, 1)
    bslot = lb[:, None] * 6 + idx6[None, :]
    aslot = la[:, None] * 6 + idx6[None, :]
    rows += [er.ravel(), bslot.ravel(), er.ravel(), aslot.ravel(),
             off + np.arange(Ec)]
    cols += [bslot.ravel(), er.ravel(), aslot.ravel(), er.ravel(),
             off + np.arange(Ec)]
    vals += [cbv.ravel(), cbv.ravel(), cav.ravel(), cav.ravel(),
             ds * ss * ss + lm_s]
    sw_rows, sw_cols, sw_vals = rows, cols, vals

    H = sp.coo_matrix(
        (np.concatenate(sw_vals),
         (np.concatenate(sw_rows), np.concatenate(sw_cols))),
        shape=(off + Ec, off + Ec),
    ).tocsc()
    return H


def cpu_reference_solve_native(problem, max_iterations=10):
    """fp64 LM with the native block-sparse LDL^T inner solve
    (native/kpg_ldl.cpp): simplicial up-looking LDL over 6x6 pose blocks
    with MMD ordering and symbolic/pattern reuse across iterations — the
    algorithm class of Ceres SPARSE_NORMAL_CHOLESKY (EIGEN_SPARSE backend).
    Switch scalars are Schur-eliminated exactly before the factorization
    (each couples only its own edge), so the factored system is the pure
    node-block system; the Newton step is identical."""
    import dataclasses
    from functools import partial

    import jax.numpy as jnp

    from solve_keyframe_pose_graph_tpu.solver.native_ldl import BlockSystem

    q = np.asarray(problem.q)
    t = np.asarray(problem.t)
    s = np.asarray(problem.switch)
    radius = 1e4
    decrease = 2.0
    Nc = problem.n_cap
    F = problem.fanout
    lb = np.asarray(problem.loop_b)
    la = np.asarray(problem.loop_a)

    band_f = np.concatenate(
        [np.full(Nc - f - 1, f, np.int64) for f in range(F)]) \
        if Nc > 1 else np.zeros(0, np.int64)
    band_u = np.concatenate(
        [np.arange(f + 1, Nc, dtype=np.int64) for f in range(F)]) \
        if Nc > 1 else np.zeros(0, np.int64)

    t_sym = time.perf_counter()
    sys_ = BlockSystem(Nc, band_f, band_u, lb, la)
    sym_wall = time.perf_counter() - t_sym

    # residual/Jacobian evaluation + scaling + switch elimination, jitted
    # once and warmed OUTSIDE the timed loop — the standing of Ceres' ahead-
    # of-time-compiled C++ cost functions. Everything downstream of this is
    # host numpy + the native LDL.
    @jax.jit
    def assemble_reduce(q_, t_, s_, radius_):
        p = dataclasses.replace(problem, q=q_, t=t_, switch=s_)
        blocks = gn_ops.assemble(p, q_, t_, s_)
        diag_n = jnp.diagonal(blocks.D, axis1=-2, axis2=-1)
        scale_n = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(diag_n, 0)))
        scale_s = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(blocks.ds, 0)))
        lm_n = jnp.clip(diag_n * scale_n**2, MIN_LM_DIAG,
                        MAX_LM_DIAG) / radius_
        lm_s = jnp.clip(blocks.ds * scale_s**2, MIN_LM_DIAG,
                        MAX_LM_DIAG) / radius_
        red = gn_ops.schur_reduce(blocks, p, scale_n, scale_s, lm_n, lm_s)
        band_vals = jnp.concatenate(
            [red.Bh[f, f + 1:] for f in range(F)], axis=0) \
            if Nc > 1 else jnp.zeros((0, 6, 6), q_.dtype)
        return (red, band_vals, blocks.g_n, scale_n, scale_s, lm_n, lm_s)

    @jax.jit
    def eval_cost(q_, t_, s_):
        p = dataclasses.replace(problem, q=q_, t=t_, switch=s_)
        return gn_ops.evaluate_cost(p, q_, t_, s_)

    @jax.jit
    def recover(red, dxh_n):
        return gn_ops.recover_switches(red, problem, dxh_n)

    @partial(jax.jit, donate_argnums=())
    def apply_step(q_, dth):
        return se3.quat_normalize(se3.quat_box_plus(q_, dth))

    # warm the compiles
    warm = assemble_reduce(jnp.asarray(q), jnp.asarray(t), jnp.asarray(s),
                           jnp.float64(radius))
    jax.block_until_ready(warm[0].rhs_n)
    _ = float(eval_cost(jnp.asarray(q), jnp.asarray(t), jnp.asarray(s)))
    _ = np.asarray(recover(warm[0], warm[0].rhs_n))
    _ = np.asarray(apply_step(jnp.asarray(q),
                              jnp.asarray(np.zeros((Nc, 3)))))

    cost = float(eval_cost(jnp.asarray(q), jnp.asarray(t), jnp.asarray(s)))
    chi2_trace = [cost]
    t0 = time.perf_counter()
    lin_wall = 0.0
    for _ in range(max_iterations):
        red, band_vals, g_n, scale_n, scale_s, lm_n, lm_s = assemble_reduce(
            jnp.asarray(q), jnp.asarray(t), jnp.asarray(s),
            jnp.float64(radius))
        scale_n = np.asarray(scale_n)
        scale_s = np.asarray(scale_s)
        lm_n = np.asarray(lm_n)
        lm_s = np.asarray(lm_s)

        t_lin = time.perf_counter()
        Ax = sys_.fill(np.asarray(red.Dh), np.asarray(band_vals), band_f,
                       np.asarray(red.Aba_h))
        ok, dxh_n = sys_.solve(Ax, np.asarray(red.rhs_n))
        assert ok, "singular diagonal block in native LDL"
        dxh_s = np.asarray(recover(red, jnp.asarray(dxh_n)))
        lin_wall += time.perf_counter() - t_lin

        # model cost change from reduced quantities (exact solve: r = 0)
        bs = np.asarray(red.rhs_s)
        ds_inv = np.asarray(red.ds_inv)
        rhs_n = np.asarray(red.rhs_n)
        quad_S = np.vdot(dxh_n, rhs_n) + np.vdot(ds_inv * bs, bs)
        quad_lm = np.vdot(lm_n * dxh_n, dxh_n) + np.vdot(lm_s * dxh_s, dxh_s)
        g_n_hat = np.asarray(g_n) * scale_n
        gTdx = np.vdot(g_n_hat, dxh_n) - np.vdot(bs, dxh_s)
        model = -gTdx - 0.5 * (quad_S - quad_lm)

        dx_n = dxh_n * scale_n
        dx_s = dxh_s * scale_s
        free = np.asarray(problem.free_mask)[:, None]
        q_new = np.asarray(apply_step(jnp.asarray(q),
                                      jnp.asarray(dx_n[:, :3])))
        q_new = q * (1 - free) + q_new * free
        t_new = t + dx_n[:, 3:] * free
        s_new = s + dx_s
        new_cost = float(eval_cost(jnp.asarray(q_new), jnp.asarray(t_new),
                                   jnp.asarray(s_new)))

        rho = (cost - new_cost) / model if model > 0 else -1.0
        if model > 0 and rho > 1e-3:
            q, t, s, cost = q_new, t_new, s_new, new_cost
            radius = min(radius / max(1.0 / 3.0,
                                      1.0 - (2.0 * rho - 1.0) ** 3), 1e16)
            decrease = 2.0
        else:
            radius /= decrease
            decrease *= 2.0
        chi2_trace.append(cost)
    wall = (time.perf_counter() - t0) * 1e3
    return {"chi2": cost, "chi2_trace": chi2_trace, "wall_ms": wall,
            "linear_solve_ms": lin_wall * 1e3,
            "symbolic_ms": sym_wall * 1e3,
            "nnz_L_blocks": sys_.ldl.nnz_blocks}


def cpu_reference_solve(problem, max_iterations=10):
    """fp64 LM with a sparse direct inner solve. Returns (result dict)."""
    q = np.asarray(problem.q)
    t = np.asarray(problem.t)
    s = np.asarray(problem.switch)
    radius = 1e4
    decrease = 2.0

    cost = float(gn_ops.evaluate_cost(problem, q, t, s))
    chi2_trace = [cost]
    t0 = time.perf_counter()
    import dataclasses
    lin_wall = 0.0
    for _ in range(max_iterations):
        p = dataclasses.replace(
            problem, q=jax.numpy.asarray(q), t=jax.numpy.asarray(t),
            switch=jax.numpy.asarray(s))
        blocks = gn_ops.assemble(p, p.q, p.t, p.switch)
        diag_n = np.diagonal(np.asarray(blocks.D), axis1=-2, axis2=-1)
        ds = np.asarray(blocks.ds)
        scale_n = 1.0 / (1.0 + np.sqrt(np.maximum(diag_n, 0)))
        scale_s = 1.0 / (1.0 + np.sqrt(np.maximum(ds, 0)))
        lm_n = np.clip(diag_n * scale_n**2, MIN_LM_DIAG, MAX_LM_DIAG) / radius
        lm_s = np.clip(ds * scale_s**2, MIN_LM_DIAG, MAX_LM_DIAG) / radius

        t_lin = time.perf_counter()
        H = _blocks_to_sparse(blocks, p, scale_n, scale_s, lm_n, lm_s)
        g = np.concatenate([
            (np.asarray(blocks.g_n) * scale_n).ravel(),
            np.asarray(blocks.g_s) * scale_s,
        ])
        # Strongest sparse-direct configuration scipy offers for an SPD
        # system: SuperLU with symmetric-mode + MMD-on-A^T+A ordering and
        # no pivot perturbation (measured ~20% faster + less fill than the
        # spsolve default COLAMD on these graphs). Ceres' actual backends
        # (CHOLMOD supernodal / Eigen SimplicialLDLT) are not installable
        # here (no network egress; no system CHOLMOD/Eigen headers) — see
        # BASELINE.md for how the speedup claims are discounted for that.
        lu = spla.splu(H, permc_spec="MMD_AT_PLUS_A",
                       options=dict(SymmetricMode=True,
                                    DiagPivotThresh=0.0))
        dx = lu.solve(-g)
        lin_wall += time.perf_counter() - t_lin

        Nc = p.n_cap
        dx_n = dx[: 6 * Nc].reshape(Nc, 6) * scale_n
        dx_s = dx[6 * Nc:] * np.asarray(scale_s)

        # model cost change (H without the LM diagonal)
        Hdx = H @ dx
        lmvec = np.concatenate([lm_n.ravel(), lm_s])
        model = -(g @ dx) - 0.5 * (dx @ (Hdx - lmvec * dx))

        free = np.asarray(p.free_mask)[:, None]
        q_new = np.asarray(se3.quat_normalize(
            se3.quat_box_plus(jax.numpy.asarray(q),
                              jax.numpy.asarray(dx_n[:, :3]))))
        q_new = q * (1 - free) + q_new * free
        t_new = t + dx_n[:, 3:] * free
        s_new = s + dx_s
        p2 = dataclasses.replace(
            p, q=jax.numpy.asarray(q_new), t=jax.numpy.asarray(t_new),
            switch=jax.numpy.asarray(s_new))
        new_cost = float(gn_ops.evaluate_cost(p2, p2.q, p2.t, p2.switch))

        rho = (cost - new_cost) / model if model > 0 else -1.0
        if model > 0 and rho > 1e-3:
            q, t, s, cost = q_new, t_new, s_new, new_cost
            radius = min(radius / max(1.0 / 3.0,
                                      1.0 - (2.0 * rho - 1.0) ** 3), 1e16)
            decrease = 2.0
        else:
            radius /= decrease
            decrease *= 2.0
        chi2_trace.append(cost)
    wall = (time.perf_counter() - t0) * 1e3
    return {"chi2": cost, "chi2_trace": chi2_trace, "wall_ms": wall,
            "linear_solve_ms": lin_wall * 1e3}


def build_circle_problem(n_nodes, n_loops, dtype=np.float64):
    g = synthetic.circle_graph(n_nodes=n_nodes, n_loops=n_loops, seed=0)
    return build_problem_np(
        q=g.vio_q, t=g.vio_t, vio_q=g.vio_q, vio_t=g.vio_t,
        node_valid=np.ones(g.n_nodes, bool),
        loop_pairs=g.loop_pairs, loop_q=g.loop_q, loop_t=g.loop_t,
        loop_w=g.loop_w, loop_valid=np.ones(g.n_loops, bool),
        switch=np.full(g.n_loops, 0.99),
        prior_idx=np.array([0]), prior_q=g.vio_q[:1], prior_t=g.vio_t[:1],
        prior_w=np.array([1.1]),
        n_cap=g.n_nodes, e_cap=g.n_loops, p_cap=1, dtype=dtype,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=5000)
    ap.add_argument("--loops", type=int, default=10000)
    ap.add_argument("--g2o", default="")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--native-ldl", action="store_true",
                    help="use the native block-sparse LDL^T inner solve "
                         "(native/kpg_ldl.cpp) instead of scipy SuperLU")
    args = ap.parse_args()

    if args.g2o:
        from solve_keyframe_pose_graph_tpu.graph import g2o as g2o_io
        g = g2o_io.load_g2o(args.g2o)
        inp = g2o_io.g2o_to_problem_inputs(g)
        n = len(inp["vio_q"])
        e = len(inp["loop_pairs"])
        problem = build_problem_np(
            q=inp["vio_q"], t=inp["vio_t"],
            vio_q=inp["vio_q"], vio_t=inp["vio_t"],
            node_valid=np.ones(n, bool),
            loop_pairs=inp["loop_pairs"], loop_q=inp["loop_q"],
            loop_t=inp["loop_t"], loop_w=inp["loop_w"],
            loop_valid=np.ones(e, bool), switch=np.full(e, 0.99),
            prior_idx=np.array([0]), prior_q=inp["vio_q"][:1],
            prior_t=inp["vio_t"][:1], prior_w=np.array([1.1]),
            n_cap=n, e_cap=e, p_cap=1, dtype=np.float64,
        )
        name = args.g2o
    else:
        problem = build_circle_problem(args.nodes, args.loops)
        name = f"circle_{args.nodes}_{args.loops}"

    solver = (cpu_reference_solve_native if args.native_ldl
              else cpu_reference_solve)
    out = solver(problem, max_iterations=args.iters)
    out["graph"] = name
    out["linear_solver"] = ("native block LDL^T (MMD)" if args.native_ldl
                            else "scipy SuperLU (MMD, symmetric mode)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
