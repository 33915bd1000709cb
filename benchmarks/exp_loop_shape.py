"""Experiment: is nested while_loop the hidden cost of the LM solve?

Compares the production lm_solve (while outer, while CG) against a
masked-fori outer loop and fori CG variants, same math, on the 5k/10k graph.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

from solve_keyframe_pose_graph_tpu.ops import band as band_ops  # noqa: E402
from solve_keyframe_pose_graph_tpu.ops import gn as gn_ops  # noqa: E402
from solve_keyframe_pose_graph_tpu.ops import lm as lm_mod  # noqa: E402
from solve_keyframe_pose_graph_tpu.ops import se3  # noqa: E402


def fori_cg(matvec, precond, b, n_iters):
    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rz = jnp.vdot(r, z)

    def body2(i, st):
        x, r, p, rz = st
        Ap = matvec(p)
        pAp = jnp.vdot(p, Ap)
        alpha = rz / jnp.where(pAp <= 0, 1.0, pAp)
        alpha = jnp.where(pAp <= 0, 0.0, alpha)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz2 = jnp.vdot(r, z)
        beta = rz2 / jnp.where(rz == 0, 1.0, rz)
        return (x, r, z + beta * p, rz2)

    x, r, p, rz = jax.lax.fori_loop(0, n_iters, body2, (x, r, p, rz))
    return x, r


def lm_fori(problem, n_lm=10, n_cg=8):
    """Masked-fori LM: fixed trip counts, same update math."""
    dt = problem.dtype
    q0, t0, s0 = problem.q, problem.t, problem.switch
    cost0 = gn_ops.evaluate_cost(problem, q0, t0, s0)

    def body(i, state):
        q, t, s, cost, radius, dec = state
        blocks = gn_ops.assemble(problem, q, t, s)
        diag_n = jnp.diagonal(blocks.D, axis1=-2, axis2=-1)
        scale_n = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(diag_n, 0)))
        scale_s = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(blocks.ds, 0)))
        lm_n = jnp.clip(diag_n * scale_n**2, 1e-6, 1e32) / radius
        lm_s = jnp.clip(blocks.ds * scale_s**2, 1e-6, 1e32) / radius
        red = gn_ops.schur_reduce(blocks, problem, scale_n, scale_s,
                                  lm_n, lm_s)
        A_band, C_band, _ = band_ops.build_band_system(
            red.Dh, red.Bh, group=problem.fanout)
        fac = band_ops.bcr_factorize(A_band, C_band, group=problem.fanout)
        mv = lambda p: gn_ops.reduced_matvec(red, problem, p)
        pc = lambda r: band_ops.band_precond_apply(fac, r)
        dxh_n, r_cg = fori_cg(mv, pc, red.rhs_n, n_cg)
        dxh_s = gn_ops.recover_switches(red, problem, dxh_n)

        bs = red.rhs_s
        quad_S = jnp.vdot(dxh_n, red.rhs_n - r_cg) + jnp.vdot(
            red.ds_inv * bs, bs)
        quad_lm = jnp.vdot(lm_n * dxh_n, dxh_n) + jnp.vdot(
            lm_s * dxh_s, dxh_s)
        model = -(jnp.vdot(blocks.g_n * scale_n, dxh_n)
                  - jnp.vdot(bs, dxh_s)) - 0.5 * (quad_S - quad_lm)

        dx_n = dxh_n * scale_n
        dx_s = dxh_s * scale_s
        m = problem.free_mask[:, None]
        q_new = se3.quat_normalize(se3.quat_box_plus(q, dx_n[:, :3]))
        q_new = q * (1 - m) + q_new * m
        t_new = t + dx_n[:, 3:] * m
        s_new = s + dx_s
        new_cost = gn_ops.evaluate_cost(problem, q_new, t_new, s_new)
        rho = (cost - new_cost) / jnp.where(model <= 0, 1.0, model)
        accept = jnp.logical_and(model > 0, rho > 1e-3)
        shrink = 1.0 - (2.0 * rho - 1.0) ** 3
        radius = jnp.where(
            accept,
            jnp.minimum(radius / jnp.maximum(jnp.asarray(1 / 3, dt), shrink),
                        1e16),
            radius / dec)
        dec = jnp.where(accept, 2.0, dec * 2.0)
        q = jnp.where(accept, q_new, q)
        t = jnp.where(accept, t_new, t)
        s = jnp.where(accept, s_new, s)
        cost = jnp.where(accept, new_cost, cost)
        return (q, t, s, cost, radius, dec)

    st = (q0, t0, s0, cost0, jnp.asarray(1e4, dt), jnp.asarray(2.0, dt))
    q, t, s, cost, _, _ = jax.lax.fori_loop(0, n_lm, body, st)
    return cost


def run(tag, fn, *args, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c = float(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{tag:34s} {np.median(ts):9.1f} ms   chi2 {c:.6g}")


def main():
    prob, _ = bench.build()
    run("while/while (production)",
        lambda: lm_mod.lm_solve(prob, max_iterations=10).final_cost)
    f = jax.jit(lambda: lm_fori(prob, n_lm=10, n_cg=8))
    run("fori/fori (10 lm x 8 cg)", f)
    f6 = jax.jit(lambda: lm_fori(prob, n_lm=10, n_cg=6))
    run("fori/fori (10 lm x 6 cg)", f6)


if __name__ == "__main__":
    main()
