"""Marginal-cost analysis of the LM solve: total time vs iteration counts,
plus isolation of the PCG loop shape (while vs fori, identity vs band pc).
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
from solve_keyframe_pose_graph_tpu.ops import lm  # noqa: E402


def run(tag, fn, *args, reps=3):
    float(jax.tree_util.tree_leaves(fn(*args))[0].sum())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jax.tree_util.tree_leaves(fn(*args))[0].sum())
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{tag:34s} {np.median(ts):9.1f} ms")
    return np.median(ts)


def main():
    prob, _ = bench.build()

    # marginal LM-iteration cost (forcing full iteration counts by disabling
    # convergence via tiny tolerances is unnecessary: this graph runs all 10)
    t1 = run("lm_solve k=1", lambda: lm.lm_solve(
        prob, max_iterations=1))
    t2 = run("lm_solve k=2", lambda: lm.lm_solve(
        prob, max_iterations=2))
    t5 = run("lm_solve k=5", lambda: lm.lm_solve(
        prob, max_iterations=5))
    t10 = run("lm_solve k=10", lambda: lm.lm_solve(
        prob, max_iterations=10))
    print(f"  marginal per-iter ~ {(t10 - t2) / 8:.2f} ms; "
          f"intercept ~ {t2 - 2 * (t10 - t2) / 8:.1f} ms")

    # PCG loop-shape isolation on a frozen reduced system
    blocks = jax.jit(lambda: gn_ops.assemble(prob, prob.q, prob.t,
                                             prob.switch))()
    diag_n = jnp.diagonal(blocks.D, axis1=-2, axis2=-1)
    scale_n = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(diag_n, 0)))
    scale_s = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(blocks.ds, 0)))
    lm_n = jnp.clip(diag_n * scale_n**2, 1e-6, 1e32) / 1e4
    lm_s = jnp.clip(blocks.ds * scale_s**2, 1e-6, 1e32) / 1e4
    red = jax.jit(lambda: gn_ops.schur_reduce(
        blocks, prob, scale_n, scale_s, lm_n, lm_s))()
    A_band, C_band, _ = jax.jit(lambda: band_ops.build_band_system(
        red.Dh, red.Bh, group=prob.fanout))()
    fac = jax.jit(lambda: band_ops.bcr_factorize(
        A_band, C_band, group=prob.fanout))()

    N_IT = 16

    def fori_matvec_only():
        def body(i, x):
            y = gn_ops.reduced_matvec(red, prob, x)
            return x + 1e-20 * y
        return jax.lax.fori_loop(0, N_IT, body, red.rhs_n)
    run(f"fori x{N_IT}: matvec only", jax.jit(fori_matvec_only))

    def fori_pc_only():
        def body(i, x):
            y = band_ops.band_precond_apply(fac, x)
            return x + 1e-20 * y
        return jax.lax.fori_loop(0, N_IT, body, red.rhs_n)
    run(f"fori x{N_IT}: band pc only", jax.jit(fori_pc_only))

    def fori_mv_pc_dots():
        def body(i, carry):
            x, acc = carry
            y = gn_ops.reduced_matvec(red, prob, x)
            z = band_ops.band_precond_apply(fac, y)
            a = jnp.vdot(y, z)
            b = jnp.vdot(x, y)
            return (x + 1e-20 * z, acc + a / (b + 1.0))
        return jax.lax.fori_loop(0, N_IT, body,
                                 (red.rhs_n, jnp.float32(0.0)))
    run(f"fori x{N_IT}: mv+pc+2 vdots", jax.jit(fori_mv_pc_dots))

    from solve_keyframe_pose_graph_tpu.ops import pcg as pcg_ops

    def while_pcg_id():
        mv = lambda p: gn_ops.reduced_matvec(red, prob, p)
        pc = lambda r: r
        return pcg_ops.pcg_nodes(mv, pc, red.rhs_n, max_iterations=N_IT,
                                 r_tolerance=0.0, q_tolerance=0.0).x
    run(f"while pcg x{N_IT}: identity pc", jax.jit(while_pcg_id))

    def while_pcg_band():
        mv = lambda p: gn_ops.reduced_matvec(red, prob, p)
        pc = lambda r: band_ops.band_precond_apply(fac, r)
        return pcg_ops.pcg_nodes(mv, pc, red.rhs_n, max_iterations=N_IT,
                                 r_tolerance=0.0, q_tolerance=0.0).x
    run(f"while pcg x{N_IT}: band pc", jax.jit(while_pcg_band))


if __name__ == "__main__":
    main()
