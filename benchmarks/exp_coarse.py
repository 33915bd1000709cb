"""Experiment: CG iteration counts + quality per preconditioner variant.

Runs the bench 5k/10k graph (and optionally the g2o-analog datasets) through
lm_solve under each preconditioner and reports total CG iterations, final
cost, and (roughly) wall time. Run on the real chip; each variant is a
separate executable (distinct static args) so jit-cache cross-talk is not a
concern, but wall numbers here include dispatch overhead — use bench.py's
chained differencing for headline timing.

Usage: python benchmarks/exp_coarse.py [--graph bench|sphere|manhattan|torus]
       [--cg 60] [--tol 1e-2]
"""

import argparse
import time

import jax
import numpy as np


def build_graph(name):
    from solve_keyframe_pose_graph_tpu.graph import datasets, synthetic
    from solve_keyframe_pose_graph_tpu.graph import g2o as g2o_io
    from solve_keyframe_pose_graph_tpu.solver.problem import build_problem_np

    if name == "bench":
        g = synthetic.circle_graph(n_nodes=5000, n_loops=10000, seed=0)
        inp = {"vio_q": g.vio_q, "vio_t": g.vio_t,
               "loop_pairs": g.loop_pairs, "loop_q": g.loop_q,
               "loop_t": g.loop_t, "loop_w": g.loop_w}
        n_cap, e_cap = 8192, 16384
    else:
        g = getattr(datasets, name)()          # a G2OGraph
        inp = g2o_io.g2o_to_problem_inputs(g)
        n_cap = 1 << int(np.ceil(np.log2(len(inp["vio_q"]))))
        e_cap = 1 << int(np.ceil(np.log2(max(len(inp["loop_pairs"]), 1))))
    n = len(inp["vio_q"])
    e = len(inp["loop_pairs"])
    return build_problem_np(
        q=inp["vio_q"], t=inp["vio_t"],
        vio_q=inp["vio_q"], vio_t=inp["vio_t"],
        node_valid=np.ones(n, bool),
        loop_pairs=inp["loop_pairs"], loop_q=inp["loop_q"],
        loop_t=inp["loop_t"], loop_w=inp["loop_w"],
        loop_valid=np.ones(e, bool),
        switch=np.full(e, 0.99),
        prior_idx=np.array([0]), prior_q=inp["vio_q"][:1],
        prior_t=inp["vio_t"][:1], prior_w=np.array([1.1]),
        n_cap=n_cap, e_cap=e_cap, p_cap=8,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="bench")
    ap.add_argument("--cg", type=int, default=60)
    ap.add_argument("--tol", type=float, default=1e-2)
    ap.add_argument("--variants", default=(
        "band,band+coarse:16,band+coarse:32,band+coarse:64,band*coarse:32"))
    args = ap.parse_args()

    from solve_keyframe_pose_graph_tpu.ops import lm

    prob = build_graph(args.graph)
    print(f"graph={args.graph} backend={jax.default_backend()} "
          f"cg_cap={args.cg} tol={args.tol}")

    for spec in args.variants.split(","):
        if ":" in spec:
            pc, grp = spec.split(":")
            grp = int(grp)
        else:
            pc, grp = spec, 32
        t0 = time.perf_counter()
        res = lm.lm_solve(prob, max_iterations=10,
                          max_cg_iterations=args.cg,
                          cg_tolerance=args.tol,
                          preconditioner=pc, coarse_group=grp)
        fc = float(res.final_cost)   # host fetch = the only real barrier
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = lm.lm_solve(prob, max_iterations=10,
                          max_cg_iterations=args.cg,
                          cg_tolerance=args.tol,
                          preconditioner=pc, coarse_group=grp)
        fc = float(res.final_cost)
        wall = time.perf_counter() - t0
        print(f"{spec:>18}: cg_total={int(res.total_cg_iterations):4d} "
              f"accepted={int(res.successful_steps)}/10 "
              f"final_cost={fc:.4f} wall={wall*1e3:.0f}ms "
              f"(first={compile_s:.1f}s)")


if __name__ == "__main__":
    main()
