"""Headline benchmark: one full LM solve on the 5k-node / 10k-loop-edge
multi-revolution graph (BASELINE.md config 5's graph size), 10 LM iterations
with switchable constraints — the reference's per-trigger
ceres::Solve(SPARSE_NORMAL_CHOLESKY, 10 iters) workload
(/root/reference/src/PoseGraphSLAM.cpp:1270-1272,1887-1924).

Runs the QUALITY-PARITY solver configuration (residual-forced CG, chi^2
0.41 vs the fp64 exact-solve reference's 0.40 on this graph; see
BASELINE.md). A faster truncated mode (Ceres' eta Q-rule) exists but its
10-iteration outcomes are chaotic on loop-dense graphs; benchmarking it
would be benchmarking luck.

Prints ONE JSON line:
  {"metric": "lm_solve_5k10k_ms", "value": <median ms per solve>,
   "unit": "ms", "vs_baseline": <100ms-target / value>}

vs_baseline > 1.0 means faster than the BASELINE.json north-star target of
100 ms per solve on one TPU v5e chip (the reference publishes no numbers of
its own — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

# Persistent compile cache: re-runs of this benchmark (driver end-of-round,
# repeated local runs) skip the ~250 s cold compile of the chained parity
# program (~7 s warm over the tunnel). Keys include the program HLO, so any
# solver edit safely invalidates entries. Set before jax backend init.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import numpy as np

TARGET_MS = 100.0
N_NODES = 5000
N_LOOPS = 10000
N_CAP = 8192
E_CAP = 16384
WARMUP = 2
REPS = 5


def build():
    from solve_keyframe_pose_graph_tpu.graph import synthetic
    from solve_keyframe_pose_graph_tpu.solver.problem import build_problem_np

    g = synthetic.circle_graph(n_nodes=N_NODES, n_loops=N_LOOPS, seed=0)
    return build_problem_np(
        q=g.vio_q, t=g.vio_t, vio_q=g.vio_q, vio_t=g.vio_t,
        node_valid=np.ones(g.n_nodes, bool),
        loop_pairs=g.loop_pairs, loop_q=g.loop_q, loop_t=g.loop_t,
        loop_w=g.loop_w, loop_valid=np.ones(g.n_loops, bool),
        switch=np.full(g.n_loops, 0.99),
        prior_idx=np.array([0]), prior_q=g.vio_q[:1], prior_t=g.vio_t[:1],
        prior_w=np.array([1.1]),
        n_cap=N_CAP, e_cap=E_CAP, p_cap=8,
    ), g


# chained-solve count for the differencing (K and 1). 4 keeps the cold
# compile of the K-chained program (which since round 2 includes the coarse
# factorization per LM iteration) within the harness budget; the K-vs-1
# difference still spans 3 solves.
CHAIN = 4


def main():
    import dataclasses

    import jax.numpy as jnp

    from solve_keyframe_pose_graph_tpu.ops import lm

    # Per-solve DEVICE time via chained in-program solves: the tunneled
    # harness adds a ~35 ms host round trip per dispatch+fetch that is an
    # artifact of the remote link, not the chip (production streaming
    # dispatches asynchronously and never blocks per solve). Chaining K
    # solves inside one jitted program (each consuming the previous result,
    # so nothing can be elided) and differencing K=CHAIN against K=1 cancels
    # dispatch, fetch, AND the shared one-time costs exactly.
    prob, g = build()
    # static tile capacity for the tiled loop matvec, from the raw host
    # edge list (gn.tile_k_for; 640 for this graph)
    from solve_keyframe_pose_graph_tpu.ops import gn
    tile_k = gn.tile_k_for(g.loop_pairs[:, 1], g.loop_pairs[:, 0], N_CAP)

    def chained(k):
        @jax.jit
        def run(p):
            def body(i, carry):
                cost_acc, tshift = carry
                p_i = dataclasses.replace(
                    p, t=p.t + (tshift * 1e-9).astype(p.t.dtype))
                # the chi2-PARITY configuration (the north-star metric is
                # wall-clock AT Ceres-parity chi2): two-level band+coarse
                # preconditioner, default forcing with a 45-iteration CG
                # cap, entry-major band build (band_impl=emb default),
                # tile-padded one-hot loop matvec (rows6 form) — final chi2 0.4008 vs
                # the fp64 exact-step reference's 0.4038, certified
                # equivalent to cap-60 across 8 perturbed instances
                # (benchmarks/warm_robust.json, BASELINE.md)
                # coarse_group unset -> auto (resolves to 64 at this n_cap:
                # ops/coarse.auto_coarse_group), the hands-free product pick
                r = lm.lm_solve(p_i, max_iterations=10,
                                preconditioner="band+coarse",
                                bcr_levels=2,
                                max_cg_iterations=45,
                                loop_impl="tiledrows6", tile_k=tile_k)
                return cost_acc + r.final_cost, r.final_cost
            acc, _ = jax.lax.fori_loop(
                0, k, body, (jnp.float32(0.0), jnp.float32(0.0)))
            return acc
        return run

    run1 = chained(1)
    runK = chained(CHAIN)
    # warmup/compile both programs
    for _ in range(WARMUP):
        float(run1(prob))
        float(runK(prob))

    t1s, tks = [], []
    for i in range(REPS):
        p = dataclasses.replace(prob, t=prob.t + np.float32(1e-7 * (i + 1)))
        float(p.t[0, 0])
        t0 = time.perf_counter()
        float(run1(p))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(runK(p))
        tks.append(time.perf_counter() - t0)

    ms = (float(np.median(tks)) - float(np.median(t1s))) / (CHAIN - 1) * 1e3
    print(json.dumps({
        "metric": "lm_solve_5k10k_ms",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
