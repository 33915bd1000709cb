"""A/B per-solve device time across lm_solve static variants, using
bench.py's chained-differencing methodology (each variant = its own static
args = its own executable; no jit-cache cross-talk).

Usage: python benchmarks/exp_ab_solve.py \
    --variants loop_impl=scatter,loop_impl=sorted
Each variant is a comma-free key=value[;key=value...] spec.
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

from solve_keyframe_pose_graph_tpu.ops import lm  # noqa: E402

CHAIN = 5
WARMUP = 2
REPS = 5


def parse_spec(spec: str) -> dict:
    out = {}
    if not spec:
        return out
    for kv in spec.split(";"):
        k, v = kv.split("=")
        try:
            v = int(v)
        except ValueError:
            try:
                v = float(v)
            except ValueError:
                pass
        out[k] = v
    return out


def measure(prob, kw) -> tuple:
    kw = {"max_iterations": 10, **kw}
    def chained(k):
        @jax.jit
        def run(p):
            def body(i, carry):
                cost_acc, tshift = carry
                p_i = dataclasses.replace(
                    p, t=p.t + (tshift * 1e-9).astype(p.t.dtype))
                r = lm.lm_solve(p_i, **kw)
                return cost_acc + r.final_cost, r.final_cost
            acc, _ = jax.lax.fori_loop(
                0, k, body, (jnp.float32(0.0), jnp.float32(0.0)))
            return acc
        return run

    run1, runK = chained(1), chained(CHAIN)
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
    r = lm.lm_solve(prob, **kw)
    return ms, float(r.final_cost), int(r.total_cg_iterations)


def measure_direct(prob, kw, rtt) -> tuple:
    """Direct per-solve wall minus RTT (valid when solve >> RTT; avoids the
    chained-program compile blowup for outer_unroll variants)."""
    r = lm.lm_solve(prob, max_iterations=10, **kw)
    cost, cg = float(r.final_cost), int(r.total_cg_iterations)
    ts = []
    for i in range(7):
        p = dataclasses.replace(prob, t=prob.t + np.float32(1e-7 * (i + 1)))
        float(p.t[0, 0])
        t0 = time.perf_counter()
        float(lm.lm_solve(p, max_iterations=10, **kw).final_cost)
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) * 1e3 - rtt), cost, cg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants",
                    default="loop_impl=scatter,loop_impl=sorted")
    ap.add_argument("--direct", action="store_true")
    ap.add_argument("--graph", default="bench",
                    help="bench|sphere|manhattan|torus")
    args = ap.parse_args()
    if args.graph == "bench":
        prob, _ = bench.build()
    else:
        from benchmarks.exp_coarse import build_graph
        prob = build_graph(args.graph)
    rtt = 0.0
    if args.direct:
        import jax.numpy as jnp
        triv = jax.jit(lambda e: e + 1.0)
        float(triv(jnp.float32(0.0)))
        ts = []
        for _ in range(9):
            t0 = time.perf_counter()
            float(triv(jnp.float32(0.0)))
            ts.append((time.perf_counter() - t0) * 1e3)
        rtt = float(np.median(ts))
        print(f"rtt {rtt:.1f} ms (direct mode)", flush=True)
    for spec in args.variants.split(","):
        kw = parse_spec(spec)
        if args.direct:
            ms, cost, cg = measure_direct(prob, kw, rtt)
        else:
            ms, cost, cg = measure(prob, kw)
        print(f"{spec or 'default':50s} {ms:8.2f} ms/solve  "
              f"chi2={cost:.4f} cg={cg}", flush=True)


if __name__ == "__main__":
    main()
