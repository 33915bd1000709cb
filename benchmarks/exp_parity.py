"""chi^2-parity tuning sweep: per-graph (cg_tolerance, max_cg_iterations)
grid vs the fp64 exact-solve reference, with direct per-solve wall.

Run on the real chip. Prints one line per (graph, variant):
graph variant wall chi2 ref_chi2 gap% cg_total
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.exp_coarse import build_graph  # noqa: E402
from solve_keyframe_pose_graph_tpu.ops import lm  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# fp64 exact-solve (native LDL) reference chi2 at the 10-iteration cap,
# regenerated via: python benchmarks/cpu_reference.py --native-ldl
# [--nodes/--loops | --g2o benchmarks/graphs/<name>.g2o]
REF = {}


def ref_chi2(graph: str) -> float:
    if graph in REF:
        return REF[graph]
    args = ["--native-ldl"]
    if graph == "bench":
        args += ["--nodes", "5000", "--loops", "10000"]
    else:
        from solve_keyframe_pose_graph_tpu.graph import datasets, g2o as g2o_io
        fname = {"sphere": "sphere2500-analog", "manhattan":
                 "manhattan3500-analog", "torus": "torus-analog"}[graph]
        path = os.path.join(ROOT, "benchmarks", "graphs", f"{fname}.g2o")
        if not os.path.exists(path):
            g2o_io.save_g2o(path, getattr(datasets, graph)())
        args += ["--g2o", path]
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks",
                                      "cpu_reference.py")] + args,
        capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            REF[graph] = json.loads(line)["chi2"]
            return REF[graph]
    raise RuntimeError(out.stdout + out.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", default="bench,sphere,manhattan,torus")
    ap.add_argument("--variants",
                    default="1e-2:60,3e-3:100,3e-3:150,1e-3:200")
    ap.add_argument("--refs", default="",
                    help="precomputed fp64 refs: name=chi2,name=chi2 "
                         "(skips the CPU subprocesses)")
    args = ap.parse_args()
    for kv in args.refs.split(","):
        if kv:
            k, v = kv.split("=")
            REF[k] = float(v)

    triv = jax.jit(lambda e: e + 1.0)
    float(triv(jnp.float32(0.0)))
    ts = []
    for _ in range(9):
        t0 = time.perf_counter()
        float(triv(jnp.float32(0.0)))
        ts.append((time.perf_counter() - t0) * 1e3)
    rtt = float(np.median(ts))
    print(f"rtt {rtt:.1f} ms", flush=True)

    for graph in args.graphs.split(","):
        prob = build_graph(graph)
        ref = ref_chi2(graph)
        for spec in args.variants.split(","):
            tol, cap = spec.split(":")
            kw = dict(cg_tolerance=float(tol), max_cg_iterations=int(cap))
            r = lm.lm_solve(prob, max_iterations=10, **kw)
            chi2 = float(r.final_cost)
            cg = int(r.total_cg_iterations)
            tt = []
            for i in range(5):
                p = dataclasses.replace(
                    prob, t=prob.t + np.float32(1e-7 * (i + 1)))
                float(p.t[0, 0])
                t0 = time.perf_counter()
                float(lm.lm_solve(p, max_iterations=10, **kw).final_cost)
                tt.append(time.perf_counter() - t0)
            wall = float(np.median(tt)) * 1e3 - rtt
            gap = 100.0 * (chi2 - ref) / ref
            print(f"{graph:10s} tol={tol:>5} cap={cap:>3}: "
                  f"{wall:7.1f} ms  chi2={chi2:.4f} ref={ref:.4f} "
                  f"gap={gap:+.1f}%  cg={cg}", flush=True)


if __name__ == "__main__":
    main()
