"""Robustness validation of the warm CG forcing schedule (round 3).

The warm schedule (cg_warm_iters/cg_warm_mult: the first K LM iterations
solve CG with a mult-times looser residual forcing) cuts total CG
iterations ~15% at bench scale with BETTER final chi^2 on the canonical
input — but a forcing change is exactly the kind of knob whose failure mode
is perturbed-instance chaos (see the Q-rule note in ops/lm.py). This
harness certifies it the same way the parity config itself was certified:

  * 8 perturbed bench-class instances (circle 5k/10k, seeds 0-7) — the
    candidate must be rejection/distress-free on ALL of them with chi^2
    within ~2% of (or below) the per-instance fp64 exact-solve reference
  * the three analog graphs (sphere / torus via the plain solve, manhattan
    via the adaptive-precision path that owns its quality story)

Instances are canonicalized as .g2o files (CPU refs and TPU solves read
the same rounded values — see the CLAUDE.md round-3 note).

  python benchmarks/exp_warm_robust.py [--cpu] [--warm 5] [--mult 6.0]

Writes benchmarks/warm_robust.json (resumable per row).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

RESULTS = os.path.join(ROOT, "benchmarks", "warm_robust.json")
GDIR = os.path.join(ROOT, "benchmarks", "graphs")

BASE_KW = dict(cg_tolerance=1e-2, max_cg_iterations=60,
               preconditioner="band+coarse")


def cpu_ref(path: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks",
                                      "cpu_reference.py"),
         "--g2o", path, "--native-ldl"],
        capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            d = json.loads(line)
            return {"ref_chi2": round(d["chi2"], 4),
                    "ref_cpu_ms": round(d["wall_ms"], 1)}
    raise RuntimeError(out.stdout[-500:] + out.stderr[-500:])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--warm", type=int, default=7)
    ap.add_argument("--mult", type=float, default=10.0)
    ap.add_argument("--bcr-levels", type=int, default=2)
    ap.add_argument("--loop-impl", default="tiledrows6")
    ap.add_argument("--band-impl", default="aos")
    ap.add_argument("--cg-cap", type=int, default=60)
    ap.add_argument("--fp64-backend", default="tpu",
                    help="full-fp64 insurance rung processor for escalated "
                         "instances: 'tpu' (emulated, the round-3/4 rows) | "
                         "'cpu' (native exact-step LDL^T) | 'auto'. Non-tpu "
                         "values get their own result key.")
    args = ap.parse_args()

    from solve_keyframe_pose_graph_tpu.graph import datasets, synthetic
    from solve_keyframe_pose_graph_tpu.graph import g2o as g2o_io
    from solve_keyframe_pose_graph_tpu.ops import gn, lm
    from benchmarks.run_baseline import problem_from_inputs

    kw = dict(BASE_KW, cg_warm_iters=args.warm, cg_warm_mult=args.mult,
              bcr_levels=args.bcr_levels, band_impl=args.band_impl,
              max_cg_iterations=args.cg_cap)

    results = {}
    if os.path.exists(RESULTS):
        results = json.load(open(RESULTS))
    key = (f"warm{args.warm}x{args.mult:g}_l{args.bcr_levels}"
           f"_{args.loop_impl}_{args.band_impl}_cap{args.cg_cap}")
    if args.fp64_backend != "tpu":
        key += f"_fp64{args.fp64_backend}"
    prev = {r["name"]: r for r in results.get(key, {}).get("rows", [])}
    rows = []

    def flush():
        results[key] = {"config": kw, "rows": rows}
        ok = [r for r in rows if "ref_chi2" in r]
        if ok:
            gaps = [100 * (r["chi2"] / r["ref_chi2"] - 1.0) for r in ok]
            results[key]["gap_pct_max"] = round(max(gaps), 2)
            results[key]["distress_total"] = sum(r["distress"] for r in rows)
        json.dump(results, open(RESULTS, "w"), indent=2)

    cases = [(f"bench_seed{s}",
              lambda s=s: synthetic.circle_graph(
                  n_nodes=5000, n_loops=10000, seed=s))
             for s in range(args.seeds)]
    cases += [("sphere2500-analog", datasets.sphere),
              ("torus-analog", datasets.torus),
              ("manhattan3500-analog", datasets.manhattan)]

    for name, gen in cases:
        row = prev.get(name, {"name": name})
        need_solve = "chi2" not in row
        need_ref = args.cpu and "ref_chi2" not in row
        if not (need_solve or need_ref):
            rows.append(row)
            continue
        path = os.path.join(GDIR, f"{name}.g2o")
        if not os.path.exists(path):
            gg = gen()
            if not hasattr(gg, "edges"):          # SyntheticGraph
                gg = g2o_io.synthetic_to_g2o(gg)
            g2o_io.save_g2o(path, gg)
        g = g2o_io.load_g2o(path)
        inp = g2o_io.g2o_to_problem_inputs(g)
        n, e = g.n_nodes, len(inp["loop_pairs"])
        if need_solve:
            prob = problem_from_inputs(inp, n, e)
            pairs = np.asarray(inp["loop_pairs"])
            tile_k = gn.tile_k_for(pairs[:, 1], pairs[:, 0], prob.q.shape[0])
            # the product's hands-free structure-aware coarse aggregate
            # (what the engine computes per trigger) — the certification
            # must certify exactly what a SolverConfig() user runs
            from solve_keyframe_pose_graph_tpu.ops.coarse import (
                auto_coarse_group, median_loop_offset)
            grp = auto_coarse_group(
                prob.q.shape[0], median_loop_offset(pairs[:, 1],
                                                    pairs[:, 0]))
            t0 = time.perf_counter()
            res, rung = lm.lm_solve_adaptive(
                prob, loop_impl=args.loop_impl, tile_k=int(tile_k),
                coarse_group=grp, fp64_backend=args.fp64_backend, **kw)
            wall = 1e3 * (time.perf_counter() - t0)
            row.update({
                "nodes": n, "loops": e,
                "chi2": round(float(res.final_cost), 4),
                "accepted": int(res.successful_steps),
                "iterations": int(res.iterations),
                "distress": int(res.distress_rejects),
                "cg": int(res.total_cg_iterations),
                "escalated": rung,
                "host_wall_ms": round(wall, 1),
            })
        if need_ref:
            row.update(cpu_ref(path))
        rows.append(row)
        flush()
        print(json.dumps(row), flush=True)
    print("->", RESULTS)


if __name__ == "__main__":
    main()
