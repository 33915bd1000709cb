"""Fill the BASELINE.md results table: TPU per-solve device time + chi² for
each benchmark config, with optional CPU fp64 direct-solver references run
as subprocesses (they take minutes each).

  python benchmarks/run_baseline.py            # TPU rows only
  python benchmarks/run_baseline.py --cpu      # + CPU references

Writes benchmarks/results.json (merged across runs).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

RESULTS = os.path.join(ROOT, "benchmarks", "results.json")
CHAIN = 4
REPS = 3


# THE unified chi2-parity configuration — ONE config for every graph class
# (the reference needs zero per-dataset tuning, PoseGraphSLAM.cpp:1270-1272):
# the two-level band+coarse:64 preconditioner at 1e-2:45 forcing,
# bcr_levels 2 — certified across 8 perturbed bench instances + the three
# analog classes against per-instance fp64 exact-solve references
# (benchmarks/exp_warm_robust.py -> warm_robust.json; every escalated
# instance within ±1.2%, BASELINE.md). fp32-conditioning-limited graphs
# (manhattan class) are handled by the ADAPTIVE PRECISION ESCALATION, not by
# per-graph tuning (ops/lm.lm_solve_adaptive). This mirrors
# config.SolverConfig's product defaults.
PARITY_KW = dict(cg_tolerance=1e-2, max_cg_iterations=45,
                 preconditioner="band+coarse", bcr_levels=2)
# coarse_group intentionally NOT set: the product auto-scales it from the
# problem size (ops/coarse.auto_coarse_group — 64 at bench scale, 128 at
# the 30k ceiling), so the benchmark exercises exactly what a hands-free
# SolverConfig() user gets (VERDICT round-3 item 2).


def measure_tpu_solve(problem, max_iterations=10, **lm_kw):
    """Per-solve device time via chained differencing (see bench.py)."""
    from solve_keyframe_pose_graph_tpu.ops import lm

    def chained(k):
        @jax.jit
        def run(p):
            def body(i, carry):
                acc, shift = carry
                p_i = dataclasses.replace(
                    p, t=p.t + (shift * 1e-9).astype(p.t.dtype))
                r = lm.lm_solve(p_i, max_iterations=max_iterations, **lm_kw)
                return acc + r.final_cost, r.final_cost
            acc, _ = jax.lax.fori_loop(
                0, k, body, (jnp.float32(0.0), jnp.float32(0.0)))
            return acc
        return run

    run1, runK = chained(1), chained(CHAIN)
    float(run1(problem)); float(runK(problem))
    t1s, tks = [], []
    for i in range(REPS):
        p = dataclasses.replace(problem,
                                t=problem.t + np.float32(1e-7 * (i + 1)))
        float(p.t[0, 0])
        t0 = time.perf_counter(); float(run1(p))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(runK(p))
        tks.append(time.perf_counter() - t0)
    ms = (float(np.median(tks)) - float(np.median(t1s))) / (CHAIN - 1) * 1e3

    from solve_keyframe_pose_graph_tpu.ops import lm as lm_mod
    res = lm_mod.lm_solve(problem, max_iterations=max_iterations, **lm_kw)
    return {"tpu_ms": round(ms, 2), "tpu_chi2": float(res.final_cost),
            "initial_chi2": float(res.initial_cost),
            "lm_iterations": int(res.iterations),
            "cg_iterations": int(res.total_cg_iterations)}


def measure_both_modes(problem, max_iterations=10, name="", tile_k=None):
    """Default-quality row + chi2-parity row (the ONE unified config) + the
    adaptive-precision outcome when the fp32 solve shows distress. tile_k
    (host-computed static per-tile capacity, gn.tile_k_for) enables the
    tiled loop matvec — the bench.py headline formulation."""
    from solve_keyframe_pose_graph_tpu.ops import lm
    from solve_keyframe_pose_graph_tpu.ops.coarse import (
        auto_coarse_group, median_loop_offset)

    tiled = ({} if tile_k is None
             else dict(loop_impl="tiledrows6", tile_k=int(tile_k)))
    # the product's hands-free structure-aware aggregate (what the engine
    # computes from host edge arrays each trigger)
    grp = auto_coarse_group(
        problem.q.shape[0],
        median_loop_offset(np.asarray(problem.loop_b),
                           np.asarray(problem.loop_a),
                           np.asarray(problem.loop_mask)))
    par_kw = dict(PARITY_KW, coarse_group=grp)
    row = measure_tpu_solve(problem, max_iterations, **tiled)
    par = measure_tpu_solve(problem, max_iterations, **par_kw, **tiled)
    row.update({"tpu_parity_ms": par["tpu_ms"],
                "tpu_parity_chi2": par["tpu_chi2"],
                "parity_cg_iterations": par["cg_iterations"],
                "parity_config": dict(par_kw)})
    # the PRODUCTION outcome: adaptive precision at the unified config. On
    # healthy graphs this is the parity row (escalation never fires); on
    # fp32-conditioning-limited graphs it reports the escalated fp64 result
    # and its (host-wall) cost.
    t0 = time.perf_counter()
    res_a, rung = lm.lm_solve_adaptive(
        problem, max_iterations=max_iterations, **par_kw, **tiled)
    if rung:
        row.update({
            "adaptive_chi2": float(res_a.final_cost),
            "adaptive_rung": rung,
            "adaptive_host_wall_ms": round(
                1e3 * (time.perf_counter() - t0), 1),
        })
    return row


def problem_from_inputs(inp, n, e, dtype=np.float32):
    from solve_keyframe_pose_graph_tpu.solver.problem import build_problem_np

    def cap(x):
        c = 256
        while c < x:
            c *= 2
        return c

    return build_problem_np(
        q=inp["vio_q"], t=inp["vio_t"], vio_q=inp["vio_q"],
        vio_t=inp["vio_t"], node_valid=np.ones(n, bool),
        loop_pairs=inp["loop_pairs"], loop_q=inp["loop_q"],
        loop_t=inp["loop_t"], loop_w=inp["loop_w"],
        loop_valid=np.ones(e, bool), switch=np.full(e, 0.99),
        prior_idx=np.array([0]), prior_q=inp["vio_q"][:1],
        prior_t=inp["vio_t"][:1], prior_w=np.array([1.1]),
        n_cap=cap(n), e_cap=cap(e), p_cap=8, dtype=dtype,
    )


def bench_g2o_configs(results, run_cpu: bool, graphs=None):
    from solve_keyframe_pose_graph_tpu.graph import datasets
    from solve_keyframe_pose_graph_tpu.graph import g2o as g2o_io
    from solve_keyframe_pose_graph_tpu.ops import gn

    gdir = os.path.join(ROOT, "benchmarks", "graphs")
    os.makedirs(gdir, exist_ok=True)
    for name, fn in datasets.DATASETS.items():
        if graphs and not any(g in name for g in graphs):
            continue
        g = fn()
        path = os.path.join(gdir, f"{name}.g2o")
        if not os.path.exists(path):
            g2o_io.save_g2o(path, g)
        # solve the TEXT-ROUNDED instance the CPU reference subprocess reads
        # (these graphs are chaotically input-sensitive — CLAUDE.md: the g2o
        # rounding of the same instance changes which LM steps reject, so
        # the TPU row and its reference must see identical bits)
        g = g2o_io.load_g2o(path)
        inp = g2o_io.g2o_to_problem_inputs(g)
        n, e = g.n_nodes, len(inp["loop_pairs"])
        prob = problem_from_inputs(inp, n, e)
        pairs = np.asarray(inp["loop_pairs"])
        tile_k = gn.tile_k_for(pairs[:, 1], pairs[:, 0], prob.q.shape[0])
        row = measure_both_modes(prob, name=name, tile_k=tile_k)
        row.update({"nodes": n, "loops": e})
        results.setdefault(name, {}).update(row)
        print(name, json.dumps(results[name]))
        if run_cpu:
            out = subprocess.run(
                [sys.executable,
                 os.path.join(ROOT, "benchmarks", "cpu_reference.py"),
                 "--g2o", path, "--native-ldl"],
                capture_output=True, text=True, timeout=3600)
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    d = json.loads(line)
                    results[name].update({
                        "cpu_ms": round(d["wall_ms"], 1),
                        "cpu_chi2": d["chi2"],
                    })
            print(name, "cpu:", results[name].get("cpu_ms"), "ms")


def bench_circle(results, run_cpu: bool):
    from solve_keyframe_pose_graph_tpu.graph import synthetic
    from solve_keyframe_pose_graph_tpu.ops import gn

    g = synthetic.circle_graph(n_nodes=5000, n_loops=10000, seed=0)
    inp = {"vio_q": g.vio_q, "vio_t": g.vio_t, "loop_pairs": g.loop_pairs,
           "loop_q": g.loop_q, "loop_t": g.loop_t, "loop_w": g.loop_w}
    prob = problem_from_inputs(inp, g.n_nodes, g.n_loops)
    tile_k = gn.tile_k_for(g.loop_pairs[:, 1], g.loop_pairs[:, 0],
                           prob.q.shape[0])
    row = measure_both_modes(prob, name="circle_5k_10k", tile_k=tile_k)
    row.update({"nodes": g.n_nodes, "loops": g.n_loops})
    results.setdefault("circle_5k_10k", {}).update(row)
    print("circle_5k_10k", json.dumps(results["circle_5k_10k"]))
    if run_cpu:
        out = subprocess.run(
            [sys.executable,
             os.path.join(ROOT, "benchmarks", "cpu_reference.py"),
             "--nodes", "5000", "--loops", "10000", "--native-ldl"],
            capture_output=True, text=True, timeout=3600)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                d = json.loads(line)
                results["circle_5k_10k"].update({
                    "cpu_ms": round(d["wall_ms"], 1), "cpu_chi2": d["chi2"]})


def bench_streaming(results, async_dispatch: bool = False,
                    n_nodes: int = 2000, n_loops: int = 400,
                    trigger_every: int = 50, warmup: bool = False,
                    pace_ms: float = 0.0, seed: int = 1,
                    inject_distress_at: int = 0):
    """Config 5: incremental triggers through the full engine (host+device).
    Reports the HOST-BLOCKING wall per trigger call — with async_dispatch
    the device solve overlaps host ingest/compose between triggers and the
    host pays only collect + build + dispatch.

    warmup=True calls engine.warmup() first (the production startup path):
    bucket-doubling compile stalls disappear from p90. pace_ms sleeps
    between trigger polls, emulating real ingest pacing slower than the
    solve (the reference's 30 Hz camera + 0.5 Hz solver poll,
    PoseGraphSLAM.cpp:1257) — the regime async_dispatch exists for: the
    solve finishes DURING the pace gap, so collect is free at the next
    trigger. Runs the PRODUCT default config end to end — including the
    certified tiledrows6 loop matvec, whose sticky per-bucket tile_k
    (gn.tile_k_rule) is what warmup() pre-compiles (round-4 VERDICT
    item 2: the old sorted2 pin is gone)."""
    import dataclasses as dc

    from solve_keyframe_pose_graph_tpu.config import Config, StreamConfig
    from solve_keyframe_pose_graph_tpu.graph import synthetic
    from solve_keyframe_pose_graph_tpu.graph.store import GraphStore
    from solve_keyframe_pose_graph_tpu.solver.engine import SolverEngine

    g = synthetic.circle_graph(n_nodes=n_nodes, n_loops=n_loops, seed=seed)
    store = GraphStore()
    cfg = Config(stream=StreamConfig(async_dispatch=async_dispatch))
    eng = SolverEngine(store, cfg)
    warmup_s = None
    if warmup:
        tw = time.perf_counter()
        nprog = eng.warmup(n_nodes, n_loops)
        # join the daemon cpu-rung warm too: this box has ONE core, so an
        # overlapped x64 compile would otherwise get timed against the
        # stream's host work (measured: 0.9 -> 3.7 s full-rebuild walls)
        eng.cpu_rung_warm_join()
        warmup_s = round(time.perf_counter() - tw, 1)
        print(f"  warmup: {nprog} bucket programs in {warmup_s}s")
    t0 = 1_000_000_000
    dtn = 100_000_000
    edge_by_later = {}
    for k in range(g.n_loops):
        a, b = map(int, g.loop_pairs[k])
        edge_by_later.setdefault(max(a, b), []).append(k)
    walls = []
    # per-trigger decomposition (VERDICT r4 item 6: the 10k mid-stream
    # stalls need attribution): phase-total deltas + whether this trigger
    # lowered/compiled a NEW executable (the stall signature)
    from solve_keyframe_pose_graph_tpu.ops import lm as lm_mod
    detail = []
    prev_totals: dict = {}
    for i in range(g.n_nodes):
        store.add_node(t0 + i * dtn, g.vio_q[i], g.vio_t[i])
        for k in edge_by_later.get(i, []):
            a, b = map(int, g.loop_pairs[k])
            store.add_loop_edge(t0 + a * dtn, t0 + b * dtn,
                                g.loop_q[k], g.loop_t[k], float(g.loop_w[k]))
        if i % trigger_every == 0:
            if pace_ms:
                time.sleep(pace_ms / 1e3)
            # distress injection (VERDICT r3 item 4): force ONE trigger's
            # adaptive ladder (escalate_rejects=0 -> unconditional) so the
            # background escalated re-solve runs while the stream continues;
            # trigger p90 must stay near median (the round-3 inline path
            # paid the whole re-solve in one trigger: 42.2 s p90 at 30k)
            inject = (inject_distress_at
                      and len(walls) + 1 == inject_distress_at)
            if inject:
                saved_cfg = eng.config
                eng.config = dc.replace(
                    saved_cfg, solver=dc.replace(saved_cfg.solver,
                                                 escalate_rejects=0))
            prev_totals = dict(eng.timer.totals)
            prev_aot = len(lm_mod._AOT_CACHE)
            tt = time.perf_counter()
            fired = eng.trigger()
            if fired:
                w = (time.perf_counter() - tt) * 1e3
                walls.append(w)
                deltas = {k: round(1e3 * (eng.timer.totals[k]
                                          - prev_totals.get(k, 0.0)), 1)
                          for k in eng.timer.totals
                          if eng.timer.totals[k]
                          - prev_totals.get(k, 0.0) > 5e-4}
                detail.append({
                    "wall_ms": round(w, 1), "node_len": store.node_len,
                    "phases_ms": deltas,
                    "new_executables": len(lm_mod._AOT_CACHE) - prev_aot})
            if inject:
                eng.config = saved_cfg
    eng.drain()
    t_settle = time.perf_counter()
    eng.trigger()        # settle edges that accumulated while escalating
    settle_wall_ms = round(1e3 * (time.perf_counter() - t_settle), 1)
    eng.drain()
    key = (f"streaming_{n_nodes // 1000}k_{n_loops}"
           + ("_warm" if warmup else "")
           + ("_paced" if pace_ms else "")
           + ("_async" if async_dispatch else "")
           + ("_distress" if inject_distress_at else ""))
    # per-phase trigger decomposition (VERDICT r3 item 5: publish WHERE the
    # trigger wall goes — world mapping / guesses / problem build / device
    # solve / write back)
    phase_ms = {k: round(1e3 * eng.timer.totals[k]
                         / max(eng.timer.counts.get(k, 1), 1), 2)
                for k in sorted(eng.timer.totals)}
    bg_rows = [s for s in eng.solve_stats
               if s.get("background_escalation")]
    results.setdefault(key, {}).update({
        "nodes": n_nodes, "loops": n_loops,
        "triggers": len(walls),
        "async_dispatch": async_dispatch,
        "warmup_s": warmup_s, "pace_ms": pace_ms,
        "trigger_host_ms_median": round(float(np.median(walls)), 1),
        "trigger_host_ms_p90": round(float(np.percentile(walls, 90)), 1),
        "steady_state_ms_median": round(
            float(np.median(walls[len(walls) // 2:])), 1),
        "walls_ms": [round(w, 1) for w in walls],
        # decomposition of every trigger whose wall exceeded 2x the median
        # (the stall attribution VERDICT r4 item 6 asked for)
        "stall_detail": [d for d in detail
                         if d["wall_ms"] > 2.0 * float(np.median(walls))],
        "warmup_decomposition": {
            "prepare_s": round(sum(s["prepare_s"]
                                   for s in eng.warmup_stats), 1),
            "prime_s": round(sum(s["prime_s"]
                                 for s in eng.warmup_stats), 1),
            "programs": len(eng.warmup_stats)} if warmup else None,
        "settle_wall_ms": settle_wall_ms,
        "phase_ms_mean": phase_ms,
        "incremental_builds": (
            None if eng._inc_builder is None else
            {"full": eng._inc_builder.full_builds,
             "delta": eng._inc_builder.delta_builds}),
        "bg_escalations": [
            {k2: s[k2] for k2 in ("trigger", "escalated_rung", "applied",
                                  "final_cost", "escalation_wall_ms",
                                  "rung_stats")
             if k2 in s} for s in bg_rows],
        "final_chi2": (eng.solve_stats[-1]["final_cost"]
                       if eng.solve_stats else None),
    })
    print(key, json.dumps(results[key]))


_WARMUP_SCRIPT = """
import dataclasses as dc, json, time
from solve_keyframe_pose_graph_tpu.config import Config
from solve_keyframe_pose_graph_tpu.graph.store import GraphStore
from solve_keyframe_pose_graph_tpu.solver.engine import SolverEngine
cfg = Config()
eng = SolverEngine(GraphStore(), cfg)
t0 = time.perf_counter()
n = eng.warmup({nodes}, {edges}, background=True)
ready = time.perf_counter() - t0
eng.warmup_join()
print(json.dumps({{"programs": n, "ready_s": round(ready, 1),
                   "warmup_s": round(time.perf_counter() - t0, 1),
                   "prepare_s": round(sum(s["prepare_s"]
                                          for s in eng.warmup_stats), 1),
                   "prime_s": round(sum(s["prime_s"]
                                        for s in eng.warmup_stats), 1),
                   "per_bucket": eng.warmup_stats}}))
"""


def bench_warmup_cache(results, n_nodes=10000, n_loops=2000):
    """VERDICT r3 item 6: production startup with the persistent compile
    cache. Two FRESH processes warm the same capacity buckets against the
    same (initially empty) cache directory: the first pays the compiles
    and populates it; the second replays cached executables. The engine
    enables the cache itself (IOConfig.compile_cache_dir="auto" honors
    JAX_COMPILATION_CACHE_DIR) — this measures exactly what a user's
    second `kpg-solve serve --warmup-nodes` startup costs.

    Two numbers per process: ready_s — warmup(background=True) returns
    and the server can solve (first bucket program compiled; the <60 s
    startup bar); warmup_s — all bucket programs warm (the background
    thread's total, overlapped with live serving in production). The
    disk-AOT-executable alternative measured SLOWER warm (518.9 s vs
    284.2 s — first-call program upload over the tunnel; utils/cache.py)
    and is opt-in only."""
    import shutil
    import tempfile

    cache = tempfile.mkdtemp(prefix="kpg_cache_bench_")
    env = dict(os.environ, JAX_COMPILATION_CACHE_DIR=cache)
    row = {"nodes": n_nodes, "loops": n_loops}
    try:
        for attempt in ("cold", "warm"):
            out = subprocess.run(
                [sys.executable, "-c",
                 _WARMUP_SCRIPT.format(nodes=n_nodes, edges=n_loops)],
                capture_output=True, text=True, timeout=3600, env=env,
                cwd=ROOT)
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    d = json.loads(line)
                    row[f"{attempt}_warmup_s"] = d["warmup_s"]
                    row[f"{attempt}_ready_s"] = d["ready_s"]
                    row[f"{attempt}_prepare_s"] = d.get("prepare_s")
                    row[f"{attempt}_prime_s"] = d.get("prime_s")
                    row[f"{attempt}_per_bucket"] = d.get("per_bucket")
                    row["programs"] = d["programs"]
            if f"{attempt}_warmup_s" not in row:
                row[f"{attempt}_error"] = out.stderr[-500:]
                break
    finally:
        shutil.rmtree(cache, ignore_errors=True)
    results[f"warmup_cache_{n_nodes // 1000}k"] = row
    print("warmup_cache", json.dumps(row))


def bench_capacity(results, run_cpu: bool):
    """The reference's hard capacity ceiling — 30,000 nodes / 30,000 loop
    edges (static arrays, PoseGraphSLAM.cpp:17-25): one 10-iteration solve
    at the default band config and at the parity config with the coarse
    aggregate scaled to N (group 128 at 30k: the dense coarse factorization
    is ~8x cheaper than group 64's and was the round-2 scaling bottleneck —
    VERDICT item #6). --cpu also produces the fp64 exact-solve reference
    chi2 at 30k (the missing parity anchor), via the canonical .g2o."""
    from solve_keyframe_pose_graph_tpu.graph import synthetic
    from solve_keyframe_pose_graph_tpu.ops import gn
    from solve_keyframe_pose_graph_tpu.solver.problem import build_problem_np

    key = "capacity_30k_30k"
    row = results.setdefault(key, {})
    # deterministic instance: cpu_reference.py --nodes/--loops regenerates
    # the SAME arrays (default_rng(0)), so the anchor matches bit-for-bit
    g = synthetic.circle_graph(n_nodes=30000, n_loops=30000, seed=0)
    prob = build_problem_np(
        q=g.vio_q, t=g.vio_t, vio_q=g.vio_q, vio_t=g.vio_t,
        node_valid=np.ones(g.n_nodes, bool),
        loop_pairs=g.loop_pairs, loop_q=g.loop_q, loop_t=g.loop_t,
        loop_w=g.loop_w, loop_valid=np.ones(g.n_loops, bool),
        switch=np.full(g.n_loops, 0.99),
        prior_idx=np.array([0]), prior_q=g.vio_q[:1], prior_t=g.vio_t[:1],
        prior_w=np.array([1.1]),
        n_cap=32768, e_cap=32768, p_cap=8,
    )
    tile_k = int(gn.tile_k_for(g.loop_pairs[:, 1], g.loop_pairs[:, 0],
                               32768))
    if "tpu_ms" not in row:
        row.update(measure_tpu_solve(prob, 10))                 # band default
    if "tpu_parity_ms" not in row:
        # plain parity forcing — the warm-forcing schedule (7x10) was
        # REJECTED by the 8-seed robustness certification
        # (benchmarks/warm_robust.json): overly loose early forcing
        # accepts steps into basins 10 LM iterations can't exit.
        par_kw = dict(PARITY_KW)   # auto coarse_group resolves to 128 here
        par = measure_tpu_solve(prob, 10, loop_impl="tiledrows6",
                                tile_k=tile_k, **par_kw)
        row.update({"tpu_parity_ms": par["tpu_ms"],
                    "tpu_parity_chi2": par["tpu_chi2"],
                    "parity_cg_iterations": par["cg_iterations"],
                    "parity_config": par_kw})
    if run_cpu and "cpu_ref_chi2" not in row:
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "benchmarks",
                                          "cpu_reference.py"),
             "--nodes", "30000", "--loops", "30000", "--native-ldl"],
            capture_output=True, text=True, timeout=14400)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                d = json.loads(line)
                row["cpu_ref_chi2"] = round(d["chi2"], 4)
                row["cpu_ref_ms"] = round(d["wall_ms"], 1)
    print(key, json.dumps(row))


def bench_multiworld(results):
    """Config 3: kidnap recovery — scripted kidnaps through the engine,
    inter-world first-contact merging, measured per-trigger wall."""
    from solve_keyframe_pose_graph_tpu.graph import synthetic
    from solve_keyframe_pose_graph_tpu.graph.store import GraphStore
    from solve_keyframe_pose_graph_tpu.solver.engine import SolverEngine

    g = synthetic.circle_graph(n_nodes=1500, n_loops=300, seed=4)
    store = GraphStore()
    eng = SolverEngine(store)
    t0 = 1_000_000_000
    dtn = 100_000_000
    edge_by_later = {}
    for k in range(g.n_loops):
        a, b = map(int, g.loop_pairs[k])
        edge_by_later.setdefault(max(a, b), []).append(k)
    kidnaps = {500: True, 520: False, 1000: True, 1030: False}
    walls = []
    for i in range(g.n_nodes):
        if i in kidnaps:
            store.kidnap_indicator(
                t0 + i * dtn - dtn // 2,
                "kidnapped" if kidnaps[i] else "unkidnapped")
        store.add_node(t0 + i * dtn, g.vio_q[i], g.vio_t[i])
        for k in edge_by_later.get(i, []):
            a, b = map(int, g.loop_pairs[k])
            store.add_loop_edge(t0 + a * dtn, t0 + b * dtn,
                                g.loop_q[k], g.loop_t[k], float(g.loop_w[k]))
        if i % 50 == 0 and eng.trigger():
            walls.append(eng.solve_stats[-1]["trigger_wall_ms"])
    eng.trigger()
    results.setdefault("multiworld_1500", {}).update({
        "nodes": g.n_nodes, "loops": g.n_loops,
        "worlds": store.n_worlds(),
        "sets": store.worlds.n_sets(),
        "final_chi2": eng.solve_stats[-1]["final_cost"],
        "trigger_ms_median": round(float(np.median(walls)), 1),
        "steady_state_ms_median": round(
            float(np.median(walls[len(walls) // 2:])), 1),
    })
    print("multiworld_1500", json.dumps(results["multiworld_1500"]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="also run CPU fp64 direct references (slow)")
    ap.add_argument("--only", default="",
                    help="comma list: circle,g2o,streaming,multiworld")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else set()

    results = {}
    if os.path.exists(RESULTS):
        results = json.load(open(RESULTS))
    try:
        if not only or "circle" in only:
            bench_circle(results, args.cpu)
        if (not only or "g2o" in only
                or any(t.startswith("g2o:") for t in only)):
            # allow per-graph chunks: --only g2o:sphere
            graphs = [t.split(":", 1)[1] for t in only
                      if t.startswith("g2o:")] or None
            bench_g2o_configs(results, args.cpu, graphs)
        if not only or "streaming" in only:
            bench_streaming(results)
        if not only or "streaming_async" in only:
            bench_streaming(results, async_dispatch=True)
        # VERDICT round-2 item #5: streaming at scale, warmed, and the
        # ingest-paced regime async_dispatch exists for
        if not only or "streaming_warm" in only:
            bench_streaming(results, warmup=True)
        if not only or "streaming_10k" in only:
            bench_streaming(results, n_nodes=10000, n_loops=2000,
                            trigger_every=100, warmup=True)
        if not only or "streaming_paced" in only:
            bench_streaming(results, warmup=True, pace_ms=150.0)
            bench_streaming(results, warmup=True, pace_ms=150.0,
                            async_dispatch=True)
        if not only or "streaming_30k" in only:
            # capacity-ceiling spot check (PoseGraphSLAM.cpp:17-25), with a
            # mid-stream forced escalation: the fp64 insurance rung must
            # apply AT CAPACITY (VERDICT r4 item 4) without stalling the
            # trigger stream (background escalation + native CPU rung)
            # trigger_every=500: enough poll resolution that the row shows
            # the stream CONTINUING around the background escalation (the
            # engine accumulates edges while the escalated re-solve is in
            # flight, the reference's own busy-solver semantic,
            # PoseGraphSLAM.cpp:1306-1312)
            # pace_ms=2000: an unpaced harness ingests the whole remaining
            # stream in ~10 s while the 30k escalation solves for ~41 s, so
            # every poll lands in the busy-solver window and the row
            # degenerates to 2 triggers. The reference's solver polls at
            # 0.5 Hz against a 30 Hz camera (PoseGraphSLAM.cpp:1306) — the
            # paced row shows triggers resuming after the escalation lands.
            bench_streaming(results, n_nodes=30000, n_loops=3000,
                            trigger_every=500, warmup=True, pace_ms=2000.0,
                            inject_distress_at=5)
        if not only or "streaming_distress" in only:
            # injected-distress row (VERDICT r3 item 4): one mid-stream
            # trigger forced up the ladder; with background escalation the
            # trigger p90 must stay near median while the escalated chi2
            # lands through the write-back thread
            bench_streaming(results, warmup=True, pace_ms=150.0,
                            inject_distress_at=10)
        if not only or "capacity" in only:
            bench_capacity(results, args.cpu)
        if only and "warmup_cache" in only:
            # explicit-only: two full warmups (~10 min first process)
            bench_warmup_cache(results)
        if not only or "multiworld" in only:
            bench_multiworld(results)
    finally:
        with open(RESULTS, "w") as f:
            json.dump(results, f, indent=2)
        print("->", RESULTS)


if __name__ == "__main__":
    main()
