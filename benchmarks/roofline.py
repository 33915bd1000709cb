"""Single-chip roofline for the CG-iteration pieces at bench scale.

VERDICT round-3 item 8: quantify how far the ~94 ms parity solve sits from
the memory-bound floor of the chip itself (the reference publishes no
numbers — SURVEY §6 — so this is the TPU-first bar, not a parity bar).

Methodology (CLAUDE.md measurement rules):
  * time: each piece amortized inside ONE jitted fori_loop with a data
    dependency and scalar-only output (REPS applications), host-fetch
    barrier, tunnel RTT subtracted — identical to profile_cg_pieces.py.
  * bytes: XLA's own cost model for the SINGLE-application program,
    jit(fn).lower(...).compile().cost_analysis()["bytes accessed"].
    These are the compiler's post-fusion HBM traffic estimates (operand +
    output bytes of fused computations), the denominator a roofline wants.
  * peak: TPU v5e HBM bandwidth 819 GB/s (public spec). MXU peak
    (197 TFLOP/s bf16 / ~98 fp32) is quoted for the flops columns.

Output: one JSON blob (benchmarks/roofline.json) + a printed table of
  piece | ms/op | MB accessed | GB/s | % of HBM peak | GFLOP/s
for: band matvec, tiledrows6 loop matvec, full reduced matvec, BCR
precond apply, coarse apply (group 64), one full CG iteration (parity
preconditioner), and the per-LM-iteration band build + factorize.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

from solve_keyframe_pose_graph_tpu.ops import band as band_ops  # noqa: E402
from solve_keyframe_pose_graph_tpu.ops import band_em  # noqa: E402
from solve_keyframe_pose_graph_tpu.ops import coarse as coarse_ops  # noqa: E402
from solve_keyframe_pose_graph_tpu.ops import gn as gn_ops  # noqa: E402

REPS = 32
HBM_PEAK_GBS = 819.0          # TPU v5e, public spec
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "benchmarks", "roofline.json")


def _rtt():
    triv = jax.jit(lambda e: e + 1.0)
    float(triv(jnp.float32(0.0)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(triv(jnp.float32(0.0)))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def _timed_loop(phase, ops, rtt, outer=3):
    """Amortized ms/op of `phase` (ops, x -> scalar) with a data dependency.

    ops is a pytree of device operands passed as a JIT ARGUMENT — closing
    over them would bake tens of MB of literals into the HLO and the
    tunnel's remote-compile endpoint rejects the request (HTTP 413).

    REPS auto-calibrates: cheap pieces (tens of microseconds) are invisible
    under the ~32 ms tunnel RTT at REPS=32, so after a pilot measurement the
    loop length is re-chosen so the amortized body dwarfs the RTT jitter
    (total in-device time >= ~12x RTT), then re-jitted and re-measured."""
    def make(reps):
        def run(eps, o):
            def body(i, acc):
                return acc + phase(o, acc * 1e-30)
            return jax.lax.fori_loop(0, reps, body, eps)
        return jax.jit(run)

    def measure(jitted):
        float(jitted(jnp.float32(0.0), ops))       # compile + drain
        ts = []
        for _ in range(outer):
            t0 = time.perf_counter()
            float(jitted(jnp.float32(0.0), ops))
            ts.append((time.perf_counter() - t0) * 1e3)
        return float(np.median(ts))

    reps = REPS
    total = measure(make(reps))
    target = 12.0 * rtt
    if total - rtt < target:
        per_op = max((total - rtt) / reps, 1e-3)   # pilot estimate, clamped
        reps = int(min(16384, max(reps, np.ceil(target / per_op))))
        total = measure(make(reps))
        if total - rtt < target:
            # reps hit the cap with the amortization target unmet: the
            # number is RTT-jitter-sensitive — tighten by raising the outer
            # repeat count (median over more fetches) and say so
            total = float(np.median(
                [measure(make(reps)) for _ in range(3)]))
            print(f"  WARNING: reps cap {reps} leaves device time "
                  f"{total - rtt:.1f} ms under the {target:.1f} ms target; "
                  f"median of 3x{outer} fetches taken (RTT-jitter risk)")
    return (total - rtt) / reps, reps


def _cost(fn, *args):
    """XLA bytes/flops of the single-application program."""
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return (float(c.get("bytes accessed", 0.0)),
            float(c.get("flops", 0.0)))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--solve-ms", type=float, default=None,
                    help="whole-solve parity wall for the in_context "
                         "section (default: results.json circle_5k_10k "
                         "tpu_parity_ms)")
    ap.add_argument("--cg-iterations", type=int, default=None,
                    help="CG iteration count of that solve (default: "
                         "results.json parity_cg_iterations)")
    ap.add_argument("--lm-intercept-ms", type=float, default=44.0,
                    help="per-solve LM fixed cost estimate subtracted "
                         "before dividing by CG iterations (round-3 "
                         "decomposition 55 ms minus emb's measured "
                         "-11.3 ms — BASELINE.md roofline section)")
    args = ap.parse_args()

    prob, g = bench.build()
    q, t, s = prob.q, prob.t, prob.switch
    rtt = _rtt()
    print(f"rtt floor {rtt:.2f} ms; REPS {REPS}; HBM peak {HBM_PEAK_GBS} GB/s")

    blocks = jax.jit(lambda: gn_ops.assemble_t(prob, q, t, s))()
    diag_n = blocks.D[jnp.arange(0, 36, 7)]
    scale_n = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(diag_n, 0)))
    scale_s = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(blocks.ds, 0)))
    lm_n = jnp.clip(diag_n * scale_n**2, 1e-6, 1e32) / 1e4
    lm_s = jnp.clip(blocks.ds * scale_s**2, 1e-6, 1e32) / 1e4
    red = jax.jit(lambda: gn_ops.schur_reduce_t(
        blocks, prob, scale_n, scale_s, lm_n, lm_s))()

    # production parity operators: emb band build -> AoS BCR factorize,
    # tiledrows6 loop matvec, coarse:64. tile_k from the RAW edge list (as
    # bench.py/the engine do) — the capacity-padded arrays alias every
    # masked edge onto node 0 and inflate tile_k 13440 vs 640 (CLAUDE.md).
    tile_k = int(gn_ops.tile_k_for(g.loop_pairs[:, 1], g.loop_pairs[:, 0],
                                   prob.q.shape[0]))
    inc = gn_ops.build_tiled_incidence(prob, tile_k)
    blkrows = jax.jit(lambda: gn_ops.tiled_blocks_rows(red, inc))()
    A_band, C_band, _ = jax.jit(lambda: band_em.build_band_system_emb(
        red.Dh, red.Bh, group=prob.fanout))()
    fac = jax.jit(lambda: band_ops.bcr_factorize(
        A_band, C_band, group=prob.fanout, max_levels=2))()
    Hc = jax.jit(lambda: coarse_ops.build_coarse_inverse(red, prob, 64))()
    r0 = red.rhs_n
    fanout = int(prob.fanout)

    # all heavy operands ship as ONE jit-argument pytree (never closures —
    # baked literals blow the tunnel's remote-compile size limit, HTTP 413)
    ops = {"red": red, "prob": prob, "inc": inc, "blkrows": blkrows,
           "fac": fac, "Hc": Hc, "r0": r0}

    def vsum(x):
        return jnp.sum(x) * 1e-12

    pieces = {}

    def piece(name, phase, cost_fn, *cost_args):
        ms, reps_eff = _timed_loop(phase, ops, rtt)
        by, fl = _cost(cost_fn, ops, *cost_args)
        gbs = by / (ms * 1e-3) / 1e9 if ms > 0 else float("nan")
        pieces[name] = {
            "ms_per_op": round(ms, 4),
            "reps": reps_eff,          # effective (auto-recalibrated) reps
            "mb_accessed": round(by / 1e6, 3),
            "gb_per_s": round(gbs, 1),
            "pct_hbm_peak": round(100.0 * gbs / HBM_PEAK_GBS, 1),
            "gflop_per_s": round(fl / (ms * 1e-3) / 1e9, 1),
        }
        p = pieces[name]
        print(f"{name:28s} {p['ms_per_op']:8.4f} ms  "
              f"{p['mb_accessed']:8.2f} MB  {p['gb_per_s']:7.1f} GB/s  "
              f"{p['pct_hbm_peak']:5.1f}% peak  {p['gflop_per_s']:8.1f} GF/s")

    piece("band matvec",
          lambda o, d: vsum(gn_ops.band_matvec_t(o["red"], o["prob"],
                                                 o["r0"] + d)),
          lambda o, p: gn_ops.band_matvec_t(o["red"], o["prob"], p), r0)
    piece("loop matvec (tiledrows6)",
          lambda o, d: vsum(gn_ops.loop_matvec_tiled_rows6(
              o["inc"], o["blkrows"], o["r0"] + d)),
          lambda o, p: gn_ops.loop_matvec_tiled_rows6(
              o["inc"], o["blkrows"], p), r0)
    piece("bcr precond apply (l2)",
          lambda o, d: vsum(band_ops.band_precond_apply(
              o["fac"], (o["r0"] + d).T).T),
          lambda o, p: band_ops.band_precond_apply(o["fac"], p.T).T, r0)
    piece("coarse apply (c=64)",
          lambda o, d: vsum(coarse_ops.coarse_apply(
              o["Hc"], o["prob"].free_mask, o["r0"] + d, 64)),
          lambda o, p: coarse_ops.coarse_apply(
              o["Hc"], o["prob"].free_mask, p, 64), r0)

    def full_matvec(o, p):
        return (gn_ops.band_matvec_t(o["red"], o["prob"], p)
                + gn_ops.loop_matvec_tiled_rows6(o["inc"], o["blkrows"], p))

    piece("full reduced matvec",
          lambda o, d: vsum(full_matvec(o, o["r0"] + d)), full_matvec, r0)

    def cg_iter(o, p):
        Ap = full_matvec(o, p)
        pAp = jnp.vdot(p, Ap)
        alpha = 1e-12 / (pAp + 1.0)
        x = alpha * p
        r = p - alpha * Ap
        z = (band_ops.band_precond_apply(o["fac"], r.T).T
             + coarse_ops.coarse_apply(o["Hc"], o["prob"].free_mask, r, 64))
        return x + z * jnp.vdot(r, z) * 1e-12

    piece("full CG iteration (parity)",
          lambda o, d: vsum(cg_iter(o, o["r0"] + d)), cg_iter, r0)

    def band_build_fac(o, D):
        A_b, C_b, _ = band_em.build_band_system_emb(D, o["red"].Bh,
                                                    group=fanout)
        return band_ops.bcr_factorize(A_b, C_b, group=fanout,
                                      max_levels=2)

    piece("band build+factorize (/LM it)",
          lambda o, d: sum(jnp.sum(lf) * 1e-25 for lf in
                           jax.tree_util.tree_leaves(
                               band_build_fac(o, o["red"].Dh + d))),
          band_build_fac, red.Dh)

    # honest LOWER bound on per-CG-iteration HBM traffic: each live operand
    # pytree read once + the vector temporaries. XLA's "bytes accessed" is
    # the post-fusion cost model and counts every fused computation's
    # operand reads — values above HBM peak mean on-chip (VMEM) reuse, so
    # it is an UPPER bound; this working set is the floor.
    def _nbytes(tree):
        return sum(int(np.prod(lf.shape)) * lf.dtype.itemsize
                   for lf in jax.tree_util.tree_leaves(tree))

    ws_cg = (_nbytes((red.Dh, red.Bh, inc, blkrows, fac, Hc))
             + 6 * _nbytes(r0))
    cg = pieces.get("full CG iteration (parity)")
    if cg:
        gbs_min = ws_cg / (cg["ms_per_op"] * 1e-3) / 1e9
        cg["working_set_mb"] = round(ws_cg / 1e6, 2)
        cg["gb_per_s_working_set"] = round(gbs_min, 1)
        cg["pct_hbm_peak_working_set"] = round(
            100.0 * gbs_min / HBM_PEAK_GBS, 1)
        print(f"CG-iteration working set {cg['working_set_mb']:.1f} MB -> "
              f"{cg['gb_per_s_working_set']:.1f} GB/s lower bound "
              f"({cg['pct_hbm_peak_working_set']:.1f}% of HBM peak)")

    # in-context bandwidth analysis (the headline numbers BASELINE.md's
    # roofline section cites). Isolated composite probes LIE about the
    # in-context CG iteration (CLAUDE.md law), so the authoritative number
    # comes from the real whole-solve measurement: the parity row of
    # benchmarks/results.json (or CLI overrides), minus the per-LM-iteration
    # fixed cost, divided by the solve's CG iteration count, against THIS
    # run's working set.
    in_ctx = None
    solve_ms, cg_iters = args.solve_ms, args.cg_iterations
    if solve_ms is None or cg_iters is None:
        try:
            row = json.load(open(
                os.path.join(ROOT, "benchmarks", "results.json")))[
                    "circle_5k_10k"]
            solve_ms = solve_ms or float(row["tpu_parity_ms"])
            cg_iters = cg_iters or int(row["parity_cg_iterations"])
        except (OSError, KeyError, ValueError) as e:
            print(f"in_context skipped (no parity row / override): {e}")
    if solve_ms and cg_iters:
        cg_ms = (solve_ms - args.lm_intercept_ms) / cg_iters
        gbs = ws_cg / (cg_ms * 1e-3) / 1e9
        in_ctx = {
            "solve_ms": solve_ms,
            "cg_iterations": cg_iters,
            "lm_intercept_ms_est": args.lm_intercept_ms,
            "cg_iter_ms": round(cg_ms, 4),
            "working_set_mb": round(ws_cg / 1e6, 2),
            "gb_per_s": round(gbs, 1),
            "pct_hbm_peak": round(100.0 * gbs / HBM_PEAK_GBS, 1),
            "memory_bound_floor_ms_per_iter": round(
                ws_cg / HBM_PEAK_GBS / 1e6, 4),
        }
        print(f"in-context CG iter ({solve_ms} - {args.lm_intercept_ms})"
              f"/{cg_iters} = {cg_ms:.4f} ms -> {gbs:.1f} GB/s "
              f"({in_ctx['pct_hbm_peak']:.1f}% of HBM peak)")

    blob = {"hbm_peak_gb_s": HBM_PEAK_GBS, "pilot_reps": REPS,
            "rtt_ms": round(rtt, 2), "n_cap": int(prob.q.shape[0]),
            "e_cap": int(prob.loop_a.shape[0]), "tile_k": tile_k,
            "in_context": in_ctx, "pieces": pieces}
    with open(OUT, "w") as f:
        json.dump(blob, f, indent=2)
    print("->", OUT)


if __name__ == "__main__":
    main()
