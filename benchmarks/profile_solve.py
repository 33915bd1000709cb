"""Phase-level profiling of the 5k/10k LM solve on the real device.

The tunneled device has a ~30 ms host round-trip floor, so each phase is
run REPS times *inside one jitted program* (chained through a scalar data
dependency so XLA cannot CSE the repeats away) and only a scalar checksum
leaves the device. Per-op cost = (total - rtt_floor) / REPS.
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
from solve_keyframe_pose_graph_tpu.ops import pcg as pcg_ops  # noqa: E402
from solve_keyframe_pose_graph_tpu.ops import smallinv  # noqa: E402

REPS = 16


def fetch_scalar(x):
    return float(jax.device_get(x))


def timed(name, jitted, *args, reps_inner=REPS, rtt=0.0, outer=3):
    fetch_scalar(jitted(*args))   # compile + warm
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        fetch_scalar(jitted(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    total = float(np.median(ts))
    per = (total - rtt) / reps_inner
    print(f"{name:28s} {per:9.3f} ms/op   (total {total:8.1f} ms)")
    return per


def chain(phase_scalar_fn):
    """Run phase REPS times, each perturbed by the previous checksum."""
    def run(eps):
        def body(i, acc):
            return acc + phase_scalar_fn(acc * 1e-30 + eps * 0.0)
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))
    return jax.jit(run)


def main():
    prob, _ = bench.build()
    q, t, s = prob.q, prob.t, prob.switch

    # measure the round-trip floor with a trivial program
    triv = jax.jit(lambda e: e + 1.0)
    fetch_scalar(triv(jnp.float32(0.0)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fetch_scalar(triv(jnp.float32(0.0)))
        ts.append((time.perf_counter() - t0) * 1e3)
    rtt = float(np.median(ts))
    print(f"{'rtt floor':28s} {rtt:9.3f} ms")

    def cost_phase(d):
        return gn_ops.evaluate_cost(prob, q + d, t, s)
    timed("evaluate_cost", chain(cost_phase), jnp.float32(0.0), rtt=rtt)

    def asm_phase(d):
        b = gn_ops.assemble(prob, q + d, t, s)
        return b.cost + jnp.sum(b.ds) * 1e-20
    timed("assemble", chain(asm_phase), jnp.float32(0.0), rtt=rtt)

    blocks = jax.jit(lambda: gn_ops.assemble(prob, q, t, s))()
    diag_n = jnp.diagonal(blocks.D, axis1=-2, axis2=-1)
    scale_n = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(diag_n, 0)))
    scale_s = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(blocks.ds, 0)))
    lm_n = jnp.clip(diag_n * scale_n**2, 1e-6, 1e32) / 1e4
    lm_s = jnp.clip(blocks.ds * scale_s**2, 1e-6, 1e32) / 1e4

    def red_phase(d):
        r = gn_ops.schur_reduce(blocks, prob, scale_n + d, scale_s, lm_n, lm_s)
        return jnp.sum(r.rhs_n) * 1e-10 + jnp.sum(r.ds_inv) * 1e-20
    timed("schur_reduce", chain(red_phase), jnp.float32(0.0), rtt=rtt)

    red = jax.jit(lambda: gn_ops.schur_reduce(
        blocks, prob, scale_n, scale_s, lm_n, lm_s))()

    def band_phase(d):
        A_band, C_band, _ = band_ops.build_band_system(
            red.Dh + d * 1e-30, red.Bh, group=prob.fanout)
        fac = band_ops.bcr_factorize(A_band, C_band, group=prob.fanout)
        return sum(jnp.sum(leaf) * 1e-20 for leaf in
                   jax.tree_util.tree_leaves(fac))
    timed("band_build+bcr_factorize", chain(band_phase), jnp.float32(0.0),
          rtt=rtt)

    A_band, C_band, _ = jax.jit(lambda: band_ops.build_band_system(
        red.Dh, red.Bh, group=prob.fanout))()
    fac = jax.jit(lambda: band_ops.bcr_factorize(
        A_band, C_band, group=prob.fanout))()

    def papply_phase(d):
        y = band_ops.band_precond_apply(fac, red.rhs_n + d * 1e-30)
        return jnp.sum(y) * 1e-10
    timed("band_precond_apply", chain(papply_phase), jnp.float32(0.0), rtt=rtt)

    def inv_phase(d):
        return jnp.sum(smallinv.gauss_jordan_inv(red.Dh + d * 1e-30)) * 1e-10
    timed("jacobi gauss_jordan_inv", chain(inv_phase), jnp.float32(0.0),
          rtt=rtt)

    def mv_phase(d):
        return jnp.sum(gn_ops.reduced_matvec(red, prob, red.rhs_n + d * 1e-30)
                       ) * 1e-10
    timed("reduced_matvec", chain(mv_phase), jnp.float32(0.0), rtt=rtt)

    def pcg_phase(d):
        mv = lambda p: gn_ops.reduced_matvec(red, prob, p)
        pc = lambda r: band_ops.band_precond_apply(fac, r)
        sol = pcg_ops.pcg_nodes(mv, pc, red.rhs_n + d * 1e-30,
                                max_iterations=8, r_tolerance=0.0,
                                q_tolerance=0.0)
        return jnp.sum(sol.x) * 1e-10
    timed("pcg (8 full iters, band)", chain(pcg_phase), jnp.float32(0.0),
          rtt=rtt)


if __name__ == "__main__":
    main()
