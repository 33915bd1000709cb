"""Reliable phase profile: every phase amortized in a fori loop inside one
jitted program (chained through data dependencies), scalar-only output."""

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
from solve_keyframe_pose_graph_tpu.ops import se3  # noqa: E402

REPS = 16


def timed(name, jitted, *args, rtt=0.0, outer=3):
    float(jitted(*args))
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        float(jitted(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    total = float(np.median(ts))
    print(f"{name:30s} {(total - rtt) / REPS:9.3f} ms/op  "
          f"(total {total:8.1f})")


def main():
    prob, _ = bench.build()
    q, t, s = prob.q, prob.t, prob.switch

    triv = jax.jit(lambda e: e + 1.0)
    float(triv(jnp.float32(0.0)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(triv(jnp.float32(0.0)))
        ts.append((time.perf_counter() - t0) * 1e3)
    rtt = float(np.median(ts))
    print(f"{'rtt floor':30s} {rtt:9.3f} ms")

    def loop(phase):
        def run(eps):
            def body(i, acc):
                return acc + phase(acc * 1e-30)
            return jax.lax.fori_loop(0, REPS, body, eps)
        return jax.jit(run)

    timed("evaluate_cost", loop(
        lambda d: gn_ops.evaluate_cost(prob, q + d, t, s)),
        jnp.float32(0.0), rtt=rtt)

    timed("assemble", loop(
        lambda d: gn_ops.assemble(prob, q + d, t, s).cost),
        jnp.float32(0.0), rtt=rtt)

    blocks = jax.jit(lambda: gn_ops.assemble(prob, q, t, s))()
    diag_n = jnp.diagonal(blocks.D, axis1=-2, axis2=-1)
    scale_n = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(diag_n, 0)))
    scale_s = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(blocks.ds, 0)))
    lm_n = jnp.clip(diag_n * scale_n**2, 1e-6, 1e32) / 1e4
    lm_s = jnp.clip(blocks.ds * scale_s**2, 1e-6, 1e32) / 1e4

    timed("schur_reduce", loop(
        lambda d: jnp.sum(gn_ops.schur_reduce(
            blocks, prob, scale_n + d, scale_s, lm_n, lm_s).rhs_n) * 1e-10),
        jnp.float32(0.0), rtt=rtt)

    red = jax.jit(lambda: gn_ops.schur_reduce(
        blocks, prob, scale_n, scale_s, lm_n, lm_s))()

    def band_phase(d):
        A_band, C_band, _ = band_ops.build_band_system(
            red.Dh + d, red.Bh, group=prob.fanout)
        fac = band_ops.bcr_factorize(A_band, C_band, group=prob.fanout)
        return sum(jnp.sum(leaf) * 1e-25 for leaf in
                   jax.tree_util.tree_leaves(fac))
    timed("band_build+bcr_factorize", loop(band_phase),
          jnp.float32(0.0), rtt=rtt)

    timed("apply_step(quat_box_plus)", loop(
        lambda d: jnp.sum(se3.quat_normalize(
            se3.quat_box_plus(q, red.rhs_n[:, :3] + d))) * 1e-10),
        jnp.float32(0.0), rtt=rtt)


if __name__ == "__main__":
    main()
