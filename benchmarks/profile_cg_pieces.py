"""Per-piece in-context cost of one PCG iteration at bench scale.

Each piece runs amortized inside a fori_loop with a data dependency and a
scalar-only output (the only measurement methodology that survives the
tunneled device + XLA DCE — see CLAUDE.md). Pieces:

  band matvec (xla / pallas), loop matvec, full reduced matvec,
  BCR precond apply, coarse apply, coarse factorization, dots,
  one full CG iteration (matvec + precond + dots + axpys)
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
from solve_keyframe_pose_graph_tpu.ops import coarse as coarse_ops  # noqa: E402
from solve_keyframe_pose_graph_tpu.ops import gn as gn_ops  # noqa: E402
from solve_keyframe_pose_graph_tpu.ops import pallas_band  # noqa: E402

REPS = 32


def timed(name, jitted, *args, rtt=0.0, outer=3):
    float(jitted(*args))
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        float(jitted(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    total = float(np.median(ts))
    print(f"{name:32s} {(total - rtt) / REPS:9.4f} ms/op  "
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
    print(f"{'rtt floor':32s} {rtt:9.3f} ms")

    blocks = jax.jit(lambda: gn_ops.assemble_t(prob, q, t, s))()
    diag_n = blocks.D[jnp.arange(0, 36, 7)]
    scale_n = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(diag_n, 0)))
    scale_s = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(blocks.ds, 0)))
    lm_n = jnp.clip(diag_n * scale_n**2, 1e-6, 1e32) / 1e4
    lm_s = jnp.clip(blocks.ds * scale_s**2, 1e-6, 1e32) / 1e4
    red = jax.jit(lambda: gn_ops.schur_reduce_t(
        blocks, prob, scale_n, scale_s, lm_n, lm_s))()

    Dh_aos = gn_ops.t_blocks_to_aos(red.Dh)
    Bh_aos = jnp.stack([gn_ops.t_blocks_to_aos(red.Bh[f])
                        for f in range(prob.fanout)])
    A_band, C_band, _ = band_ops.build_band_system(Dh_aos, Bh_aos,
                                                   group=prob.fanout)
    fac = jax.jit(lambda: band_ops.bcr_factorize(
        A_band, C_band, group=prob.fanout, max_levels=3))()
    Bup = jax.jit(pallas_band.shift_band_up)(red.Bh)
    Aba_aos = jax.jit(gn_ops.t_blocks_to_aos)(red.Aba_h)
    r0 = red.rhs_n

    def loop(phase):
        def run(eps):
            def body(i, acc):
                return acc + phase(acc * 1e-30)
            return jax.lax.fori_loop(0, REPS, body, eps)
        return jax.jit(run)

    def vsum(x):
        return jnp.sum(x) * 1e-12

    timed("band matvec (xla)", loop(
        lambda d: vsum(gn_ops.band_matvec_t(red, prob, r0 + d))),
        jnp.float32(0.0), rtt=rtt)
    timed("band matvec (pallas)", loop(
        lambda d: vsum(pallas_band.band_matvec_pre(
            red.Dh, red.Bh, Bup, r0 + d, block_n=256))),
        jnp.float32(0.0), rtt=rtt)
    timed("loop matvec", loop(
        lambda d: vsum(gn_ops.loop_matvec_t(red, prob, r0 + d, Aba_aos))),
        jnp.float32(0.0), rtt=rtt)
    timed("full matvec (pallas)", loop(
        lambda d: vsum(gn_ops.reduced_matvec_t(
            red, prob, r0 + d, impl="pallas", Bup=Bup, Aba_aos=Aba_aos))),
        jnp.float32(0.0), rtt=rtt)
    timed("bcr precond apply", loop(
        lambda d: vsum(band_ops.band_precond_apply(fac, (r0 + d).T).T)),
        jnp.float32(0.0), rtt=rtt)

    Hc16 = jax.jit(lambda: coarse_ops.build_coarse_inverse(red, prob, 16))()
    timed("coarse apply (c=16)", loop(
        lambda d: vsum(coarse_ops.coarse_apply(
            Hc16, prob.free_mask, r0 + d, 16))),
        jnp.float32(0.0), rtt=rtt)
    timed("coarse factorize (c=16)", loop(
        lambda d: vsum(coarse_ops.build_coarse_inverse(
            gn_ops.ReducedSystemT(red.Dh + d, red.Bh, red.Aba_h, red.rhs_n,
                                  red.chb, red.cha, red.ds_inv, red.rhs_s),
            prob, 16))),
        jnp.float32(0.0), rtt=rtt)
    timed("coarse factorize (c=64)", loop(
        lambda d: vsum(coarse_ops.build_coarse_inverse(
            gn_ops.ReducedSystemT(red.Dh + d, red.Bh, red.Aba_h, red.rhs_n,
                                  red.chb, red.cha, red.ds_inv, red.rhs_s),
            prob, 64))),
        jnp.float32(0.0), rtt=rtt)

    timed("2x vdot", loop(
        lambda d: jnp.vdot(r0 + d, r0) * 1e-12 + jnp.vdot(r0, r0 + d) * 1e-12),
        jnp.float32(0.0), rtt=rtt)

    def cg_iter(d):
        p = r0 + d
        Ap = gn_ops.reduced_matvec_t(red, prob, p, impl="pallas",
                                     Bup=Bup, Aba_aos=Aba_aos)
        pAp = jnp.vdot(p, Ap)
        alpha = 1e-12 / (pAp + 1.0)
        x = alpha * p
        r = p - alpha * Ap
        z = band_ops.band_precond_apply(fac, r.T).T
        rz = jnp.vdot(r, z)
        return vsum(x) + rz * 1e-12
    timed("full CG iteration (band)", loop(cg_iter),
          jnp.float32(0.0), rtt=rtt)

    # BCR factorization per LM iteration, for reference
    def band_fac(d):
        A_b, C_b, _ = band_ops.build_band_system(Dh_aos + d, Bh_aos,
                                                 group=prob.fanout)
        f2 = band_ops.bcr_factorize(A_b, C_b, group=prob.fanout, max_levels=3)
        return sum(jnp.sum(lf) * 1e-25 for lf in
                   jax.tree_util.tree_leaves(f2))
    timed("bcr factorize (3 lvl)", loop(band_fac), jnp.float32(0.0), rtt=rtt)


if __name__ == "__main__":
    main()
