"""Loop-matvec variants, measured in-context (fori_loop, data-dependent,
scalar output). The loop matvec is ~80% of a CG iteration at bench scale
(profile_cg_pieces.py): gather (Ec,6) rows, two (Ec,6,6)x(Ec,6) einsums,
scatter-add back. This experiment attributes the cost (gather vs einsum vs
scatter) and tests sorted-index/segment-sum alternatives.
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

from solve_keyframe_pose_graph_tpu.ops import gn as gn_ops  # noqa: E402

REPS = 32


def timed(name, jitted, *args, rtt=0.0, outer=3):
    float(jitted(*args))
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        float(jitted(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    total = float(np.median(ts))
    print(f"{name:44s} {(total - rtt) / REPS:9.4f} ms/op  "
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
    print(f"{'rtt floor':44s} {rtt:9.3f} ms")

    blocks = jax.jit(lambda: gn_ops.assemble_t(prob, q, t, s))()
    diag_n = blocks.D[jnp.arange(0, 36, 7)]
    scale_n = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(diag_n, 0)))
    scale_s = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(blocks.ds, 0)))
    lm_n = jnp.clip(diag_n * scale_n**2, 1e-6, 1e32) / 1e4
    lm_s = jnp.clip(blocks.ds * scale_s**2, 1e-6, 1e32) / 1e4
    red = jax.jit(lambda: gn_ops.schur_reduce_t(
        blocks, prob, scale_n, scale_s, lm_n, lm_s))()
    Aba_aos = jax.jit(gn_ops.t_blocks_to_aos)(red.Aba_h)
    r0 = red.rhs_n
    Nc = r0.shape[-1]
    Ec = prob.e_cap
    dt = r0.dtype

    lb = np.asarray(prob.loop_b)
    la = np.asarray(prob.loop_a)
    # b-sorted and a-sorted edge permutations (host precompute — these are
    # problem constants)
    pb = np.argsort(lb, kind="stable")
    pa = np.argsort(la, kind="stable")
    lb_s = jnp.asarray(lb[pb])
    la_of_pb = jnp.asarray(la[pb])
    la_s = jnp.asarray(la[pa])
    lb_of_pa = jnp.asarray(lb[pa])
    Aba_b = Aba_aos[jnp.asarray(pb)]
    Aba_a = Aba_aos[jnp.asarray(pa)]

    def loop(phase):
        def run(eps):
            def body(i, acc):
                return acc + phase(acc * 1e-30)
            return jax.lax.fori_loop(0, REPS, body, eps)
        return jax.jit(run)

    def vsum(x):
        return jnp.sum(x) * 1e-12

    # v0: current implementation
    timed("v0 current (unsorted at[].add)", loop(
        lambda d: vsum(gn_ops.loop_matvec_t(red, prob, r0 + d, Aba_aos))),
        jnp.float32(0.0), rtt=rtt)

    # attribution: gathers only
    def gathers_only(d):
        pT = (r0 + d).T
        return vsum(pT[prob.loop_b]) + vsum(pT[prob.loop_a])
    timed("  gathers only", loop(gathers_only), jnp.float32(0.0), rtt=rtt)

    # attribution: gathers + einsums (no scatter)
    def no_scatter(d):
        pT = (r0 + d).T
        xb = pT[prob.loop_b]
        xa = pT[prob.loop_a]
        vb = jnp.einsum("eij,ej->ei", Aba_aos, xa)
        va = jnp.einsum("eij,ei->ej", Aba_aos, xb)
        return vsum(vb) + vsum(va)
    timed("  gathers+einsums (no scatter)", loop(no_scatter),
          jnp.float32(0.0), rtt=rtt)

    # v1: sorted scatters with hints
    def v1(d):
        pT = (r0 + d).T
        xb = pT.at[lb_of_pa].get()
        xa = pT.at[la_of_pb].get()
        vb = jnp.einsum("eij,ej->ei", Aba_b, xa)     # b-sorted order
        va = jnp.einsum("eij,ei->ej", Aba_a, xb)     # a-sorted order
        y = jnp.zeros((Nc, 6), dt).at[lb_s].add(
            vb, indices_are_sorted=True)
        y = y.at[la_s].add(va, indices_are_sorted=True)
        return vsum(y.T)
    timed("v1 sorted scatters", loop(v1), jnp.float32(0.0), rtt=rtt)

    # v2: segment_sum on sorted ids
    def v2(d):
        pT = (r0 + d).T
        xb = pT.at[lb_of_pa].get()
        xa = pT.at[la_of_pb].get()
        vb = jnp.einsum("eij,ej->ei", Aba_b, xa)
        va = jnp.einsum("eij,ei->ej", Aba_a, xb)
        y = (jax.ops.segment_sum(vb, lb_s, num_segments=Nc,
                                 indices_are_sorted=True)
             + jax.ops.segment_sum(va, la_s, num_segments=Nc,
                                   indices_are_sorted=True))
        return vsum(y.T)
    timed("v2 segment_sum sorted", loop(v2), jnp.float32(0.0), rtt=rtt)

    # v3: single combined scatter (2E payloads, one global destination sort)
    dest = np.concatenate([lb, la])
    pc = np.argsort(dest, kind="stable")
    dest_s = jnp.asarray(dest[pc])
    pc_j = jnp.asarray(pc)

    def v3(d):
        pT = (r0 + d).T
        xb = pT[prob.loop_b]
        xa = pT[prob.loop_a]
        vb = jnp.einsum("eij,ej->ei", Aba_aos, xa)
        va = jnp.einsum("eij,ei->ej", Aba_aos, xb)
        payload = jnp.concatenate([vb, va], axis=0)[pc_j]
        y = jnp.zeros((Nc, 6), dt).at[dest_s].add(
            payload, indices_are_sorted=True)
        return vsum(y.T)
    timed("v3 combined sorted scatter", loop(v3), jnp.float32(0.0), rtt=rtt)

    # v4: one-hot segment matmul via padded widths — wide accumulate
    # (scatter into (Nc, 16) lanes then fold) — probes whether payload
    # width matters
    def v4(d):
        pT = (r0 + d).T
        xb = pT[prob.loop_b]
        xa = pT[prob.loop_a]
        vb = jnp.einsum("eij,ej->ei", Aba_aos, xa)
        va = jnp.einsum("eij,ei->ej", Aba_aos, xb)
        wide = jnp.concatenate([vb, va], axis=-1)    # (Ec, 12)
        # single scatter with 12-wide payloads at b; a-side separate
        y = jnp.zeros((Nc, 12), dt).at[prob.loop_b].add(wide)
        yb = y[:, :6] + jnp.zeros((Nc, 6), dt).at[prob.loop_a].add(va)
        return vsum(yb) + vsum(y[:, 6:])
    timed("v4 wide payload probe", loop(v4), jnp.float32(0.0), rtt=rtt)

    # v5: fp64-free gather via take_along_axis on flat layout
    flat_idx_b = jnp.asarray((lb[:, None] * 6 + np.arange(6)).ravel())
    flat_idx_a = jnp.asarray((la[:, None] * 6 + np.arange(6)).ravel())

    def v5(d):
        pF = (r0 + d).T.reshape(-1)
        xb = pF[flat_idx_b].reshape(Ec, 6)
        xa = pF[flat_idx_a].reshape(Ec, 6)
        vb = jnp.einsum("eij,ej->ei", Aba_aos, xa)
        va = jnp.einsum("eij,ei->ej", Aba_aos, xb)
        y = jnp.zeros((Nc, 6), dt).at[prob.loop_b].add(vb)
        y = y.at[prob.loop_a].add(va)
        return vsum(y.T)
    timed("v5 flat gather probe", loop(v5), jnp.float32(0.0), rtt=rtt)


if __name__ == "__main__":
    main()
