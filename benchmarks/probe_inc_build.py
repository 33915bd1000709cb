"""Probe: device cost of the in-jit tiled-incidence build (gn.
build_tiled_incidence), which runs ONCE per lm_solve (bench.py chains 4
solves -> 4 builds, all inside measured time).

Amortized in-program measurement per CLAUDE.md rules: a fori_loop builds
the incidence k times with a data-dependent (never-taken) select on the
inputs so XLA cannot CSE or hoist the builds, checksums every leaf into
the carry, and we difference k=9 against k=1.

If this lands >~1.5 ms the host-precomputed incidence (numpy argsort +
slot assignment shipped as two (T*K,) i32 arrays; the 21 MB one-hot still
built on device) pays for itself.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N_CAP, E_CAP = 8192, 16384


def main():
    from solve_keyframe_pose_graph_tpu.graph import synthetic
    from solve_keyframe_pose_graph_tpu.ops import gn
    from solve_keyframe_pose_graph_tpu.solver.problem import build_problem_np

    g = synthetic.circle_graph(n_nodes=5000, n_loops=10000, seed=0)
    # tile capacity derived from the actual edge distribution (as the engine
    # does — a hardcoded value below the max per-tile load would silently
    # drop edges and measure a truncated, cheaper build)
    TILE_K = gn.tile_k_for(g.loop_pairs[:, 1], g.loop_pairs[:, 0], N_CAP)
    prob = build_problem_np(
        q=g.vio_q, t=g.vio_t, vio_q=g.vio_q, vio_t=g.vio_t,
        node_valid=np.ones(g.n_nodes, bool),
        loop_pairs=g.loop_pairs, loop_q=g.loop_q, loop_t=g.loop_t,
        loop_w=g.loop_w, loop_valid=np.ones(g.n_loops, bool),
        switch=np.full(g.n_loops, 0.99),
        prior_idx=np.array([0]), prior_q=g.vio_q[:1], prior_t=g.vio_t[:1],
        prior_w=np.array([1.1]),
        n_cap=N_CAP, e_cap=E_CAP, p_cap=8,
    )

    def chained(k):
        @jax.jit
        def run(p, seed):
            import dataclasses

            def body(i, acc):
                # never-taken data-dependent select defeats CSE/hoisting
                la = jnp.where(acc > 1e30, p.loop_b, p.loop_a)
                p_i = dataclasses.replace(p, loop_a=la)
                inc = gn.build_tiled_incidence(p_i, TILE_K)
                return (acc
                        + jnp.sum(inc.slot_edge).astype(jnp.float32)
                        + jnp.sum(inc.slot_src).astype(jnp.float32)
                        + jnp.sum(inc.onehot))
            return jax.lax.fori_loop(0, k, body, seed)
        return run

    run1, run9 = chained(1), chained(9)
    for _ in range(2):
        float(run1(prob, jnp.float32(0.0)))
        float(run9(prob, jnp.float32(0.0)))
    t1s, t9s = [], []
    for i in range(5):
        s = jnp.float32(i)
        t0 = time.perf_counter(); float(run1(prob, s))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(run9(prob, s))
        t9s.append(time.perf_counter() - t0)
    ms = (np.median(t9s) - np.median(t1s)) / 8 * 1e3
    print(f"tiled incidence build: {ms:.3f} ms per build "
          f"(k=1 {np.median(t1s)*1e3:.1f} ms, k=9 {np.median(t9s)*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
