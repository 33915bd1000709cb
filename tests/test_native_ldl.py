"""Native block-sparse LDL^T (native/kpg_ldl.cpp + solver/native_ldl.py):
factorization correctness vs dense, pattern reuse, and the full CPU
reference LM trajectory vs the SuperLU path."""

import numpy as np
import pytest

pytest.importorskip("scipy")

from solve_keyframe_pose_graph_tpu.solver import native_ldl as nl


def _random_block_system(rng, n, extra_pairs):
    pairs = set((i - 1, i) for i in range(1, n))
    while len(pairs) < n - 1 + extra_pairs:
        a, b = sorted(rng.integers(0, n, 2).tolist())
        if a != b:
            pairs.add((a, b))
    A = np.zeros((6 * n, 6 * n))
    for i in range(n):
        Q = rng.normal(size=(6, 6))
        A[6 * i:6 * i + 6, 6 * i:6 * i + 6] += Q @ Q.T + 8 * np.eye(6)
    blocks = {}
    for (i, j) in sorted(pairs):
        M = rng.normal(size=(6, 6)) * 0.4
        A[6 * i:6 * i + 6, 6 * j:6 * j + 6] += M
        A[6 * j:6 * j + 6, 6 * i:6 * i + 6] += M.T
        blocks[(i, j)] = M
    return A, sorted(pairs), blocks


def test_block_ldl_exact_vs_dense(rng):
    if nl.load_library() is None:
        pytest.skip("native LDL unavailable")
    for trial in range(3):
        n = int(rng.integers(20, 60))
        A, pairs, blocks = _random_block_system(rng, n, 25)
        # upper block CSC
        cols = {k: [k] for k in range(n)}
        for (i, j) in pairs:
            cols[j].append(i)
        Ap = np.zeros(n + 1, np.int64)
        Ai, Ax = [], []
        for k in range(n):
            rows = sorted(cols[k])
            Ap[k + 1] = Ap[k] + len(rows)
            for i in rows:
                Ai.append(i)
                Ax.append(A[6 * i:6 * i + 6, 6 * k:6 * k + 6])
        ldl = nl.BlockLDL(n, Ap, np.asarray(Ai, np.int64))
        assert ldl.factor(np.asarray(Ax))
        b = rng.normal(size=(n, 6))
        x = ldl.solve(b)
        x_ref = np.linalg.solve(A, b.ravel()).reshape(n, 6)
        np.testing.assert_allclose(x, x_ref, rtol=0, atol=1e-10)
        # pattern reuse with new values
        assert ldl.factor(np.asarray(Ax) * 1.5)
        x2 = ldl.solve(b)
        np.testing.assert_allclose(x2, x_ref / 1.5, rtol=0, atol=1e-10)


def test_block_system_solves_reduced_system(rng):
    if nl.load_library() is None:
        pytest.skip("native LDL unavailable")
    import jax
    import jax.numpy as jnp
    from solve_keyframe_pose_graph_tpu.ops import gn as gn_ops
    from tests.test_lm_solver import build_circle_problem

    _, prob = build_circle_problem(n=90, n_loops=20, seed=21)
    blocks = gn_ops.assemble(prob, prob.q, prob.t, prob.switch)
    diag_n = np.diagonal(np.asarray(blocks.D), axis1=-2, axis2=-1)
    ds = np.asarray(blocks.ds)
    scale_n = 1.0 / (1.0 + np.sqrt(np.maximum(diag_n, 0)))
    scale_s = 1.0 / (1.0 + np.sqrt(np.maximum(ds, 0)))
    lm_n = np.clip(diag_n * scale_n**2, 1e-6, 1e32) / 1e4
    lm_s = np.clip(ds * scale_s**2, 1e-6, 1e32) / 1e4
    red = gn_ops.schur_reduce(
        blocks, prob, jnp.asarray(scale_n), jnp.asarray(scale_s),
        jnp.asarray(lm_n), jnp.asarray(lm_s))

    Nc, F = prob.n_cap, prob.fanout
    band_f = np.concatenate([np.full(Nc - f - 1, f, np.int64)
                             for f in range(F)])
    band_u = np.concatenate([np.arange(f + 1, Nc, dtype=np.int64)
                             for f in range(F)])
    sys_ = nl.BlockSystem(Nc, band_f, band_u,
                          np.asarray(prob.loop_b), np.asarray(prob.loop_a))
    band_vals = np.concatenate(
        [np.asarray(red.Bh)[f, f + 1:] for f in range(F)], axis=0)
    Ax = sys_.fill(np.asarray(red.Dh), band_vals, band_f,
                   np.asarray(red.Aba_h))
    ok, x = sys_.solve(Ax, np.asarray(red.rhs_n))
    assert ok
    resid = np.asarray(gn_ops.reduced_matvec(red, prob, jnp.asarray(x))
                       ) - np.asarray(red.rhs_n)
    assert np.abs(resid).max() < 1e-9


def test_native_reference_matches_splu_trajectory():
    if nl.load_library() is None:
        pytest.skip("native LDL unavailable")
    from benchmarks import cpu_reference as cr

    prob = cr.build_circle_problem(120, 60)
    out_splu = cr.cpu_reference_solve(prob, max_iterations=6)
    out_ldl = cr.cpu_reference_solve_native(prob, max_iterations=6)
    np.testing.assert_allclose(
        out_ldl["chi2_trace"], out_splu["chi2_trace"], rtol=1e-8)
