"""IncrementalBuilder (solver/incremental.py) must be BITWISE equal to the
from-scratch build_problem_np at every step of a growing stream — it is a
pure transfer/caching optimization (the reference's persistent
ceres::Problem adds only new residual blocks per trigger,
PoseGraphSLAM.cpp:1338-1640; correctness there is structural, here it is
verified)."""

import numpy as np

from solve_keyframe_pose_graph_tpu.graph import synthetic
from solve_keyframe_pose_graph_tpu.solver.incremental import (
    IncrementalBuilder,
)
from solve_keyframe_pose_graph_tpu.solver.problem import (
    Problem, build_problem_np,
)

import dataclasses


def _inputs(g, n, e, node_valid=None, loop_valid=None, switch=None,
            node_free=None):
    nv = np.ones(n, bool) if node_valid is None else node_valid
    lv = np.ones(e, bool) if loop_valid is None else loop_valid
    sw = np.full(e, 0.99) if switch is None else switch
    return dict(
        q=g.vio_q[:n] + 0.0, t=g.vio_t[:n] + 0.0,
        vio_q=g.vio_q[:n], vio_t=g.vio_t[:n],
        node_valid=nv,
        loop_pairs=g.loop_pairs[:e], loop_q=g.loop_q[:e],
        loop_t=g.loop_t[:e], loop_w=g.loop_w[:e], loop_valid=lv,
        switch=sw,
        prior_idx=np.array([0]), prior_q=g.vio_q[:1], prior_t=g.vio_t[:1],
        prior_w=np.array([1.1]), node_free=node_free,
        n_cap=1024, e_cap=256, p_cap=16, dtype=np.float32,
    )


def _assert_problem_equal(pa: Problem, pb: Problem):
    for f in dataclasses.fields(Problem):
        a = np.asarray(getattr(pa, f.name))
        b = np.asarray(getattr(pb, f.name))
        np.testing.assert_array_equal(a, b, err_msg=f.name)


def test_incremental_bitwise_equals_scratch_over_stream():
    g = synthetic.circle_graph(n_nodes=700, n_loops=90, seed=11)
    b = IncrementalBuilder()
    rng = np.random.default_rng(0)
    steps = [(150, 10), (151, 10), (400, 37), (555, 61), (700, 90)]
    for n, e in steps:
        kw = _inputs(g, n, e)
        # evolving state: perturb q/t/switch like post-solve write-backs
        kw["q"] = kw["q"] + rng.normal(scale=1e-3, size=kw["q"].shape)
        kw["switch"] = np.full(e, 0.9)
        p_inc = b.build(**kw)
        p_ref = build_problem_np(**{k: v for k, v in kw.items()})
        _assert_problem_equal(p_inc, p_ref)
    assert b.full_builds == 1           # only the first step
    assert b.delta_builds == len(steps) - 1


def test_incremental_handles_dead_zones_and_guard_fallback():
    g = synthetic.circle_graph(n_nodes=400, n_loops=40, seed=3)
    b = IncrementalBuilder()
    # step 1: prefix with a dead zone in the middle (kidnap interval)
    nv1 = np.ones(200, bool); nv1[120:140] = False
    kw1 = _inputs(g, 200, 12, node_valid=nv1)
    _assert_problem_equal(b.build(**kw1), build_problem_np(**kw1))
    # step 2: append-only growth keeps the dead zone -> delta path
    nv2 = np.ones(400, bool); nv2[120:140] = False
    kw2 = _inputs(g, 400, 40, node_valid=nv2)
    _assert_problem_equal(b.build(**kw2), build_problem_np(**kw2))
    assert b.delta_builds == 1
    # step 3: RETROACTIVE mask change (e.g. edge ablation) must be caught
    # by the guards -> full rebuild, still exact
    lv3 = np.ones(40, bool); lv3[5] = False
    kw3 = _inputs(g, 400, 40, node_valid=nv2, loop_valid=lv3)
    _assert_problem_equal(b.build(**kw3), build_problem_np(**kw3))
    assert b.full_builds == 2
    # step 4: frozen prefix (checkpoint restore) changes free_mask only —
    # free_mask ships in the state bundle, so the delta path stays valid
    nf = np.zeros(400, bool); nf[:100] = True
    kw4 = _inputs(g, 400, 40, node_valid=nv2, loop_valid=lv3,
                  node_free=~nf)
    _assert_problem_equal(b.build(**kw4), build_problem_np(**kw4))


def test_incremental_capacity_rebucket_falls_back():
    g = synthetic.circle_graph(n_nodes=300, n_loops=30, seed=5)
    b = IncrementalBuilder()
    kw = _inputs(g, 200, 20)
    b.build(**kw)
    kw2 = _inputs(g, 300, 30)
    kw2["n_cap"] = 2048                      # bucket doubled
    _assert_problem_equal(b.build(**kw2), build_problem_np(**kw2))
    assert b.full_builds == 2
