"""Streaming engine tests: trigger gating, incremental growth, warm starts,
and multi-world kidnap recovery with inter-world merge (BASELINE configs 3/5).

The kidnap scenario is fully scripted through the same indicator API the
reference exposes over ROS (NodeDataManager.cpp:763-792) — fault injection
without hardware, as called out in SURVEY.md section 4."""

import numpy as np

from solve_keyframe_pose_graph_tpu.config import Config, SolverConfig
from solve_keyframe_pose_graph_tpu.graph.store import GraphStore
from solve_keyframe_pose_graph_tpu.solver.engine import SolverEngine
from solve_keyframe_pose_graph_tpu.utils import nse3

S = 1_000_000_000
T0 = 1000 * S


def cfg64():
    return Config(solver=SolverConfig(dtype="float64"))


def yaw_quat(yaw_rad):
    return np.array([0.0, 0.0, np.sin(yaw_rad / 2), np.cos(yaw_rad / 2)])


def test_trigger_gating():
    store = GraphStore()
    eng = SolverEngine(store, cfg64())
    # no data: no solve
    assert not eng.trigger()
    store.add_node(T0, nse3.quat_identity(), [0, 0, 0])
    store.add_node(T0 + S, nse3.quat_identity(), [1, 0, 0])
    # nodes but no loop edge: no solve (reference :1306-1312)
    assert not eng.trigger()
    store.add_loop_edge(store.node_timestamp(1), store.node_timestamp(0),
                        nse3.quat_identity(), [-1.05, 0, 0], 1.0)
    assert eng.trigger()
    assert eng.solved_until == 1
    # no new edge since: sleeps again
    assert not eng.trigger()
    # kidnapped: solver sleeps even with new edges (reference :1314-1319)
    store.mark_as_kidnapped(T0 + 2 * S)
    store.mark_as_unkidnapped(T0 + 3 * S)
    store.add_node(T0 + 4 * S, nse3.quat_identity(), [0, 0, 0])
    store.mark_as_kidnapped(T0 + 5 * S)
    store.add_loop_edge(store.node_timestamp(1), store.node_timestamp(0),
                        nse3.quat_identity(), [-1, 0, 0], 1.0)
    assert not eng.trigger()                      # currently kidnapped
    store.mark_as_unkidnapped(T0 + 6 * S)
    assert eng.trigger()


def test_streaming_incremental_growth():
    """Config 5 shape: feed keyframes continuously, drop loop edges along
    the way, re-trigger; the watermark and warm-started estimates advance."""
    rng = np.random.default_rng(0)
    store = GraphStore()
    eng = SolverEngine(store, cfg64())

    # ground truth: straight line in x, identity orientation; vio = gt+drift
    N = 120
    drift = np.cumsum(rng.normal(scale=0.02, size=(N, 3)), axis=0)
    for i in range(N):
        store.add_node(T0 + i * S, nse3.quat_identity(),
                       np.array([float(i), 0, 0]) + drift[i])
        if i > 0 and i % 30 == 0:
            # perfect loop edge to node i-20: b_T_a with b=i-20, a=i
            b, a = i - 20, i
            t_rel = np.array([20.0, 0, 0])
            store.add_loop_edge(store.node_timestamp(a), store.node_timestamp(b),
                                nse3.quat_identity(), t_rel, 1.0)
            solved = eng.trigger()
            assert solved
            assert eng.solved_until == i
    assert eng.trigger_id >= 3
    stats = eng.solve_stats
    assert all(s["final_cost"] <= s["initial_cost"] for s in stats)


def test_multiworld_kidnap_merge():
    """Config 3: two worlds created by a kidnap; the first inter-world loop
    edge computes wb_T_wa, union-merges, and re-bases world-1 nodes into the
    world-0 (set root) frame."""
    store = GraphStore()
    eng = SolverEngine(store, cfg64())

    # world 0: gt = x-axis line, vio = gt (exact)
    n0 = 40
    for i in range(n0):
        store.add_node(T0 + i * S, nse3.quat_identity(), [float(i), 0, 0])
    store.add_loop_edge(store.node_timestamp(30), store.node_timestamp(10),
                        nse3.quat_identity(), [-20.0, 0, 0], 1.0)
    assert eng.trigger()

    # kidnap: robot carried to (5, 7) with a 90-degree yaw, new world's VIO
    # frame starts at identity there
    store.kidnap_indicator(T0 + int((n0 + 0.5) * S), "kidnapped")
    # VINS keeps emitting garbage re-init poses during the blackout — these
    # land in the dead zone (world id < 0) and break the odometry chain
    # between the worlds, exactly as in the reference's data model
    for k in range(6):                     # > odometry fanout, so the raw
        store.add_node(T0 + int((n0 + 1 + k * 0.5) * S), nse3.quat_identity(),
                       [100.0 + k, -50.0, 0])   # odometry chain is fully cut
    store.kidnap_indicator(T0 + int((n0 + 4.5) * S), "unkidnapped")

    # world 1 ground truth in world-0 frame: w0_T_w1 = [R(90deg), (5,7,0)]
    q_w01 = yaw_quat(np.pi / 2)
    t_w01 = np.array([5.0, 7.0, 0.0])
    n1 = 30
    w1_nodes = []
    for j in range(n1):
        # vio pose in world-1 frame: straight line along world-1 x
        idx = store.add_node(T0 + (n0 + 5 + j) * S, nse3.quat_identity(),
                             [float(j), 0, 0])
        w1_nodes.append(idx)
    assert store.which_world_is_this(store.node_timestamp(w1_nodes[0])) == 1

    # inter-world loop edge: a in world 1, b in world 0.
    a = w1_nodes[10]                       # w1 vio pose (10,0,0)
    b = 20                                 # w0 pose (20,0,0)
    # gt pose of a in w0 frame:
    q_a_w0, t_a_w0 = nse3.pose_mul(q_w01, t_w01, nse3.quat_identity(),
                                   [10.0, 0, 0])
    q_b, t_b = nse3.quat_identity(), np.array([20.0, 0, 0])
    qi, ti = nse3.pose_inv(q_b, t_b)
    q_bta, t_bta = nse3.pose_mul(qi, ti, q_a_w0, t_a_w0)   # b_T_a observed
    store.add_loop_edge(store.node_timestamp(a), store.node_timestamp(b),
                        q_bta, t_bta, 1.0)
    assert eng.trigger()

    # worlds merged: set of world 1 is world 0
    assert store.worlds.is_exist(1, 0)
    assert store.worlds.find_setID_of_world_i(1) == 0

    # every world-1 node should now sit at its gt position in the w0 frame
    for j, idx in enumerate(w1_nodes):
        q_gt, t_gt = nse3.pose_mul(q_w01, t_w01, nse3.quat_identity(),
                                   [float(j), 0, 0])
        q_est, t_est = eng.get_node_pose(idx)
        np.testing.assert_allclose(t_est, t_gt, atol=0.2)
    # dead-zone handling: no nodes exist in the kidnap window here, and
    # world-0 nodes stayed put
    q0, t0 = eng.get_node_pose(5)
    np.testing.assert_allclose(t0, [5.0, 0, 0], atol=0.05)


def test_engine_warmup_compiles_buckets():
    from solve_keyframe_pose_graph_tpu.graph.store import GraphStore
    from solve_keyframe_pose_graph_tpu.solver.engine import SolverEngine

    eng = SolverEngine(GraphStore())
    cap = eng.config.capacity
    # up to 2x the initial buckets the visited-path staircase IS the full
    # 2x2 product: the stream enters (2048, 256) at node 1025 with only
    # ~half its edges — the LAG pair the first round-5 diagonal rule
    # dropped (measured 20.6 s mid-stream compile stall on it)
    n = eng.warmup(cap.initial_nodes * 2, cap.initial_edges * 2)
    assert n == 4
    eng2 = SolverEngine(GraphStore())
    assert eng2.warmup(cap.initial_nodes * 2, cap.initial_edges * 2,
                       proportional=False) == 4


def test_warmup_pairs_staircase():
    """The proportional pruning keeps exactly the buckets a uniformly
    growing stream visits (including the lag pairs where n_cap has doubled
    but e_cap has not) plus one e-doubling of burst headroom; at 10k/2000
    that is 12 of the 20 full-product programs."""
    from solve_keyframe_pose_graph_tpu.config import CapacityConfig
    from solve_keyframe_pose_graph_tpu.solver.engine import (
        _bucket, _warmup_pairs)

    cap = CapacityConfig()
    pairs = _warmup_pairs(cap, 10000, 2000)
    full = _warmup_pairs(cap, 10000, 2000, proportional=False)
    assert len(full) == 20
    assert len(pairs) == 12
    # simulate the uniform growth path: every (n_cap, e_cap) it visits
    # must be in the kept set (no mid-stream compile stalls)
    visited = set()
    for n in range(1, 10001):
        e = 2000 * n // 10000
        visited.add((_bucket(n, cap.initial_nodes),
                     _bucket(max(e, 1), cap.initial_edges)))
    assert visited <= set(pairs)


def test_engine_warmup_background_overlaps_serving():
    """warmup(background=True) returns after ONE bucket program (the
    production startup path, cli.py serve): the engine must be able to
    ingest + trigger immediately while the remaining programs compile on
    the daemon thread, and warmup_join() certifies full coverage."""
    from solve_keyframe_pose_graph_tpu.graph import synthetic
    from solve_keyframe_pose_graph_tpu.graph.store import GraphStore
    from solve_keyframe_pose_graph_tpu.solver.engine import SolverEngine

    store = GraphStore()
    eng = SolverEngine(store)
    cap = eng.config.capacity
    n = eng.warmup(cap.initial_nodes * 2, cap.initial_edges * 2,
                   background=True)
    assert n == 4
    # serve while the background thread is (possibly still) compiling
    g = synthetic.circle_graph(n_nodes=48, n_loops=6, seed=3)
    t0, dt = 1_000_000_000, 100_000_000
    for i in range(g.n_nodes):
        store.add_node(t0 + i * dt, g.vio_q[i], g.vio_t[i])
    for k in range(g.n_loops):
        a, b = map(int, g.loop_pairs[k])
        store.add_loop_edge(t0 + a * dt, t0 + b * dt,
                            g.loop_q[k], g.loop_t[k], float(g.loop_w[k]))
    assert eng.trigger()
    eng.drain()
    assert eng.solve_stats[-1]["final_cost"] < 1.0
    assert eng.warmup_join(timeout=600.0)

# ---------------------------------------------------------------------------
# literal per-node port of the 4-case initial-guess table
# (PoseGraphSLAM.cpp:1645-1795), fuzzed against the vectorized
# SolverEngine._set_initial_guesses
# ---------------------------------------------------------------------------


def _initial_guesses_literal(eng, node_len, node_worlds):
    """Straight transcription of the reference loop. Returns (q, t) copies
    (does not mutate engine state)."""
    store, worlds = eng.store, eng.store.worlds
    opt_q = eng._opt_q[:node_len].copy()
    opt_t = eng._opt_t[:node_len].copy()
    su = eng.solved_until
    su_world = int(node_worlds[su])
    if su_world < 0:                       # :1652
        su_world = -su_world - 1

    def get_pose(arr_q, arr_t, u):
        return arr_q[u].copy(), arr_t[u].copy()

    for u in range(node_len):
        world_of_u = int(node_worlds[u])
        set_of_u = worlds.find_setID_of_world_i(world_of_u)
        if set_of_u < 0:                   # kidnapped nodes :1665
            continue

        q_sw, t_sw = nse3.quat_identity(), np.zeros(3)
        if set_of_u != world_of_u:         # :1672-1681
            assert worlds.is_exist(set_of_u, world_of_u)
            q_sw, t_sw = worlds.get_pose_between_worlds(set_of_u, world_of_u)

        before = u <= su                   # :1691
        in_change = world_of_u in eng._changes_to_setid   # :1696

        _, vq, vt = store.node_arrays()
        if in_change and before:           # :1706-1727
            old_sid, new_sid = eng._changes_to_setid[world_of_u]
            q_ch, t_ch = worlds.get_pose_between_worlds(new_sid, old_sid)
            qq, tt = get_pose(opt_q, opt_t, u)
            qn, tn = nse3.pose_mul(q_ch, t_ch, qq, tt)
            opt_q[u] = nse3.quat_normalize(qn)
            opt_t[u] = tn
        elif in_change and not before:     # :1729-1755
            if su_world == world_of_u:
                q_l, t_l = vq[su].copy(), vt[su].copy()
                qi, ti = nse3.pose_inv(q_l, t_l)
                qd, td = nse3.pose_mul(qi, ti, vq[u], vt[u])
                if eng.node_pose_exists(su):
                    q_s, t_s = get_pose(opt_q, opt_t, su)
                else:                      # reference leaves w_T_last
                    q_s, t_s = q_l, t_l    # uninitialized here ("HU") — we
                                           # take the manager pose
                qn, tn = nse3.pose_mul(q_s, t_s, qd, td)
            else:
                qn, tn = nse3.pose_mul(q_sw, t_sw, vq[u], vt[u])
            opt_q[u] = nse3.quat_normalize(qn)
            opt_t[u] = tn
        elif not in_change and before:     # :1757-1768
            if su == 0:
                opt_q[u] = nse3.quat_normalize(vq[u].copy())
                opt_t[u] = vt[u].copy()
            # else: skip (keep previous solution)
        else:                              # :1770-1789
            if su_world == world_of_u:
                q_l, t_l = vq[su].copy(), vt[su].copy()
                qi, ti = nse3.pose_inv(q_l, t_l)
                qd, td = nse3.pose_mul(qi, ti, vq[u], vt[u])
                q_s, t_s = get_pose(opt_q, opt_t, su)
                qn, tn = nse3.pose_mul(q_s, t_s, qd, td)
            else:
                qn, tn = nse3.pose_mul(q_sw, t_sw, vq[u], vt[u])
            opt_q[u] = nse3.quat_normalize(qn)
            opt_t[u] = tn
    return opt_q, opt_t


def test_initial_guess_table_fuzz_vs_literal_port():
    """>=100 random kidnap/loop schedules (3+ worlds, merges, multi-hop
    BFS inference): the vectorized 4-case table must equal the literal
    per-node port bit-for-bit at every trigger."""
    rng = np.random.default_rng(1234)
    n_checked = 0
    for trial in range(60):
        store = GraphStore()
        eng = SolverEngine(store, cfg64())

        orig_guesses = eng._set_initial_guesses

        def checked_guesses(node_len, node_worlds):
            ql, tl = _initial_guesses_literal(eng, node_len, node_worlds)
            orig_guesses(node_len, node_worlds)
            np.testing.assert_array_equal(eng._opt_q[:node_len], ql)
            np.testing.assert_array_equal(eng._opt_t[:node_len], tl)
            nonlocal n_checked
            n_checked += 1

        eng._set_initial_guesses = checked_guesses

        t = T0
        kidnapped = False
        i = 0
        n_target = int(rng.integers(30, 80))
        while i < n_target:
            r = rng.random()
            if r < 0.08 and i > 8 and not kidnapped:
                store.kidnap_indicator(t, "kidnapped")
                kidnapped = True
                t += S
                continue
            if kidnapped and r < 0.5:
                store.kidnap_indicator(t, "unkidnapped")
                kidnapped = False
                t += S
                continue
            yaw = rng.normal() * 0.2
            store.add_node(t, yaw_quat(yaw),
                           [float(i), rng.normal() * 0.2, 0.0])
            if (not kidnapped and r > 0.85 and store.node_len > 10):
                j = int(rng.integers(0, store.node_len - 5))
                store.add_loop_edge(
                    t, store.node_timestamp(j), nse3.quat_identity(),
                    np.asarray(store.node_pose(store.node_len - 1)[1])
                    - np.asarray(store.node_pose(j)[1]), 1.0)
                eng.trigger()
            t += S
            i += 1
    assert n_checked >= 100, n_checked

def test_async_dispatch_pipeline_matches_sync():
    """stream.async_dispatch overlaps trigger N+1's build with solve N.
    After a final drain the pipeline must land at the same solved state as
    the synchronous mode (the one-trigger lag only changes WHEN write_back
    happens, not the final fixed point)."""
    import dataclasses as dc
    from solve_keyframe_pose_graph_tpu.config import StreamConfig

    def run(async_mode):
        store = GraphStore()
        cfg = cfg64()
        cfg = dc.replace(cfg, stream=StreamConfig(async_dispatch=async_mode))
        eng = SolverEngine(store, cfg)
        rng = np.random.default_rng(5)
        for i in range(120):
            store.add_node(T0 + i * S, nse3.quat_identity(),
                           [float(i), rng.normal() * 0.05, 0])
            if i in (50, 80, 110):
                j = i - 40
                store.add_loop_edge(
                    T0 + i * S, T0 + j * S, nse3.quat_identity(),
                    np.asarray(store.node_pose(i)[1])
                    - np.asarray(store.node_pose(j)[1]), 1.0)
                eng.trigger()
        # settle: in async mode the LAST dispatch is still in flight and
        # the state is one solve behind; re-trigger + drain converges it
        eng.drain()
        eng.trigger()      # re-solve with everything collected
        eng.drain()
        return eng

    e_sync = run(False)
    e_async = run(True)
    assert e_async.solved_until == e_sync.solved_until
    # same fixed point (both end with a full solve over identical data)
    np.testing.assert_allclose(
        e_async._opt_t[:e_async.solved_until + 1],
        e_sync._opt_t[:e_sync.solved_until + 1], atol=1e-8)

def test_capacity_ceiling_enforced():
    """CapacityConfig.max_nodes/max_edges are hard ceilings at trigger time
    (the reference's static 30k arrays, PoseGraphSLAM.cpp:17-25)."""
    import dataclasses as dc
    import pytest
    from solve_keyframe_pose_graph_tpu.config import CapacityConfig

    cfg = dc.replace(cfg64(), capacity=CapacityConfig(
        initial_nodes=16, initial_edges=8, max_nodes=32, max_edges=32))
    store = GraphStore()
    eng = SolverEngine(store, cfg)
    for i in range(40):
        store.add_node(T0 + i * S, nse3.quat_identity(), [float(i), 0, 0])
    store.add_loop_edge(T0 + 39 * S, T0, nse3.quat_identity(),
                        [39.0, 0, 0], 1.0)
    with pytest.raises(RuntimeError, match="capacity ceiling"):
        eng.trigger()


def test_background_escalation_serves_fp32_then_lands():
    """stream.background_escalation (default): a distressed trigger returns
    with its fp32 result immediately (stats row marked "pending") and the
    escalated re-solve lands through drain()/the write-back thread — the
    reference's solver loop never blocks the output pipeline
    (PoseGraphSLAM.cpp:1257; Composer extrapolates meanwhile,
    Composer.cpp:113-165). escalate_rejects=0 forces the ladder."""
    store = GraphStore()
    cfg = Config(solver=SolverConfig(dtype="float32", adaptive_fp64=True,
                                     escalate_rejects=0))
    eng = SolverEngine(store, cfg)
    rng = np.random.default_rng(7)
    for i in range(60):
        store.add_node(T0 + i * S, nse3.quat_identity(),
                       [float(i), rng.normal() * 0.05, 0])
    store.add_loop_edge(T0 + 50 * S, T0 + 10 * S, nse3.quat_identity(),
                        np.asarray(store.node_pose(50)[1])
                        - np.asarray(store.node_pose(10)[1]) + 0.1, 1.0)
    assert eng.trigger()
    trig_row = [s for s in eng.solve_stats if "fp64_escalated" in s][-1]
    assert trig_row["fp64_escalated"] == "pending"
    eng.drain()
    rows = [s for s in eng.solve_stats if s.get("background_escalation")]
    assert rows, eng.solve_stats
    last = rows[-1]
    assert "escalation_error" not in last, last
    # forced ladder climbs fully; the full rung lands on the native CPU
    # LDL^T when available (the product default, VERDICT r4 item 3), on
    # the emulated device rung otherwise
    assert last["escalated_rung"] in ("fp64-cpu", "fp64")
    assert last["applied"] is True
    assert np.isfinite(last["final_cost"])
    # the escalated write-back landed in the opt state: a fresh assemble-
    # style read sees finite fp64-rung poses
    assert np.isfinite(eng._opt_t[: store.node_len]).all()


def test_background_escalation_off_is_inline():
    """background_escalation=False restores the round-3 inline behavior:
    the trigger itself pays the re-solve and its stats row records the
    final rung."""
    import dataclasses as dc
    from solve_keyframe_pose_graph_tpu.config import StreamConfig

    store = GraphStore()
    cfg = Config(
        solver=SolverConfig(dtype="float32", adaptive_fp64=True,
                            escalate_rejects=0),
        stream=StreamConfig(background_escalation=False))
    eng = SolverEngine(store, cfg)
    for i in range(40):
        store.add_node(T0 + i * S, nse3.quat_identity(), [float(i), 0, 0])
    store.add_loop_edge(T0 + 30 * S, T0 + 5 * S, nse3.quat_identity(),
                        np.asarray(store.node_pose(30)[1])
                        - np.asarray(store.node_pose(5)[1]) + 0.05, 1.0)
    assert eng.trigger()
    row = [s for s in eng.solve_stats if "fp64_escalated" in s][-1]
    assert row["fp64_escalated"] in ("fp64-cpu", "fp64")
    assert not [s for s in eng.solve_stats
                if s.get("background_escalation")]


def test_engine_dispatches_certified_tiledrows6(monkeypatch):
    """Round-4 VERDICT item 2: under the DEFAULT config the engine must
    dispatch the certified tiledrows6 loop matvec (it used to silently
    downgrade to sorted2 via tile_k=None, so the product never ran the
    certified parity configuration), with the sticky per-bucket tile_k
    that warmup() pre-compiles (gn.tile_k_rule)."""
    from solve_keyframe_pose_graph_tpu.graph import synthetic
    from solve_keyframe_pose_graph_tpu.ops import lm as lm_ops
    from solve_keyframe_pose_graph_tpu.ops.gn import tile_k_rule

    seen = {}
    orig = lm_ops.lm_solve_aot

    def spy(problem, **kw):
        seen.update(kw)
        return orig(problem, **kw)

    monkeypatch.setattr(lm_ops, "lm_solve_aot", spy)

    store = GraphStore()
    eng = SolverEngine(store)        # default Config
    g = synthetic.circle_graph(n_nodes=64, n_loops=8, seed=0)
    for i in range(g.n_nodes):
        store.add_node(T0 + i * S, g.vio_q[i], g.vio_t[i])
    for k in range(g.n_loops):
        a, b = map(int, g.loop_pairs[k])
        store.add_loop_edge_by_index(a, b, g.loop_q[k], g.loop_t[k],
                                     float(g.loop_w[k]))
    assert eng.trigger()
    eng.drain()
    assert seen["loop_impl"] == "tiledrows6"
    cap = eng.config.capacity
    assert seen["tile_k"] == tile_k_rule(cap.initial_nodes,
                                         cap.initial_edges)
    st = eng.solve_stats[-1]
    assert st["final_cost"] <= st["initial_cost"]


def test_sticky_tile_k_bumps_on_concentrated_edges():
    """The sticky tile_k starts at the data-free rule value (what warmup
    compiled) and must DOUBLE when the live edge distribution would
    overflow it (overflow slots silently drop edges), then stay sticky."""
    from solve_keyframe_pose_graph_tpu.ops.gn import tile_k_rule

    eng = SolverEngine(GraphStore())
    n_cap = eng.config.capacity.initial_nodes
    e_cap = eng.config.capacity.initial_edges
    rule = tile_k_rule(n_cap, e_cap)

    # every edge endpoint in dest tile 0: max load = 2 * e_cap > rule
    eb = np.zeros(e_cap, np.int64)
    ea = np.ones(e_cap, np.int64)
    mask = np.ones(e_cap, bool)
    tk = eng._sticky_tile_k(n_cap, e_cap, eb, ea, mask)
    assert tk >= 2 * e_cap > rule
    # sticky: a later sparse trigger keeps the bumped value (no program flap)
    tk2 = eng._sticky_tile_k(n_cap, e_cap, eb[:4], ea[:4], mask[:4])
    assert tk2 == tk


def test_diagnostic_variants_fenced_from_product_config():
    """VERDICT round-4 item 8: known-wrong diagnostic lm_solve variants
    must not be reachable through the product config surface."""
    import dataclasses

    import pytest

    from solve_keyframe_pose_graph_tpu.ops import lm as lm_ops

    for bad in ("tiledng", "sorted2ng", "none"):
        cfg = dataclasses.replace(SolverConfig(), loop_impl=bad)
        with pytest.raises(ValueError, match="diagnostic"):
            lm_ops.cfg_lm_kwargs(cfg)
    cfg = dataclasses.replace(SolverConfig(), preconditioner="identity")
    with pytest.raises(ValueError, match="diagnostic"):
        lm_ops.cfg_lm_kwargs(cfg)


def test_engine_bucket_cover_dispatch(monkeypatch):
    """A trigger whose exact (n_cap, e_cap) bucket has no compiled program
    in this process solves in the smallest compiled COVERING bucket
    (padding is masked — same problem, larger box) instead of paying a
    trigger-time compile stall (measured 28-31 s over the tunnel when the
    10k stream's first loop edge arrived at node 5001: bucket (8192, 256),
    a pair no edge-arrival model pre-compiles)."""
    from solve_keyframe_pose_graph_tpu.graph import synthetic
    from solve_keyframe_pose_graph_tpu.graph.store import GraphStore
    from solve_keyframe_pose_graph_tpu.ops import lm as lm_ops
    from solve_keyframe_pose_graph_tpu.solver.engine import SolverEngine

    store = GraphStore()
    eng = SolverEngine(store)
    # pretend warmup compiled only (2048, 512)
    eng._warmed_buckets.add((2048, 512, "float32"))
    seen = {}
    real = lm_ops.lm_solve_aot

    def spy(problem, **kw):
        seen["n_cap"] = problem.n_cap
        seen["e_cap"] = problem.e_cap
        return real(problem, **kw)

    monkeypatch.setattr(lm_ops, "lm_solve_aot", spy)
    g = synthetic.circle_graph(n_nodes=60, n_loops=8, seed=2)
    t0, dt = 1_000_000_000, 100_000_000
    for i in range(g.n_nodes):
        store.add_node(t0 + i * dt, g.vio_q[i], g.vio_t[i])
    for k in range(g.n_loops):
        a, b = map(int, g.loop_pairs[k])
        store.add_loop_edge(t0 + a * dt, t0 + b * dt,
                            g.loop_q[k], g.loop_t[k], float(g.loop_w[k]))
    assert eng.trigger()
    eng.drain()
    # exact bucket would be (1024, 256); the cover redirected to (2048, 512)
    assert (seen["n_cap"], seen["e_cap"]) == (2048, 512)
    assert eng.solve_stats[-1]["final_cost"] < 1.0
    # the used bucket is now recorded; a second engine pass reuses it
    assert (2048, 512, "float32") in eng._warmed_buckets
