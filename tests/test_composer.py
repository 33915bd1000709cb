"""Composer tests: two-regime assembly (solved prefix + extrapolated
suffix), dead-zone chaining, 200 Hz imu propagate, and checkpoint
save/load round-trip with the reference's solved_posegraph.json schema."""

import numpy as np

from solve_keyframe_pose_graph_tpu.compose.composer import Composer
from solve_keyframe_pose_graph_tpu.config import Config, SolverConfig
from solve_keyframe_pose_graph_tpu.graph.store import GraphStore
from solve_keyframe_pose_graph_tpu.solver.engine import SolverEngine
from solve_keyframe_pose_graph_tpu.utils import nse3

S = 1_000_000_000
T0 = 1000 * S


def cfg64():
    return Config(solver=SolverConfig(dtype="float64"))


def build_session(n=60, loop_at=40):
    store = GraphStore()
    eng = SolverEngine(store, cfg64())
    rng = np.random.default_rng(1)
    drift = np.cumsum(rng.normal(scale=0.01, size=(n, 3)), axis=0)
    for i in range(n):
        store.add_node(T0 + i * S, nse3.quat_identity(),
                       np.array([float(i), 0, 0]) + drift[i])
        if i == loop_at:
            store.add_loop_edge(
                store.node_timestamp(i), store.node_timestamp(i - 30),
                nse3.quat_identity(), [30.0, 0, 0], 1.0)
            eng.trigger()
    return store, eng


def test_assembly_solved_prefix_and_extrapolated_suffix():
    store, eng = build_session()
    comp = Composer(store, eng).assemble()
    assert comp is not None
    n = store.node_len
    su = eng.solved_until
    assert su == 40
    # prefix: solver poses; suffix: watermark extrapolation from su
    for i in (su + 1, n - 1):
        # suffix pose = opt(su) * (vio(su)^-1 vio(i))
        q_s, t_s = eng.get_node_pose(su)
        ql, tl = store.node_pose(su)
        qi_, ti_ = store.node_pose(i)
        qinv, tinv = nse3.pose_inv(ql, tl)
        qd, td = nse3.pose_mul(qinv, tinv, qi_, ti_)
        qe, te = nse3.pose_mul(q_s, t_s, qd, td)
        np.testing.assert_allclose(comp.t[i], te, atol=1e-9)
    assert comp.latest_pose_worldid == 0
    assert list(comp.per_world.keys()) == [0]


def test_assembly_dead_zone_chaining():
    store, eng = build_session()
    # kidnap with garbage dead-zone nodes
    store.kidnap_indicator(T0 + int(60.5 * S), "kidnapped")
    for k in range(3):
        store.add_node(T0 + int((61 + k) * S), nse3.quat_identity(),
                       [500.0 + k * 2, 100, 0])
    comp = Composer(store, eng).assemble()
    # dead-zone nodes are chained from the last world-0 pose by odometry
    # deltas: delta between garbage nodes is preserved, absolute is not
    n0_last = 59
    d_garbage = comp.t[n0_last + 2] - comp.t[n0_last + 1]
    # the delta is rotated by the last corrected world-0 orientation, which
    # the solver tilts slightly to absorb translation drift
    np.testing.assert_allclose(d_garbage, [2.0, 0, 0], atol=2e-2)
    assert -1 in comp.per_world


def test_imu_propagate_compose():
    store, eng = build_session()
    store.set_extrinsic(nse3.quat_identity(), [0.1, 0.0, 0.05])  # imu_T_cam
    cmp_ = Composer(store, eng)
    cmp_.assemble()
    # imu at the last node's pose (identity rotations): w_T_imu =
    # w_T_cam * cam_T_imu
    idx, q_cam, t_cam, _ = cmp_.last_known_camerapose()
    q_n, t_n = store.node_pose(idx)
    q_ci, t_ci = nse3.pose_inv(store.imu_T_cam_q, store.imu_T_cam_t)
    q_imu, t_imu = nse3.pose_mul(q_n, t_n, q_ci, t_ci)
    out = cmp_.imu_propagate(q_imu, t_imu)
    assert out is not None
    q_out, t_out = out
    # relative delta is identity -> composed pose = corrected cam * cam_T_imu
    q_exp, t_exp = nse3.pose_mul(q_cam, t_cam, q_ci, t_ci)
    np.testing.assert_allclose(t_out, t_exp, atol=1e-9)


def test_checkpoint_roundtrip(tmp_path):
    store, eng = build_session()
    cmp_ = Composer(store, eng)
    path = cmp_.save_state_to_disk(str(tmp_path))
    assert path.endswith("solved_posegraph.json")
    # save forces end-of-world (Composer.cpp:969-975)
    assert store.current_kidnap_status

    # fresh session restores
    store2 = GraphStore()
    eng2 = SolverEngine(store2, cfg64())
    cmp2 = Composer(store2, eng2)
    assert cmp2.load_state_from_disk(str(tmp_path))

    assert store2.node_len == store.node_len
    assert eng2.solved_until == store.node_len - 1
    # restored poses are frozen and match the saved corrected trajectory
    comp_saved = cmp_.latest
    for i in (0, 20, 50):
        q2, t2 = eng2.get_node_pose(i)
        np.testing.assert_allclose(t2, comp_saved.t[i], atol=1e-9)
    assert eng2._opt_frozen[: store2.node_len].all()

    # live session continues: new world starts on next pose
    store2.mark_as_unkidnapped_and_signal_start_of_world(
        store.node_timestamp(store.node_len - 1) + 10 * S
    )
    i_new = store2.add_node(
        store.node_timestamp(store.node_len - 1) + 11 * S,
        nse3.quat_identity(), [0, 0, 0],
    )
    assert store2.which_world_is_this(store2.node_timestamp(i_new)) == 1
    # a loop edge against the frozen map merges world 1 into set 0 and the
    # frozen nodes must NOT move
    frozen_before = eng2._opt_t[:10].copy()
    qe, te_ = nse3.pose_inv(*store2.node_pose(30))
    q_rel, t_rel = nse3.pose_mul(qe, te_, *store2.node_pose(i_new))
    store2.add_loop_edge(store2.node_timestamp(i_new),
                         store2.node_timestamp(30), q_rel, t_rel, 1.0)
    assert eng2.trigger()
    assert store2.worlds.find_setID_of_world_i(1) == 0
    np.testing.assert_allclose(eng2._opt_t[:10], frozen_before, atol=0)

def _assert_comp_equal(a, b):
    np.testing.assert_array_equal(a.world_of, b.world_of)
    np.testing.assert_allclose(a.q, b.q, rtol=0, atol=1e-12)
    np.testing.assert_allclose(a.t, b.t, rtol=0, atol=1e-12)
    assert a.per_world == b.per_world
    assert a.latest_pose_worldid == b.latest_pose_worldid
    assert a.solved_until == b.solved_until


def test_vectorized_assembly_matches_reference_loop():
    """The batched assembly must agree with the literal per-node
    transcription of Composer.cpp:10-263 across every regime: solved
    prefix, watermark extrapolation, other-world suffix, dead zones,
    set-frame re-basing after merges."""
    # scenario A: single world, solved prefix + suffix
    store, eng = build_session()
    cmp_ = Composer(store, eng)
    _assert_comp_equal(cmp_._assemble_vectorized(), cmp_._assemble_loop())

    # scenario B: + dead zone
    store.kidnap_indicator(T0 + int(60.5 * S), "kidnapped")
    for k in range(3):
        store.add_node(T0 + int((61 + k) * S), nse3.quat_identity(),
                       [500.0 + k * 2, 100, 0])
    _assert_comp_equal(cmp_._assemble_vectorized(), cmp_._assemble_loop())

    # scenario C: second world + inter-world merge (re-basing active)
    store.kidnap_indicator(T0 + int(64.5 * S), "unkidnapped")
    for k in range(12):
        store.add_node(T0 + int((65 + k) * S), nse3.quat_identity(),
                       [float(30 + k), 1.0, 0])
    store.add_loop_edge(T0 + int(68 * S), T0 + int(33 * S),
                        nse3.quat_identity(), [0.2, 0.1, 0], 1.0)
    eng.trigger()
    _assert_comp_equal(cmp_._assemble_vectorized(), cmp_._assemble_loop())

    # scenario D: more nodes after the solve (suffix in world 1 != world of
    # new watermark? also exercises per-world bookkeeping with 3 keys)
    for k in range(5):
        store.add_node(T0 + int((80 + k) * S), nse3.quat_identity(),
                       [float(45 + k), 1.0, 0])
    _assert_comp_equal(cmp_._assemble_vectorized(), cmp_._assemble_loop())


def test_random_schedule_assembly_parity():
    """Fuzz: random kidnap/loop schedules, vectorized == loop."""
    rng = np.random.default_rng(42)
    for trial in range(8):
        store = GraphStore()
        eng = SolverEngine(store, cfg64())
        cmp_ = Composer(store, eng)
        t = T0
        kidnapped = False
        i = 0
        n_target = int(rng.integers(40, 90))
        while i < n_target:
            r = rng.random()
            if r < 0.06 and i > 10:
                if kidnapped:
                    store.kidnap_indicator(t, "unkidnapped")
                else:
                    store.kidnap_indicator(t, "kidnapped")
                kidnapped = not kidnapped
                t += S
                continue
            store.add_node(t, nse3.quat_identity(),
                           [float(i), rng.normal() * 0.1, 0])
            if (not kidnapped and r > 0.9 and i > 15
                    and store.node_len > 12):
                j = int(rng.integers(0, store.node_len - 10))
                store.add_loop_edge(
                    t, store.node_timestamp(j), nse3.quat_identity(),
                    np.asarray(store.node_pose(store.node_len - 1)[1])
                    - np.asarray(store.node_pose(j)[1]),
                    1.0)
                eng.trigger()
            t += S
            i += 1
        if store.node_len:
            _assert_comp_equal(cmp_._assemble_vectorized(),
                               cmp_._assemble_loop())


def test_vectorized_assembly_scales():
    """30k nodes assemble fast (the reference runs this at 30 Hz in C++;
    the old per-node Python loop took seconds at this size)."""
    import time
    store = GraphStore(initial_capacity=30000)
    eng = SolverEngine(store, cfg64())
    for i in range(30000):
        store.add_node(T0 + i * S, nse3.quat_identity(), [float(i), 0, 0])
    cmp_ = Composer(store, eng)
    t0 = time.perf_counter()
    comp = cmp_.assemble()
    wall = time.perf_counter() - t0
    assert comp is not None and len(comp.t) == 30000
    assert wall < 1.0, f"assembly took {wall:.2f}s at 30k nodes"
