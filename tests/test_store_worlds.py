"""GraphStore + WorldRegistry semantics tests: timeline->world mapping,
kidnap state machine, disjoint-set merge rules, BFS pose inference, JSON
round-trips. These pin the behaviors of NodeDataManager/Worlds that the
solver's re-basing logic depends on."""

import numpy as np
import pytest

from solve_keyframe_pose_graph_tpu.graph.store import GraphStore
from solve_keyframe_pose_graph_tpu.graph.worlds import DisjointSet, WorldRegistry
from solve_keyframe_pose_graph_tpu.utils import nse3

S = 1_000_000_000  # 1 second in ns
T0 = 100 * S       # epoch offset: real stamps are never near 0, and the
                   # reference's timeline scan assumes t > 0
                   # (NodeDataManager.cpp:1160 "prev = ros::Time()")


def make_store_with_kidnaps():
    """nodes at t=100..110 s; kidnap (102.5 - 104.5) and (106.5 - 108.5):
    worlds: 0, 1, 2; dead zones negative."""
    g = GraphStore()
    for i in range(3):          # t = 100, 101, 102 -> world 0
        g.add_node(T0 + i * S, nse3.quat_identity(), [i, 0, 0])
    g.mark_as_kidnapped(T0 + int(2.5 * S))
    g.mark_as_unkidnapped(T0 + int(4.5 * S))
    for i in range(5, 7):       # t = 105, 106 -> world 1
        g.add_node(T0 + i * S, nse3.quat_identity(), [i, 0, 0])
    g.mark_as_kidnapped(T0 + int(6.5 * S))
    g.mark_as_unkidnapped(T0 + int(8.5 * S))
    for i in range(9, 11):      # t = 109, 110 -> world 2
        g.add_node(T0 + i * S, nse3.quat_identity(), [i, 0, 0])
    return g


def test_which_world_mapping():
    g = make_store_with_kidnaps()
    assert g.which_world_is_this(T0 + 1 * S) == 0
    assert g.which_world_is_this(T0 + 3 * S) == -1    # first dead zone
    assert g.which_world_is_this(T0 + 5 * S) == 1
    assert g.which_world_is_this(T0 + 7 * S) == -2    # second dead zone
    assert g.which_world_is_this(T0 + 9 * S) == 2
    assert g.n_worlds() == 3
    assert g.n_kidnaps() == 2
    assert g.node_worlds().tolist() == [0, 0, 0, 1, 1, 2, 2]


def test_world_start_end_indices():
    g = make_store_with_kidnaps()
    assert g.nodeidx_of_world_i_started(0) == 0
    assert g.nodeidx_of_world_i_started(1) == 3
    assert g.nodeidx_of_world_i_started(2) == 5
    assert g.nodeidx_of_world_i_ended(2) == g.node_len - 1
    assert g.nodeidx_of_world_i_started(-1) == -3


def test_kidnap_state_machine_asserts():
    g = GraphStore()
    g.add_node(0, nse3.quat_identity(), [0, 0, 0])
    with pytest.raises(AssertionError):
        g.mark_as_unkidnapped(1 * S)          # not kidnapped yet
    g.mark_as_kidnapped(1 * S)
    with pytest.raises(AssertionError):
        g.mark_as_kidnapped(2 * S)            # already kidnapped
    with pytest.raises(ValueError):
        g.kidnap_indicator(3 * S, "bogus")


def test_timestamp_matching_tolerance():
    g = GraphStore()
    g.add_node(1_000_000_000, nse3.quat_identity(), [0, 0, 0])
    g.add_node(2_000_000_000, nse3.quat_identity(), [1, 0, 0])
    # within 1 ms
    assert g.find_indexof_node(1_000_900_000) == 0
    assert g.find_indexof_node(1_999_100_001) == 1
    # outside 1 ms
    assert g.find_indexof_node(1_500_000_000) == -1
    # unmatched loop edge is skipped, not fatal
    assert g.add_loop_edge(1_500_000_000, 2_000_000_000,
                           nse3.quat_identity(), [0, 0, 0], 1.0) is None


def test_disjoint_set_millipede_rank_semantics():
    """union_sets(max, min) usually keeps the earliest world as root, but
    the rank rules can pick a different root in pathological orders — the
    reference depends on those exact rules."""
    ds = DisjointSet()
    for i in range(4):
        ds.add_element(i)
    ds.union_sets(1, 0)
    assert ds.find_set(1) == 0
    ds.union_sets(2, 0)
    assert ds.find_set(2) == 0
    # pathological order: 3-2 merge first, then 2-0: rank rule keeps 2
    ds2 = DisjointSet()
    for i in range(4):
        ds2.add_element(i)
    ds2.union_sets(3, 2)
    assert ds2.find_set(3) == 2
    ds2.union_sets(2, 0)
    assert ds2.find_set(0) == 2     # NOT 0: rank(2)=1 > rank(0)=0
    assert ds2.set_count() == 2


def test_world_registry_rel_pose_and_bfs_inference(rng):
    w = WorldRegistry()
    for i in range(3):
        w.world_starts(i * S)
        if i < 2:
            w.world_ends(int((i + 0.5) * S))

    def rand_pose():
        q = rng.normal(size=4); q /= np.linalg.norm(q)
        return q, rng.normal(size=3)

    q10, t10 = rand_pose()
    q21, t21 = rand_pose()
    w.set_pose_between_worlds(1, 0, q10, t10, "edge A")
    w.set_pose_between_worlds(2, 1, q21, t21, "edge B")
    assert w.n_sets() == 1
    assert w.is_exist(2, 0)

    # BFS inference: 2_T_0 = 2_T_1 * 1_T_0
    q20, t20 = w.get_pose_between_worlds(2, 0)
    q_ref, t_ref = nse3.pose_mul(q21, t21, q10, t10)
    sign = np.sign(np.dot(q20, q_ref))
    np.testing.assert_allclose(q20, sign * q_ref, atol=1e-12)
    np.testing.assert_allclose(t20, t_ref, atol=1e-12)
    # inverse lookup
    q02, t02 = w.get_pose_between_worlds(0, 2)
    qi, ti = nse3.pose_inv(q20, t20)
    sign = np.sign(np.dot(q02, qi))
    np.testing.assert_allclose(q02, sign * qi, atol=1e-12)
    np.testing.assert_allclose(t02, ti, atol=1e-12)


def test_world_registry_oplog_roundtrip(rng):
    w = WorldRegistry()
    for i in range(3):
        w.world_starts(i * S)
        if i < 2:
            w.world_ends(int((i + 0.5) * S))
    q = rng.normal(size=4); q /= np.linalg.norm(q)
    w.set_pose_between_worlds(1, 0, q, [1.0, 2.0, 3.0], "x")

    w2 = WorldRegistry.from_json(w.to_json())
    assert w2.n_worlds() == 3
    assert w2.n_sets() == 2
    assert w2.find_setID_of_world_i(1) == w.find_setID_of_world_i(1)
    assert w2.disjoint_set_status() == w.disjoint_set_status()
    q2, t2 = w2.get_pose_between_worlds(1, 0)
    sign = np.sign(np.dot(q2, q))
    np.testing.assert_allclose(q2, sign * np.asarray(q), atol=1e-12)


def test_graphstore_json_roundtrip(tmp_path, rng):
    g = make_store_with_kidnaps()
    # add loop edges: within world 0 and across worlds
    q = rng.normal(size=4); q /= np.linalg.norm(q)
    g.add_loop_edge(g.node_timestamp(2), g.node_timestamp(0), q, [0.1, 0.2, 0.3], 0.8, "intra")
    g.add_loop_edge(g.node_timestamp(5), g.node_timestamp(1), q, [1, 2, 3], 0.9, "inter")

    p = str(tmp_path / "log_posegraph.json")
    g.save_as_json(p)
    g2 = GraphStore.load_from_json(p)

    assert g2.node_len == g.node_len
    assert g2.edge_len == g.edge_len
    assert g2.node_worlds().tolist() == g.node_worlds().tolist()
    assert g2.kidnap_starts == g.kidnap_starts
    assert g2.kidnap_ends == g.kidnap_ends
    qa, ta = g.node_pose(3)
    qb, tb = g2.node_pose(3)
    np.testing.assert_allclose(tb, ta, atol=1e-12)
    ea = g.edge_pose(1)
    eb = g2.edge_pose(1)
    np.testing.assert_allclose(eb[1], ea[1], atol=1e-12)
    assert g2.edge_description(1) == "inter"

    # edge-mask ablation on load
    g3 = GraphStore.load_from_json(p, edge_mask=[True, False])
    assert g3.edge_mask == [True, False]

def test_node_worlds_vectorized_matches_scalar():
    """The searchsorted node_worlds must agree element-wise with the scalar
    which_world_is_this branch structure on random kidnap schedules,
    including the single-kidnap boundary quirks."""
    rng = np.random.default_rng(7)
    for trial in range(30):
        g = GraphStore()
        t = T0
        n_events = int(rng.integers(0, 6))
        kidnapped = False
        first = True
        for _ in range(40):
            choice = rng.random()
            if choice < 0.15 and n_events > 0 and not first:
                n_events -= 1
                if kidnapped:
                    g.mark_as_unkidnapped(t)
                else:
                    g.mark_as_kidnapped(t)
                kidnapped = not kidnapped
            else:
                g.add_node(t, nse3.quat_identity(), [0, 0, 0])
                first = False
            t += int(rng.integers(1, 3)) * S
        expect = [g.which_world_is_this(int(ts))
                  for ts in g.node_arrays()[0]]
        assert g.node_worlds().tolist() == expect


def test_node_worlds_single_kidnap_boundary_quirk():
    """nks == 1: t == ks[0] is a dead zone (the reference's inclusive
    boundary in that branch, NodeDataManager.cpp:1136-1146)."""
    g = GraphStore()
    g.add_node(T0, nse3.quat_identity(), [0, 0, 0])
    g.add_node(T0 + 2 * S, nse3.quat_identity(), [0, 0, 0])  # == kidnap start
    g.add_node(T0 + 3 * S, nse3.quat_identity(), [0, 0, 0])
    g.mark_as_kidnapped(T0 + 2 * S)
    assert g.which_world_is_this(T0 + 2 * S) == -1
    assert g.node_worlds().tolist() == [0, -1, -1]
    g.mark_as_unkidnapped(T0 + 4 * S)
    g.add_node(T0 + 5 * S, nse3.quat_identity(), [0, 0, 0])
    assert g.which_world_is_this(T0 + 2 * S) == -1
    assert g.node_worlds().tolist() == [0, -1, -1, 1]


def test_json_roundtrip_preserves_covariance(tmp_path):
    g = GraphStore()
    rng = np.random.default_rng(3)
    for i in range(4):
        A = rng.normal(size=(6, 6))
        g.add_node(T0 + i * S, nse3.quat_identity(), [i, 0, 0], A @ A.T)
    p = str(tmp_path / "g.json")
    g.save_as_json(p)
    g2 = GraphStore.load_from_json(p)
    for i in range(4):
        np.testing.assert_allclose(g2.node_cov(i), g.node_cov(i), rtol=1e-12)


def test_loop_edge_index_bounds_checked():
    g = GraphStore()
    for i in range(3):
        g.add_node(T0 + i * S, nse3.quat_identity(), [i, 0, 0])
    assert g.add_loop_edge_by_index(0, 5, nse3.quat_identity(),
                                    [0, 0, 0], 1.0) is None
    assert g.add_loop_edge_by_index(-1, 1, nse3.quat_identity(),
                                    [0, 0, 0], 1.0) is None
    assert g.add_loop_edge_by_index(2, 0, nse3.quat_identity(),
                                    [0, 0, 0], 1.0) == 0
