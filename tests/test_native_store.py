"""Native (C++) GraphStore parity vs the pure-numpy reference implementation."""

import json

import numpy as np
import pytest

from solve_keyframe_pose_graph_tpu.graph.store import GraphStore

native = pytest.importorskip(
    "solve_keyframe_pose_graph_tpu.graph.native")

if native.load_library() is None:
    pytest.skip("native core not built", allow_module_level=True)


def _random_quat(rng):
    v = rng.normal(size=4)
    return v / np.linalg.norm(v)


def _drive(store, rng):
    """Feed a deterministic op sequence incl. kidnaps and edges."""
    t0 = 1_000_000_000
    dt = 50_000_000
    n_added = 0
    for i in range(300):
        ts = t0 + i * dt
        r = rng.uniform()
        if r < 0.04 and not store.current_kidnap_status and n_added > 2:
            store.kidnap_indicator(ts - dt // 2, "kidnapped")
        elif store.current_kidnap_status and r < 0.5:
            store.kidnap_indicator(ts - dt // 3, "unkidnapped")
        store.add_node(ts, _random_quat(rng), rng.normal(size=3))
        n_added += 1
        if n_added > 10 and rng.uniform() < 0.2:
            a = int(rng.integers(0, n_added))
            b = int(rng.integers(0, n_added))
            store.add_loop_edge(t0 + a * dt, t0 + b * dt,
                                _random_quat(rng), rng.normal(size=3),
                                float(rng.uniform(0.1, 1.0)), f"e{a}-{b}")
    return store


@pytest.fixture(scope="module")
def pair():
    s_py = _drive(GraphStore(), np.random.default_rng(123))
    s_nat = _drive(native.NativeGraphStore(), np.random.default_rng(123))
    return s_py, s_nat


def test_lengths_and_arrays(pair):
    s_py, s_nat = pair
    assert s_nat.node_len == s_py.node_len
    assert s_nat.edge_len == s_py.edge_len
    ts_p, q_p, t_p = s_py.node_arrays()
    ts_n, q_n, t_n = s_nat.node_arrays()
    np.testing.assert_array_equal(ts_n, ts_p)
    np.testing.assert_allclose(q_n, q_p, atol=1e-15)
    np.testing.assert_allclose(t_n, t_p, atol=1e-15)
    ea_p = s_py.edge_arrays()
    ea_n = s_nat.edge_arrays()
    for a, b in zip(ea_n, ea_p):
        np.testing.assert_allclose(np.asarray(a, float),
                                   np.asarray(b, float), atol=1e-15)


def test_kidnap_and_worlds(pair):
    s_py, s_nat = pair
    assert s_nat.kidnap_starts == s_py.kidnap_starts
    assert s_nat.kidnap_ends == s_py.kidnap_ends
    assert s_nat.current_kidnap_status == s_py.current_kidnap_status
    assert s_nat.n_worlds() == s_py.n_worlds()
    np.testing.assert_array_equal(s_nat.node_worlds(), s_py.node_worlds())
    # dense timestamp sweep across the whole timeline incl. boundaries
    lo = s_py.node_timestamp(0) - 10
    hi = s_py.node_timestamp(s_py.node_len - 1) + 10
    for t in np.linspace(lo, hi, 2000).astype(np.int64):
        assert s_nat.which_world_is_this(int(t)) == \
            s_py.which_world_is_this(int(t)), int(t)
    for k in s_py.kidnap_starts + s_py.kidnap_ends:
        for d in (-1, 0, 1):
            assert s_nat.which_world_is_this(k + d) == \
                s_py.which_world_is_this(k + d), (k, d)


def test_find_indexof_node(pair):
    s_py, s_nat = pair
    rng = np.random.default_rng(7)
    for _ in range(500):
        t = int(rng.integers(900_000_000, 17_000_000_000))
        assert s_nat.find_indexof_node(t) == s_py.find_indexof_node(t), t
    # tolerance edge: within 1ms matches, outside does not
    ts0 = s_py.node_timestamp(5)
    assert s_nat.find_indexof_node(ts0 + 999_999) == 5
    assert s_nat.find_indexof_node(ts0 + 1_000_000) in (-1, 6)


def test_json_roundtrip_parity(pair, tmp_path):
    s_py, s_nat = pair
    p1 = str(tmp_path / "py.json")
    p2 = str(tmp_path / "nat.json")
    s_py.save_as_json(p1)
    s_nat.save_as_json(p2)
    assert json.load(open(p1)) == json.load(open(p2))
    back = GraphStore.load_from_json(p2)
    assert back.node_len == s_py.node_len
    assert back.edge_len == s_py.edge_len


def test_monotonic_rejected():
    s = native.NativeGraphStore()
    s.add_node(10**9, [0, 0, 0, 1], [0, 0, 0])
    with pytest.raises(AssertionError):
        s.add_node(10**9 - 5_000_000, [0, 0, 0, 1], [0, 0, 0])


def test_engine_runs_on_native_store():
    """The streaming engine + composer consume the native store unchanged."""
    from solve_keyframe_pose_graph_tpu.compose.composer import Composer
    from solve_keyframe_pose_graph_tpu.graph import synthetic
    from solve_keyframe_pose_graph_tpu.solver.engine import SolverEngine

    g = synthetic.circle_graph(n_nodes=120, n_loops=15, seed=3)
    store = native.NativeGraphStore()
    t0 = 1_000_000_000
    for i in range(g.n_nodes):
        store.add_node(t0 + i * 100_000_000, g.vio_q[i], g.vio_t[i])
    for e in range(g.n_loops):
        a, b = g.loop_pairs[e]
        store.add_loop_edge(t0 + int(a) * 100_000_000,
                            t0 + int(b) * 100_000_000,
                            g.loop_q[e], g.loop_t[e], float(g.loop_w[e]))
    eng = SolverEngine(store)
    assert eng.trigger()
    assert eng.solved_until == g.n_nodes - 1
    comp = Composer(store, eng).assemble()
    assert len(comp.t) == g.n_nodes


def test_hard_capacity_enforced():
    s = native.NativeGraphStore(initial_capacity=4, max_capacity=16)
    base = s._ts.ctypes.data if s.node_len else None
    for i in range(16):
        s.add_node(10**9 + i * 10**6, [0, 0, 0, 1], [0, 0, 0])
    # buffer never moved (views stay valid)
    assert s._ts.ctypes.data == s._ts.ctypes.data
    with pytest.raises(RuntimeError):
        s.add_node(10**9 + 17 * 10**6, [0, 0, 0, 1], [0, 0, 0])
    for e in range(16):
        s.add_loop_edge_by_index(0, 1, [0, 0, 0, 1], [0, 0, 0], 1.0)
    with pytest.raises(RuntimeError):
        s.add_loop_edge_by_index(0, 1, [0, 0, 0, 1], [0, 0, 0], 1.0)
