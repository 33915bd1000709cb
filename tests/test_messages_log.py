"""Wire-format messages, tape replay, and logging utilities."""

import numpy as np

from solve_keyframe_pose_graph_tpu.graph import messages as msgs
from solve_keyframe_pose_graph_tpu.graph.store import GraphStore
from solve_keyframe_pose_graph_tpu.utils.log import (
    ColorFormatter, StatusPrinter, get_logger,
)


def _tape():
    q = np.array([0, 0, 0, 1.0])
    tape = [msgs.NodePoseMsg(10**9 + i * 10**8, q, np.ones(3) * i,
                             cov=np.eye(6) * 0.1 if i == 0 else None)
            for i in range(6)]
    tape.insert(4, msgs.KidnapIndicatorMsg(10**9 + 35 * 10**7, "kidnapped"))
    tape.insert(5, msgs.KidnapIndicatorMsg(10**9 + 37 * 10**7, "unkidnapped"))
    tape.append(msgs.LoopEdgeMsg(10**9, 10**9 + 5 * 10**8, q, np.zeros(3),
                                 0.9, "loop"))
    tape.append(msgs.ExtrinsicMsg(10**9, q, np.array([0.1, 0.0, 0.0])))
    return tape


def test_tape_roundtrip(tmp_path):
    tape = _tape()
    p = str(tmp_path / "tape.jsonl")
    msgs.save_tape(p, tape)
    back = msgs.load_tape(p)
    assert len(back) == len(tape)
    assert [m.kind for m in back] == [m.kind for m in tape]

    s1, s2 = GraphStore(), GraphStore()
    msgs.replay_tape(tape, s1)
    msgs.replay_tape(back, s2)
    assert s1.node_len == s2.node_len == 6
    assert s1.edge_len == s2.edge_len == 1
    assert s1.n_kidnaps() == s2.n_kidnaps() == 1
    np.testing.assert_allclose(s1.node_cov(0), np.eye(6) * 0.1)
    np.testing.assert_allclose(s2.node_cov(0), np.eye(6) * 0.1)
    np.testing.assert_allclose(s2.imu_T_cam_t, [0.1, 0.0, 0.0])
    assert s1.node_worlds().tolist() == s2.node_worlds().tolist()


def test_loopedge_msg_matches_store_convention():
    """LoopEdgeMsg(timestamp0, timestamp1, pose_1T0) must land as store edge
    (a=idx(t0), b=idx(t1)) with measurement b_T_a (msg/LoopEdge.msg
    semantics: pose of 0 as observed from 1)."""
    q = np.array([0.1, 0.2, 0.3, 0.9]); q /= np.linalg.norm(q)
    t = np.array([1.0, 2.0, 3.0])
    store = GraphStore()
    for i in range(4):
        store.add_node(10**9 + i * 10**8, [0, 0, 0, 1], np.zeros(3))
    msgs.LoopEdgeMsg(10**9, 10**9 + 3 * 10**8, q, t, 0.5).apply(store)
    a, b = store.edge_idx_info(0)
    assert (a, b) == (0, 3)
    eq, et = store.edge_pose(0)
    np.testing.assert_allclose(eq, q, atol=1e-12)
    np.testing.assert_allclose(et, t, atol=1e-12)


def test_logger_and_status(capsys):
    logger = get_logger("kpg-test")
    fmt = ColorFormatter()
    import logging
    rec = logging.LogRecord("x", logging.WARNING, "f", 1, "hello", (), None)
    assert "hello" in fmt.format(rec)

    store = GraphStore()
    store.add_node(10**9, [0, 0, 0, 1], np.zeros(3))

    class Eng:
        status = 2
        solved_until = 0
        trigger_id = 3
        n_solve_convergences = 1

    sp = StatusPrinter(store, Eng(), logger=logger)
    line = sp.line()
    assert "nodes=1" in line and "solver=solving" in line
    sp.tick(force=True)


def test_worlds_status_image(tmp_path):
    from solve_keyframe_pose_graph_tpu.compose.vizsink import (
        render_worlds_status_image, write_ppm,
    )
    from solve_keyframe_pose_graph_tpu.graph.worlds import WorldRegistry

    w = WorldRegistry()
    w.world_starts(10**9)
    w.world_ends(2 * 10**9)
    w.world_starts(3 * 10**9)
    w.world_ends(4 * 10**9)
    w.world_starts(5 * 10**9)
    w.set_pose_between_worlds(1, 0, np.array([0, 0, 0, 1.0]), np.zeros(3), "")
    img = render_worlds_status_image(w)
    assert img.shape == (48, 48 * 3, 3) and img.dtype == np.uint8
    # worlds 0 and 1 merged -> same fill color; world 2 differs
    c0 = img[24, 24]; c1 = img[24, 48 + 24]; c2 = img[24, 96 + 24]
    assert (c0 == c1).all()
    assert not (c0 == c2).all()
    p = str(tmp_path / "s.ppm")
    write_ppm(p, img)
    raw = open(p, "rb").read()
    assert raw.startswith(b"P6\n144 48\n255\n")
    assert len(raw) == len(b"P6\n144 48\n255\n") + 144 * 48 * 3
