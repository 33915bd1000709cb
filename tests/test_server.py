"""Live ingest server: socket JSONL in, solves + queries out."""

import json
import socket
import threading
import time

import numpy as np

from solve_keyframe_pose_graph_tpu.graph import messages as msgs
from solve_keyframe_pose_graph_tpu.graph import synthetic
from solve_keyframe_pose_graph_tpu.graph.store import GraphStore
from solve_keyframe_pose_graph_tpu.runtime_server import PoseGraphServer


def test_server_end_to_end(tmp_path):
    store = GraphStore()
    save_dir = str(tmp_path / "ckpt")
    server = PoseGraphServer(store, save_dir=save_dir)
    sock_path = str(tmp_path / "kpg.sock")

    th = threading.Thread(target=server.serve,
                          kwargs=dict(socket_path=sock_path, poll_hz=50.0),
                          daemon=True)
    th.start()
    for _ in range(100):
        time.sleep(0.05)
        try:
            probe = socket.socket(socket.AF_UNIX)
            probe.connect(sock_path)
            probe.close()
            break
        except OSError:
            continue

    g = synthetic.circle_graph(n_nodes=150, n_loops=20, seed=2)
    t0 = 1_000_000_000
    dtn = 100_000_000

    client = socket.socket(socket.AF_UNIX)
    client.connect(sock_path)
    f = client.makefile("rw")

    for i in range(g.n_nodes):
        f.write(json.dumps(
            msgs.NodePoseMsg(t0 + i * dtn, g.vio_q[i], g.vio_t[i]).to_json())
            + "\n")
    for e in range(g.n_loops):
        a, b = map(int, g.loop_pairs[e])
        f.write(json.dumps(msgs.LoopEdgeMsg(
            t0 + a * dtn, t0 + b * dtn, g.loop_q[e], g.loop_t[e],
            float(g.loop_w[e])).to_json()) + "\n")
    f.flush()

    # wait until the solver catches up
    deadline = time.time() + 240
    solved = -1
    while time.time() < deadline:
        f.write(json.dumps({"kind": "query", "what": "status"}) + "\n")
        f.flush()
        st = json.loads(f.readline())
        solved = st["solved_until"]
        if st["nodes"] == g.n_nodes and solved == g.n_nodes - 1:
            break
        time.sleep(0.25)
    assert solved == g.n_nodes - 1, solved

    f.write(json.dumps({"kind": "query", "what": "trajectory"}) + "\n")
    f.flush()
    traj = json.loads(f.readline())
    assert traj["n"] == g.n_nodes
    assert len(traj["t"]) == g.n_nodes

    f.write(json.dumps({"kind": "query", "what": "pose"}) + "\n")
    f.flush()
    pose = json.loads(f.readline())
    assert pose["ok"] and len(pose["t"]) == 3

    # 200 Hz imu-propagate serving path: set the extrinsic, stream imu
    # poses, get corrected world-frame poses back WITHOUT any solve in
    # between (the reference's hz200/* publishers, Composer.cpp:820-943)
    from solve_keyframe_pose_graph_tpu.utils import nse3
    q_ic = nse3.quat_normalize(np.asarray([0.0, 0.0, 0.1, 1.0]))
    t_ic = np.asarray([0.05, 0.0, 0.02])
    f.write(json.dumps(msgs.ExtrinsicMsg(
        t0, q_ic, t_ic).to_json()) + "\n")
    f.flush()
    time.sleep(0.2)   # let the assembler thread tick once more
    n_triggers_before = None
    f.write(json.dumps({"kind": "query", "what": "status"}) + "\n")
    f.flush()
    n_triggers_before = json.loads(f.readline())["triggers"]
    replies = []
    for k in range(5):
        q_imu = nse3.quat_identity()
        t_imu = np.asarray([float(k), 0.0, 0.0])
        f.write(json.dumps(msgs.ImuPropagateMsg(
            t0 + (200 + k) * dtn, q_imu, t_imu).to_json()) + "\n")
        f.flush()
        replies.append(json.loads(f.readline()))
    assert all(r["ok"] for r in replies), replies
    # consecutive imu poses translate by [1,0,0] in the imu frame; the
    # corrected outputs must preserve that relative motion exactly
    r0, r1 = replies[0], replies[1]
    d = np.asarray(r1["t"]) - np.asarray(r0["t"])
    np.testing.assert_allclose(np.linalg.norm(d), 1.0, atol=1e-6)
    f.write(json.dumps({"kind": "query", "what": "status"}) + "\n")
    f.flush()
    assert json.loads(f.readline())["triggers"] == n_triggers_before

    # world_transform query: single-world graph -> identity for (0, 0),
    # unknown pair -> ok: False
    f.write(json.dumps({"kind": "query", "what": "world_transform",
                        "m": 0, "n": 0}) + "\n")
    f.flush()
    wt = json.loads(f.readline())
    assert wt["ok"]
    np.testing.assert_allclose(np.asarray(wt["m_T_n"]), np.eye(4), atol=1e-12)
    f.write(json.dumps({"kind": "query", "what": "world_transform",
                        "m": 0, "n": 7}) + "\n")
    f.flush()
    assert json.loads(f.readline())["ok"] is False

    f.write(json.dumps({"kind": "shutdown"}) + "\n")
    f.flush()
    reply = json.loads(f.readline())
    assert reply.get("shutdown")
    client.close()
    th.join(timeout=120)
    assert not th.is_alive()
    assert (tmp_path / "ckpt" / "solved_posegraph.json").exists()

def test_incremental_trajectory_query():
    """Version-gated delta protocol: same version -> only the suffix from
    since_n; version change (new solve) -> full resend."""
    from solve_keyframe_pose_graph_tpu.utils import nse3 as _n
    store = GraphStore()
    server = PoseGraphServer(store)
    t0 = 1_000_000_000
    for i in range(50):
        store.add_node(t0 + i * 1_000_000_000, _n.quat_identity(),
                       [float(i), 0, 0])
    r1 = server._query({"what": "trajectory"})
    assert r1["from"] == 0 and r1["n"] == 50 and len(r1["t"]) == 50
    # more nodes, same version -> suffix only
    for i in range(50, 60):
        store.add_node(t0 + i * 1_000_000_000, _n.quat_identity(),
                       [float(i), 0, 0])
    server.composer.assemble()
    r2 = server._query({"what": "trajectory", "version": r1["version"],
                        "since_n": r1["n"]})
    assert r2["version"] == r1["version"]
    assert r2["from"] == 50 and r2["n"] == 60 and len(r2["t"]) == 10
    # a solve bumps the version -> full resend
    store.add_loop_edge(t0 + 59 * 1_000_000_000, t0,
                        _n.quat_identity(), [59.0, 0, 0], 1.0)
    server.engine.trigger()
    server.engine.drain()
    server.composer.assemble()
    r3 = server._query({"what": "trajectory", "version": r2["version"],
                        "since_n": r2["n"]})
    assert r3["version"] != r2["version"]
    assert r3["from"] == 0 and len(r3["t"]) == 60

def test_path_query_imu_frame():
    from solve_keyframe_pose_graph_tpu.utils import nse3 as _n
    store = GraphStore()
    server = PoseGraphServer(store)
    t0 = 1_000_000_000
    q_ic = _n.quat_normalize(np.asarray([0.0, 0.0, 0.2, 1.0]))
    t_ic = np.asarray([0.1, 0.0, 0.05])
    store.set_extrinsic(q_ic, t_ic)
    for i in range(10):
        store.add_node(t0 + i * 1_000_000_000, _n.quat_identity(),
                       [float(i), 0, 0])
    r = server._query({"what": "path", "frame": "imu"})
    assert r["n"] == 10
    # w_T_imu = w_T_c * (imu_T_cam)^-1 for the identity-rotation poses
    q_ci, t_ci = _n.pose_inv(q_ic, t_ic)
    expect0 = np.asarray([0.0, 0, 0]) + t_ci
    np.testing.assert_allclose(np.asarray(r["t"][0]), expect0, atol=1e-12)
    r_cam = server._query({"what": "path", "frame": "camera"})
    np.testing.assert_allclose(np.asarray(r_cam["t"][0]), [0, 0, 0],
                               atol=1e-12)
