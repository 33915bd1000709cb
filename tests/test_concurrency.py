"""Threading stress: concurrent ingest + solver trigger loop + composer.

The reference runs ~9 threads over mutex-guarded state and deliberately
reads optimization variables during ceres::Solve without the lock
(PoseGraphSLAM.cpp:1893-1902). Our design removes that race by snapshotting
(the engine consumes immutable array snapshots); this test hammers the
pipeline from three threads and checks the invariants that the reference
protects with mutexes:

  * ingest thread: nodes + loop edges + kidnap events at full speed
  * solver thread: engine.run() trigger loop
  * composer thread: assemble() + status rendering concurrently

Any torn read/shape race raises inside a worker and fails the test.
"""

import threading
import time

import numpy as np
import pytest

from solve_keyframe_pose_graph_tpu.compose.composer import Composer
from solve_keyframe_pose_graph_tpu.graph import synthetic
from solve_keyframe_pose_graph_tpu.graph.store import GraphStore
from solve_keyframe_pose_graph_tpu.solver.engine import SolverEngine
from solve_keyframe_pose_graph_tpu.utils.log import StatusPrinter, get_logger


@pytest.mark.parametrize("native", [False, True])
def test_concurrent_pipeline(native):
    if native:
        nat = pytest.importorskip(
            "solve_keyframe_pose_graph_tpu.graph.native")
        if nat.load_library() is None:
            pytest.skip("native core not built")
        store = nat.NativeGraphStore()
    else:
        store = GraphStore()

    g = synthetic.circle_graph(n_nodes=400, n_loops=60, seed=5)
    eng = SolverEngine(store)
    cmp_ = Composer(store, eng)
    errors = []
    done = threading.Event()

    t0 = 1_000_000_000
    dtn = 100_000_000
    edge_by_later = {}
    for k in range(g.n_loops):
        a, b = map(int, g.loop_pairs[k])
        edge_by_later.setdefault(max(a, b), []).append(k)

    def ingest():
        try:
            for i in range(g.n_nodes):
                # a kidnap interval mid-stream (fault injection)
                if i == 200:
                    store.kidnap_indicator(t0 + i * dtn - dtn // 2,
                                           "kidnapped")
                    store.kidnap_indicator(t0 + i * dtn - dtn // 3,
                                           "unkidnapped")
                store.add_node(t0 + i * dtn, g.vio_q[i], g.vio_t[i])
                for k in edge_by_later.get(i, []):
                    a, b = map(int, g.loop_pairs[k])
                    store.add_loop_edge(
                        t0 + a * dtn, t0 + b * dtn,
                        g.loop_q[k], g.loop_t[k], float(g.loop_w[k]))
                if i % 97 == 0:
                    time.sleep(0.001)
        except Exception as e:   # pragma: no cover
            errors.append(("ingest", repr(e)))
        finally:
            done.set()

    def solve_loop():
        try:
            while not done.is_set():
                eng.trigger()
                time.sleep(0.002)
            eng.trigger()
        except Exception as e:   # pragma: no cover
            errors.append(("solver", repr(e)))

    def compose_loop():
        logger = get_logger("kpg-test-conc")
        logger.disabled = True
        sp = StatusPrinter(store, eng, logger=logger)
        try:
            while not done.is_set():
                comp = cmp_.assemble()
                if comp is not None:
                    assert len(comp.t) <= store.node_len + 1
                sp.tick(force=True)
                time.sleep(0.002)
        except Exception as e:   # pragma: no cover
            errors.append(("composer", repr(e)))

    threads = [threading.Thread(target=f)
               for f in (ingest, solve_loop, compose_loop)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    assert store.node_len == g.n_nodes
    # final trigger already ran in solver thread; pipeline must be solvable
    eng.trigger()
    assert eng.solved_until == g.n_nodes - 1
    comp = cmp_.assemble()
    assert len(comp.t) == g.n_nodes
    assert eng.solve_stats[-1]["final_cost"] < \
        eng.solve_stats[-1]["initial_cost"]
