"""AOT executable cache (utils/cache.aot_* + ops/lm.lm_solve_aot).

The reference pays zero per-process compile cost (AOT C++,
keyframe_pose_graph_slam_node.cpp:233); our startup-latency analog is the
in-process AOT executable cache + engine.warmup(background=True). The
DISK-persisted executable layer measured SLOWER over the tunneled TPU
(first-call program upload — utils/cache.py) and segfaults XLA:CPU's own
loader, so it is opt-in (`KPG_AOT_DISK=1`) and never on for CPU. These
tests pin the safety properties:

  * lm_solve_aot is RESULT-IDENTICAL to lm_solve (same HLO, same binary —
    only the dispatch machinery differs), so the engine's switch to AOT
    dispatch cannot change any solve outcome;
  * the disk layer stays OFF by default and off on CPU even when opted in.
"""

import dataclasses

import numpy as np
import pytest

from solve_keyframe_pose_graph_tpu.config import Config
from solve_keyframe_pose_graph_tpu.graph import synthetic
from solve_keyframe_pose_graph_tpu.ops import lm as lm_ops
from solve_keyframe_pose_graph_tpu.ops.coarse import auto_coarse_group
from solve_keyframe_pose_graph_tpu.solver.problem import build_problem_np
from solve_keyframe_pose_graph_tpu.utils import cache as cache_mod


def _small_problem():
    cfg = Config()
    g = synthetic.circle_graph(n_nodes=64, n_loops=8, seed=0)
    problem = build_problem_np(
        q=g.vio_q, t=g.vio_t, vio_q=g.vio_q, vio_t=g.vio_t,
        node_valid=np.ones(g.n_nodes, bool),
        loop_pairs=g.loop_pairs, loop_q=g.loop_q, loop_t=g.loop_t,
        loop_w=g.loop_w, loop_valid=np.ones(g.n_loops, bool),
        switch=np.full(g.n_loops, cfg.residual.switch_init),
        prior_idx=np.array([0]), prior_q=g.vio_q[:1], prior_t=g.vio_t[:1],
        prior_w=np.array([1.1]), n_cap=256, e_cap=64, p_cap=16,
        fanout=cfg.residual.odometry_fanout, dtype=np.float32)
    warm_cfg = dataclasses.replace(cfg.solver, adaptive_fp64=False)
    kw = lm_ops.cfg_lm_kwargs(
        warm_cfg, residual_mode=cfg.residual.mode,
        use_switch=cfg.residual.use_switch_constraints)
    if kw.get("coarse_group") is None:
        kw["coarse_group"] = auto_coarse_group(256)
    return problem, kw


def test_lm_solve_aot_matches_lm_solve():
    problem, kw = _small_problem()
    ref = lm_ops.lm_solve(problem, **kw)
    aot = lm_ops.lm_solve_aot(problem, **kw)
    np.testing.assert_array_equal(np.asarray(ref.q), np.asarray(aot.q))
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(aot.t))
    assert float(ref.final_cost) == float(aot.final_cost)
    assert int(ref.iterations) == int(aot.iterations)
    # second call is an in-process executable hit (same object)
    key = ("solve", tuple(sorted(kw.items())), lm_ops._shape_key(problem))
    assert key in lm_ops._AOT_CACHE
    aot2 = lm_ops.lm_solve_aot(problem, **kw)
    assert float(aot2.final_cost) == float(aot.final_cost)


def test_aot_cache_keys_on_sharding():
    """Round-4 regression (VERDICT round-4 item 1): _shape_key ignored input
    sharding, so an executable compiled for single-device inputs (e.g. by
    warmup) was dispatched on a mesh-sharded problem and died with a
    sharding mismatch. Compile unsharded FIRST, then solve the SAME shapes
    sharded in the same process — both must run and agree; then back to
    unsharded to pin the reverse direction too."""
    from solve_keyframe_pose_graph_tpu.parallel import make_mesh, shard_problem

    problem, kw = _small_problem()
    res_1 = lm_ops.lm_solve_aot(problem, **kw)            # single-device key

    mesh = make_mesh(8)
    prob_sh = shard_problem(problem, mesh)
    res_sh = lm_ops.lm_solve_aot(prob_sh, **kw)           # mesh-sharded key
    # the toy graph converges to chi^2 ~1e-15 where rtol on the cost is
    # meaningless fp32 noise; agreement is pinned on the poses
    np.testing.assert_allclose(np.asarray(res_sh.t), np.asarray(res_1.t),
                               atol=1e-2)
    assert float(res_sh.final_cost) <= float(res_sh.initial_cost)
    key_1 = ("solve", tuple(sorted(kw.items())), lm_ops._shape_key(problem))
    key_sh = ("solve", tuple(sorted(kw.items())),
              lm_ops._shape_key(prob_sh))
    assert key_1 != key_sh
    assert key_1 in lm_ops._AOT_CACHE and key_sh in lm_ops._AOT_CACHE

    res_1b = lm_ops.lm_solve_aot(problem, **kw)           # unshard again
    assert float(res_1b.final_cost) == float(res_1.final_cost)


def test_default_device_arrays_share_numpy_key():
    """warmup() compiles from HOST (numpy) problems; live triggers dispatch
    device-resident problems from the incremental builder. Both land on the
    default device, so they must share one executable — keying them apart
    silently voids warmup (every first trigger per bucket would re-lower
    and re-compile)."""
    import jax

    problem, kw = _small_problem()
    key_np = lm_ops._shape_key(problem)
    prob_dev = jax.device_put(problem)            # default-device committed
    assert lm_ops._shape_key(prob_dev) == key_np
    res_np = lm_ops.lm_solve_aot(problem, **kw)
    n1 = len(lm_ops._AOT_CACHE)                   # numpy-keyed executable in
    res_dev = lm_ops.lm_solve_aot(prob_dev, **kw)
    assert len(lm_ops._AOT_CACHE) == n1           # same executable, reused
    assert float(res_np.final_cost) == float(res_dev.final_cost)


def test_disk_layer_default_off(tmp_path, monkeypatch):
    """Without the KPG_AOT_DISK=1 opt-in the disk layer is inert on every
    backend (measured loss over the tunneled TPU — utils/cache.py)."""
    monkeypatch.delenv("KPG_AOT_DISK", raising=False)
    prev = cache_mod._enabled_dir
    try:
        cache_mod._enabled_dir = str(tmp_path)
        assert cache_mod._aot_path(("k",)) is None
        assert cache_mod.aot_load(("k",)) is None
        assert cache_mod.aot_save(("k",), object()) is False
        assert not (tmp_path / "aot").exists()
    finally:
        cache_mod._enabled_dir = prev


def test_disk_layer_disabled_on_cpu_even_opted_in(tmp_path, monkeypatch):
    """XLA:CPU's AOT loader segfaults deserializing its own executables
    (cpu_aot_loader.cc machine-feature mismatch, measured round 4): the
    CPU gate must hold even under the explicit opt-in."""
    import jax

    if jax.devices()[0].platform != "cpu":
        pytest.skip("CPU-only safety property")
    monkeypatch.setenv("KPG_AOT_DISK", "1")
    prev = cache_mod._enabled_dir
    try:
        cache_mod._enabled_dir = str(tmp_path)
        assert cache_mod._aot_path(("k",)) is None
        assert cache_mod.aot_save(("k",), object()) is False
        assert not (tmp_path / "aot").exists()
    finally:
        cache_mod._enabled_dir = prev


def test_fingerprint_stable_and_fast():
    f1 = cache_mod.source_fingerprint()
    f2 = cache_mod.source_fingerprint()
    assert f1 == f2 and len(f1) == 24
