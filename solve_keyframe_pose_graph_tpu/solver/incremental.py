"""Incremental per-trigger Problem maintenance.

The reference's ceres::Problem is persistent: each trigger ADDS only the new
residual blocks (PoseGraphSLAM.cpp:1338-1640) — per-trigger problem
maintenance is O(new work). Round-3's builder (solver/problem.
build_problem_np) was O(whole problem) per trigger: the full odometry grid
recomputed on host and every padded leaf re-packed and re-shipped over the
~35 ms-RTT tunnel (~4-5 MB at 10k-node scale). That made the 10k streaming
trigger 2-3x the pure device solve (VERDICT round-3 item 5).

TPU-native incremental equivalent: split the Problem into

  * OBSERVATION leaves — odometry grid (odo_q/t/w/mask), loop-edge arrays
    (loop_a/b/q/t/w/mask). Append-only functions of the immutable VIO/edge
    input: kept DEVICE-RESIDENT across triggers and updated in place with
    one `lax.dynamic_update_slice` per leaf from a packed delta covering
    only the new nodes/edges.
  * STATE leaves — q, t, switch (evolve with every solve), node/free masks,
    priors (small). Shipped fresh each trigger in the same packed buffer.

Everything still crosses the tunnel as ONE float + ONE int buffer per
trigger (per-array transfers are ruinous — solver/problem.py note); the
difference is the float buffer now carries ~(state + delta) instead of the
whole padded problem (~6x fewer bytes at 10k scale, and the O(N) host
odometry-grid math runs only over the appended suffix).

Correctness guards (cheap prefix comparisons, falling back to a full
build_problem_np rebuild on ANY mismatch): node validity and the loop-edge
prefix are append-only by construction — node world signs are fixed at
append time (which_world_is_this timestamps, NodeDataManager.cpp:1127-1198)
and edge observations are immutable — but ablation masks, checkpoint
restores (frozen prefixes), and capacity re-bucketing all violate
incrementality, so the builder VERIFIES instead of assuming. Delta sizes
are bucketed (128 nodes / 64 edges) so XLA programs amortize like capacity
buckets. Bitwise equality with the from-scratch builder is tested in
tests/test_incremental_build.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from solve_keyframe_pose_graph_tpu.solver.problem import (
    Problem, build_problem_np, odometry_grid_np,
)

_OBS_FIELDS = ("odo_q", "odo_t", "odo_w", "odo_mask",
               "loop_a", "loop_b", "loop_q", "loop_t", "loop_w", "loop_mask")

_NODE_DELTA_BUCKET = 128
_EDGE_DELTA_BUCKET = 64


def _bucket_up(n: int, b: int) -> int:
    return max(b, -(-int(n) // b) * b)


@partial(jax.jit, static_argnames=("meta",))
def _inc_assemble(fbuf, ibuf, obs: dict, n0, e0, meta):
    """Unpack the packed (state + delta) buffers and splice the deltas into
    the device-resident observation leaves. meta = (sizes, shapes, kinds)
    in the fixed order below; n0/e0 are traced start indices so advancing
    the stream does NOT recompile — only delta-bucket/capacity changes do.
    """
    sizes, shapes, kinds = meta
    vals = []
    fo = io = 0
    for size, shape, kind in zip(sizes, shapes, kinds):
        if kind == "i":
            vals.append(jax.lax.dynamic_slice_in_dim(
                ibuf, io, size).reshape(shape))
            io += size
        else:
            vals.append(jax.lax.dynamic_slice_in_dim(
                fbuf, fo, size).reshape(shape))
            fo += size
    (q, t, node_mask, free_mask, switch,
     prior_q, prior_t, prior_w, prior_mask,
     odo_q_d, odo_t_d, odo_w_d, odo_m_d,
     loop_q_d, loop_t_d, loop_w_d, loop_m_d,
     prior_idx, loop_a_d, loop_b_d) = vals

    n0 = jnp.asarray(n0, jnp.int32)
    e0 = jnp.asarray(e0, jnp.int32)
    z = jnp.int32(0)
    new_obs = dict(obs)
    if odo_q_d.shape[1]:                      # static: node delta present
        new_obs["odo_q"] = jax.lax.dynamic_update_slice(
            obs["odo_q"], odo_q_d, (z, n0, z))
        new_obs["odo_t"] = jax.lax.dynamic_update_slice(
            obs["odo_t"], odo_t_d, (z, n0, z))
        new_obs["odo_w"] = jax.lax.dynamic_update_slice(
            obs["odo_w"], odo_w_d, (z, n0))
        new_obs["odo_mask"] = jax.lax.dynamic_update_slice(
            obs["odo_mask"], odo_m_d, (z, n0))
    if loop_q_d.shape[0]:                     # static: edge delta present
        new_obs["loop_a"] = jax.lax.dynamic_update_slice(
            obs["loop_a"], loop_a_d, (e0,))
        new_obs["loop_b"] = jax.lax.dynamic_update_slice(
            obs["loop_b"], loop_b_d, (e0,))
        new_obs["loop_q"] = jax.lax.dynamic_update_slice(
            obs["loop_q"], loop_q_d, (e0, z))
        new_obs["loop_t"] = jax.lax.dynamic_update_slice(
            obs["loop_t"], loop_t_d, (e0, z))
        new_obs["loop_w"] = jax.lax.dynamic_update_slice(
            obs["loop_w"], loop_w_d, (e0,))
        new_obs["loop_mask"] = jax.lax.dynamic_update_slice(
            obs["loop_mask"], loop_m_d, (e0,))

    problem = Problem(
        q=q, t=t, node_mask=node_mask, free_mask=free_mask,
        switch=switch,
        prior_idx=prior_idx, prior_q=prior_q, prior_t=prior_t,
        prior_w=prior_w, prior_mask=prior_mask,
        **new_obs,
    )
    return problem


class IncrementalBuilder:
    """Engine-side cache making build_problem_np O(new work) per trigger.

    Usage: call build(...) with the exact build_problem_np inputs; it
    returns a Problem BITWISE identical to the from-scratch builder. The
    first call (and any call where the guards detect a non-append-only
    change) takes the full path; steady-state streaming calls take the
    delta path."""

    def __init__(self, fanout: int = 5, odo_decay: float = 0.9,
                 odo_yaw_sigma2: float = 6.0):
        self.fanout = fanout
        self.odo_decay = odo_decay
        self.odo_yaw_sigma2 = odo_yaw_sigma2
        self._key = None          # (n_cap, e_cap, p_cap, dtype_str)
        self._obs = None          # device dict of _OBS_FIELDS
        self._n_built = 0
        self._e_built = 0
        # host guard mirrors (prefix validity must be VERIFIED, not assumed)
        self._node_valid = np.zeros(0, bool)
        self._loop_sig = None     # (a, b, valid) prefix copies
        self.full_builds = 0      # observability: engine solve_stats
        self.delta_builds = 0

    # -- internals ---------------------------------------------------------

    def _remember(self, problem: Problem, node_valid, loop_pairs,
                  loop_valid, key) -> None:
        self._key = key
        self._obs = {f: getattr(problem, f) for f in _OBS_FIELDS}
        self._n_built = len(node_valid)
        self._e_built = len(loop_valid)
        self._node_valid = np.asarray(node_valid, bool).copy()
        if len(loop_valid):
            self._loop_sig = (np.asarray(loop_pairs[:, 0], np.int64).copy(),
                              np.asarray(loop_pairs[:, 1], np.int64).copy(),
                              np.asarray(loop_valid, bool).copy())
        else:
            self._loop_sig = (np.zeros(0, np.int64), np.zeros(0, np.int64),
                              np.zeros(0, bool))

    def _can_delta(self, node_valid, loop_pairs, loop_valid, key) -> bool:
        if self._obs is None or key != self._key:
            return False
        n, e = len(node_valid), len(loop_valid)
        if n < self._n_built or e < self._e_built:
            return False
        if not np.array_equal(np.asarray(node_valid[: self._n_built], bool),
                              self._node_valid):
            return False
        a0, b0, v0 = self._loop_sig
        eb = self._e_built
        if eb and not (
                np.array_equal(np.asarray(loop_pairs[:eb, 0], np.int64), a0)
                and np.array_equal(np.asarray(loop_pairs[:eb, 1], np.int64),
                                   b0)
                and np.array_equal(np.asarray(loop_valid[:eb], bool), v0)):
            return False
        return True

    # -- public ------------------------------------------------------------

    def build(self, *, q, t, vio_q, vio_t, node_valid, loop_pairs, loop_q,
              loop_t, loop_w, loop_valid, switch, prior_idx, prior_q,
              prior_t, prior_w, n_cap, e_cap, p_cap,
              node_free=None, dtype=np.float32) -> Problem:
        key = (int(n_cap), int(e_cap), int(p_cap), np.dtype(dtype).str)
        n = len(node_valid)
        e = len(loop_valid)
        pad_n = _bucket_up(n - self._n_built, _NODE_DELTA_BUCKET) \
            if n > self._n_built else 0
        pad_e = _bucket_up(e - self._e_built, _EDGE_DELTA_BUCKET) \
            if e > self._e_built else 0
        ok = (self._can_delta(node_valid, loop_pairs, loop_valid, key)
              and self._n_built + pad_n <= n_cap
              and self._e_built + pad_e <= e_cap)
        if not ok:
            problem = build_problem_np(
                q=q, t=t, vio_q=vio_q, vio_t=vio_t, node_valid=node_valid,
                loop_pairs=loop_pairs, loop_q=loop_q, loop_t=loop_t,
                loop_w=loop_w, loop_valid=loop_valid, switch=switch,
                prior_idx=prior_idx, prior_q=prior_q, prior_t=prior_t,
                prior_w=prior_w, node_free=node_free,
                n_cap=n_cap, e_cap=e_cap, p_cap=p_cap, fanout=self.fanout,
                odo_decay=self.odo_decay,
                odo_yaw_sigma2=self.odo_yaw_sigma2, dtype=dtype)
            self._remember(problem, node_valid, loop_pairs, loop_valid, key)
            self.full_builds += 1
            return problem

        self.delta_builds += 1
        F = self.fanout
        n0, e0 = self._n_built, self._e_built
        dn, de = n - n0, e - e0

        # --- odometry delta: columns [n0, n) only. Column u depends on
        # nodes u-F..u, so recompute from lo = max(0, n0-0) with the F-deep
        # history included in the inputs; odometry_grid_np is O(len) so we
        # hand it the suffix starting F nodes early and keep its tail.
        lo = max(0, n0 - F)
        oq_s, ot_s, ow_s, om_s = odometry_grid_np(
            vio_q[lo:n], vio_t[lo:n], node_valid[lo:n], fanout=F,
            odo_decay=self.odo_decay, odo_yaw_sigma2=self.odo_yaw_sigma2)
        off = n0 - lo
        odo_q_d = np.zeros((F, pad_n, 4), dtype); odo_q_d[..., 3] = 1.0
        odo_t_d = np.zeros((F, pad_n, 3), dtype)
        odo_w_d = np.zeros((F, pad_n), dtype)
        odo_m_d = np.zeros((F, pad_n), dtype)
        odo_q_d[:, :dn] = oq_s[:, off:]
        odo_t_d[:, :dn] = ot_s[:, off:]
        odo_w_d[:, :dn] = ow_s[:, off:]
        odo_m_d[:, :dn] = om_s[:, off:]

        # --- loop delta rows [e0, e)
        loop_a_d = np.zeros((pad_e,), np.int32)
        loop_b_d = np.zeros((pad_e,), np.int32)
        loop_q_d = np.zeros((pad_e, 4), dtype); loop_q_d[:, 3] = 1.0
        loop_t_d = np.zeros((pad_e, 3), dtype)
        loop_w_d = np.zeros((pad_e,), dtype)
        loop_m_d = np.zeros((pad_e,), dtype)
        if de:
            loop_a_d[:de] = loop_pairs[e0:e, 0]
            loop_b_d[:de] = loop_pairs[e0:e, 1]
            loop_q_d[:de] = loop_q[e0:e]
            loop_t_d[:de] = loop_t[e0:e]
            loop_w_d[:de] = loop_w[e0:e]
            loop_m_d[:de] = np.asarray(loop_valid[e0:e], dtype)

        # --- state bundle (shipped fresh every trigger)
        qf = np.zeros((n_cap, 4), dtype); qf[:, 3] = 1.0
        tf = np.zeros((n_cap, 3), dtype)
        nm = np.zeros((n_cap,), dtype)
        fm = np.zeros((n_cap,), dtype)
        qf[:n] = q; tf[:n] = t
        nm[:n] = np.asarray(node_valid, dtype)
        if node_free is None:
            fm[:n] = np.asarray(node_valid, dtype)
        else:
            fm[:n] = np.asarray(node_valid & node_free, dtype)
        sw = np.full((e_cap,), 0.99, dtype)
        if e:
            sw[:e] = switch
        p = len(prior_idx)
        pi = np.zeros((p_cap,), np.int32)
        pq_ = np.zeros((p_cap, 4), dtype); pq_[:, 3] = 1.0
        pt_ = np.zeros((p_cap, 3), dtype)
        pw_ = np.zeros((p_cap,), dtype)
        pm_ = np.zeros((p_cap,), dtype)
        if p:
            pi[:p] = prior_idx
            pq_[:p] = np.asarray(prior_q).reshape(-1, 4)
            pt_[:p] = np.asarray(prior_t).reshape(-1, 3)
            pw_[:p] = prior_w
            pm_[:p] = 1.0

        # --- pack (one float + one int buffer; fixed order = _inc_assemble)
        floats = [qf, tf, nm, fm, sw, pq_, pt_, pw_, pm_,
                  odo_q_d, odo_t_d, odo_w_d, odo_m_d,
                  loop_q_d, loop_t_d, loop_w_d, loop_m_d]
        ints = [pi, loop_a_d, loop_b_d]
        shapes = tuple(tuple(a.shape) for a in floats + ints)
        sizes = tuple(int(np.prod(s)) if s else 1 for s in shapes)
        kinds = ("f",) * len(floats) + ("i",) * len(ints)
        fbuf = jnp.asarray(np.concatenate(
            [a.ravel().astype(dtype) for a in floats]))
        ibuf = jnp.asarray(np.concatenate([a.ravel() for a in ints]))
        problem = _inc_assemble(
            fbuf, ibuf, self._obs, jnp.int32(n0), jnp.int32(e0),
            (sizes, shapes, kinds))
        self._remember(problem, node_valid, loop_pairs, loop_valid, key)
        return problem
