"""Static-shape problem arrays for one solve.

The reference materializes its problem as a persistent ceres::Problem that
grows across triggers (PoseGraphSLAM.cpp:1338-1560). TPU-native equivalent:
a fixed-capacity padded SoA pytree. Capacities (Nc, F, Ec, Pc) are static
for XLA; growth happens by host-side bucket doubling (a new capacity =
a new compiled program, amortized O(log N) compiles per run).

Residual families and their layouts:

  * odometry grid (F, Nc): slot [f-1, u] is the edge u <-> u-f with observed
    relative pose u_M_umf from VIO and weight 0.9^f * exp(-yaw_deg^2/6)
    (PoseGraphSLAM.cpp:1577-1606). This banded family is laid out DENSE and
    aligned with the node axis, so the whole Gauss-Newton band needs zero
    gather/scatter — only static shifts (the TPU win over the reference's
    per-edge residual blocks).
  * loop edges (Ec,): switchable-constraint residuals between arbitrary
    pairs (b, a) with observed b_T_a (PoseGraphSLAM.cpp:1381-1556). Sparse:
    gathers + flat-payload scatter-adds.
  * node priors (Pc,): soft anchors on set-root world starts
    (PoseGraphSLAM.cpp:1801-1879).

Masks are {0,1} floats: a masked-out residual contributes zero rows, zero
Jacobian, zero Hessian. Masked-out nodes get an identity Hessian block so
the preconditioner stays invertible; their gradient is zero so their update
is exactly zero.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "q", "t", "node_mask", "free_mask",
        "odo_q", "odo_t", "odo_w", "odo_mask",
        "loop_a", "loop_b", "loop_q", "loop_t", "loop_w", "loop_mask",
        "switch",
        "prior_idx", "prior_q", "prior_t", "prior_w", "prior_mask",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class Problem:
    """All device arrays for one LM solve. Shapes (Nc=node capacity,
    F=odometry fan-out, Ec=loop-edge capacity, Pc=prior capacity):

    q (Nc,4) xyzw | t (Nc,3) | node_mask (Nc,) | free_mask (Nc,)
    (node_mask: participates in residuals at all — 0 for padding and kidnap
     dead zones. free_mask: pose is optimizable — 0 additionally for nodes
     restored from a checkpoint and held constant, the reference's
     SetParameterBlockConstant-on-load, PoseGraphSLAM.cpp:126-147.)
    odo_q (F,Nc,4) | odo_t (F,Nc,3) | odo_w (F,Nc) | odo_mask (F,Nc)
    loop_a/b (Ec,) i32 | loop_q (Ec,4) | loop_t (Ec,3) | loop_w (Ec,)
    loop_mask (Ec,) | switch (Ec,)
    prior_idx (Pc,) i32 | prior_q (Pc,4) | prior_t (Pc,3) | prior_w (Pc,)
    prior_mask (Pc,)
    """

    q: jax.Array
    t: jax.Array
    node_mask: jax.Array
    free_mask: jax.Array
    odo_q: jax.Array
    odo_t: jax.Array
    odo_w: jax.Array
    odo_mask: jax.Array
    loop_a: jax.Array
    loop_b: jax.Array
    loop_q: jax.Array
    loop_t: jax.Array
    loop_w: jax.Array
    loop_mask: jax.Array
    switch: jax.Array
    prior_idx: jax.Array
    prior_q: jax.Array
    prior_t: jax.Array
    prior_w: jax.Array
    prior_mask: jax.Array

    @property
    def n_cap(self) -> int:
        return self.q.shape[0]

    @property
    def fanout(self) -> int:
        return self.odo_q.shape[0]

    @property
    def e_cap(self) -> int:
        return self.loop_a.shape[0]

    @property
    def p_cap(self) -> int:
        return self.prior_idx.shape[0]

    @property
    def dtype(self):
        return self.q.dtype


def empty_problem(n_cap: int, e_cap: int, p_cap: int, fanout: int = 5,
                  dtype=jnp.float32) -> Problem:
    f = fanout
    zq = jnp.zeros((n_cap, 4), dtype).at[:, 3].set(1.0)
    ozq = jnp.zeros((f, n_cap, 4), dtype).at[..., 3].set(1.0)
    lq = jnp.zeros((e_cap, 4), dtype).at[:, 3].set(1.0)
    pq = jnp.zeros((p_cap, 4), dtype).at[:, 3].set(1.0)
    return Problem(
        q=zq,
        t=jnp.zeros((n_cap, 3), dtype),
        node_mask=jnp.zeros((n_cap,), dtype),
        free_mask=jnp.zeros((n_cap,), dtype),
        odo_q=ozq,
        odo_t=jnp.zeros((f, n_cap, 3), dtype),
        odo_w=jnp.zeros((f, n_cap), dtype),
        odo_mask=jnp.zeros((f, n_cap), dtype),
        loop_a=jnp.zeros((e_cap,), jnp.int32),
        loop_b=jnp.zeros((e_cap,), jnp.int32),
        loop_q=lq,
        loop_t=jnp.zeros((e_cap, 3), dtype),
        loop_w=jnp.zeros((e_cap,), dtype),
        loop_mask=jnp.zeros((e_cap,), dtype),
        switch=jnp.full((e_cap,), 0.99, dtype),
        prior_idx=jnp.zeros((p_cap,), jnp.int32),
        prior_q=pq,
        prior_t=jnp.zeros((p_cap, 3), dtype),
        prior_w=jnp.zeros((p_cap,), dtype),
        prior_mask=jnp.zeros((p_cap,), dtype),
    )


def odometry_grid_np(vio_q: np.ndarray, vio_t: np.ndarray,
                     node_valid: np.ndarray, *, fanout: int = 5,
                     odo_decay: float = 0.9, odo_yaw_sigma2: float = 6.0):
    """Unpadded (F, n) odometry observation grid from raw VIO poses.

    Slot [f-1, u] is the edge u <-> u-f with observed relative pose
    u_M_umf = (w_M_u)^-1 * w_M_umf and the reference's weight
    0.9^f * exp(-yaw_deg^2/6) (PoseGraphSLAM.cpp:1577-1606). Pure fp64 host
    math; shared by the problem builder and the residue-visual diagnostics
    (the reference records the same (a, b, weight) tuples during assembly
    for publishSlamResidueVisual, PoseGraphSLAM.cpp:963-1002).

    Returns (oq (F,n,4), ot (F,n,3), ow (F,n), om (F,n)) fp64, with om the
    {0,1} validity mask (both endpoints outside kidnap dead zones)."""
    from solve_keyframe_pose_graph_tpu.utils import nse3

    n = vio_q.shape[0]
    q64 = np.asarray(vio_q, np.float64)
    t64 = np.asarray(vio_t, np.float64)
    oq = np.zeros((fanout, n, 4)); oq[..., 3] = 1.0
    ot = np.zeros((fanout, n, 3))
    ow = np.zeros((fanout, n))
    om = np.zeros((fanout, n))
    for f in range(1, fanout + 1):
        if n <= f:
            break
        # node1 = u, node2 = u - f ; observed u_M_umf
        q1, t1 = q64[f:n], t64[f:n]
        q2, t2 = q64[: n - f], t64[: n - f]
        rq, rt = nse3.pose_relative(q1, t1, q2, t2)
        yaw = nse3.relative_yaw_deg(rq)
        w = (odo_decay ** f) * np.exp(-yaw * yaw / odo_yaw_sigma2)
        oq[f - 1, f:n] = rq
        ot[f - 1, f:n] = rt
        ow[f - 1, f:n] = w
        valid = node_valid[f:n] & node_valid[: n - f]
        om[f - 1, f:n] = valid.astype(np.float64)
    return oq, ot, ow, om


def build_problem_np(
    *,
    q: np.ndarray,                 # (N,4) xyzw initial guesses
    t: np.ndarray,                 # (N,3)
    vio_q: np.ndarray,             # (N,4) raw VIO poses (odometry observations)
    vio_t: np.ndarray,             # (N,3)
    node_valid: np.ndarray,        # (N,) bool: not in a kidnap dead zone
    loop_pairs: np.ndarray,        # (E,2) int (a, b): edge observed as b_T_a
    loop_q: np.ndarray,            # (E,4) observed b_T_a rotation
    loop_t: np.ndarray,            # (E,3)
    loop_w: np.ndarray,            # (E,)
    loop_valid: np.ndarray,        # (E,) bool
    switch: np.ndarray,            # (E,) current switch estimates
    prior_idx: np.ndarray,         # (P,) int
    prior_q: np.ndarray,           # (P,4)
    prior_t: np.ndarray,           # (P,3)
    prior_w: np.ndarray,           # (P,)
    n_cap: int,
    e_cap: int,
    p_cap: int,
    node_free: np.ndarray | None = None,  # (N,) bool; default = node_valid
    fanout: int = 5,
    odo_decay: float = 0.9,
    odo_yaw_sigma2: float = 6.0,
    dtype=np.float32,
) -> Problem:
    """Host-side construction of the padded Problem from numpy graph state.

    The odometry observations u_M_umf = (w_M_u)^-1 * w_M_umf and their
    yaw-dependent weights are computed here on host (float64) once per
    trigger; they are pure functions of the immutable VIO input.
    """
    from solve_keyframe_pose_graph_tpu.utils import nse3

    n = q.shape[0]
    e = loop_pairs.shape[0] if loop_pairs.size else 0
    p = len(prior_idx)
    assert n <= n_cap and e <= e_cap and p <= p_cap, (n, e, p, n_cap, e_cap, p_cap)

    # --- nodes
    qf = np.zeros((n_cap, 4), dtype); qf[:, 3] = 1.0
    tf = np.zeros((n_cap, 3), dtype)
    nm = np.zeros((n_cap,), dtype)
    fm = np.zeros((n_cap,), dtype)
    qf[:n] = q; tf[:n] = t
    nm[:n] = node_valid.astype(dtype)
    if node_free is None:
        fm[:n] = node_valid.astype(dtype)
    else:
        fm[:n] = (node_valid & node_free).astype(dtype)

    # --- odometry grid from VIO (float64 host math, then cast)
    oq64, ot64, ow64, om64 = odometry_grid_np(
        vio_q, vio_t, node_valid, fanout=fanout, odo_decay=odo_decay,
        odo_yaw_sigma2=odo_yaw_sigma2)
    oq = np.zeros((fanout, n_cap, 4), dtype); oq[..., 3] = 1.0
    ot = np.zeros((fanout, n_cap, 3), dtype)
    ow = np.zeros((fanout, n_cap), dtype)
    om = np.zeros((fanout, n_cap), dtype)
    oq[:, :n] = oq64
    ot[:, :n] = ot64
    ow[:, :n] = ow64
    om[:, :n] = om64

    # --- loop edges
    la = np.zeros((e_cap,), np.int32)
    lb = np.zeros((e_cap,), np.int32)
    lq = np.zeros((e_cap, 4), dtype); lq[:, 3] = 1.0
    lt = np.zeros((e_cap, 3), dtype)
    lw = np.zeros((e_cap,), dtype)
    lm = np.zeros((e_cap,), dtype)
    sw = np.full((e_cap,), 0.99, dtype)
    if e:
        la[:e] = loop_pairs[:, 0]
        lb[:e] = loop_pairs[:, 1]
        lq[:e] = loop_q
        lt[:e] = loop_t
        lw[:e] = loop_w
        lm[:e] = loop_valid.astype(dtype)
        sw[:e] = switch

    # --- priors
    pi = np.zeros((p_cap,), np.int32)
    pq_ = np.zeros((p_cap, 4), dtype); pq_[:, 3] = 1.0
    pt_ = np.zeros((p_cap, 3), dtype)
    pw_ = np.zeros((p_cap,), dtype)
    pm_ = np.zeros((p_cap,), dtype)
    if p:
        pi[:p] = prior_idx
        pq_[:p] = prior_q
        pt_[:p] = prior_t
        pw_[:p] = prior_w
        pm_[:p] = 1.0

    # assemble the full pytree in HOST numpy first, then transfer as TWO
    # packed flat buffers (floats + int32) unpacked device-side in one
    # jitted program: per-array transfers each pay a host<->device round
    # trip (~35 ms on a tunneled device; 24 leaves cost ~860 ms/trigger
    # before packing)
    host = Problem(
        q=qf, t=tf, node_mask=nm, free_mask=fm,
        odo_q=oq, odo_t=ot, odo_w=ow, odo_mask=om,
        loop_a=la.astype(np.int32), loop_b=lb.astype(np.int32),
        loop_q=lq, loop_t=lt, loop_w=lw, loop_mask=lm, switch=sw,
        prior_idx=pi.astype(np.int32), prior_q=pq_, prior_t=pt_,
        prior_w=pw_, prior_mask=pm_,
    )
    return transfer_problem(host)


def live_lengths(p: Problem) -> tuple[int, int]:
    """(node_len, edge_len) upper bounds recovered from the masks (one host
    fetch each). Padding beyond the live ranges is all-zero by construction
    (build_problem_np), so the last set mask entry bounds the live length;
    in-range masked entries (kidnap dead zones, ablated edges) stay inside
    the bound. Used by the escalation rung to repack an oversized capacity
    bucket down to the live problem (VERDICT round-3 item 7)."""
    nm = np.asarray(p.node_mask)
    em = np.asarray(p.loop_mask)
    nz = np.nonzero(nm > 0.5)[0]
    ez = np.nonzero(em > 0.5)[0]
    n_len = int(nz[-1]) + 1 if nz.size else 1
    e_len = int(ez[-1]) + 1 if ez.size else 1
    return n_len, e_len


def repack_problem(p: Problem, n_len: int, e_len: int,
                   granularity: int = 1024) -> Problem:
    """Slice a Problem down to the smallest granularity-multiple capacities
    covering (n_len, e_len). Device-side slices (no host round trip); a
    no-op when the capacities already fit. Safe because every cross-
    reference stays in range: valid loop/prior indices point at live nodes,
    and masked padding edges alias node 0 (build_problem_np zeros them).

    Why 1024-granular instead of the engine's power-of-two buckets: the
    fp64 escalation rung pays ~50x per element, and an 8.3k-node graph in a
    16,384 bucket would otherwise pay for 2x the live problem; distinct
    escalation capacities are rare enough that the extra compile keys are
    irrelevant."""
    g = int(granularity)
    n_cap = min(p.n_cap, max(g, -(-int(n_len) // g) * g))
    e_cap = min(p.e_cap, max(g, -(-int(e_len) // g) * g))
    if n_cap == p.n_cap and e_cap == p.e_cap:
        return p
    return Problem(
        q=p.q[:n_cap], t=p.t[:n_cap],
        node_mask=p.node_mask[:n_cap], free_mask=p.free_mask[:n_cap],
        odo_q=p.odo_q[:, :n_cap], odo_t=p.odo_t[:, :n_cap],
        odo_w=p.odo_w[:, :n_cap], odo_mask=p.odo_mask[:, :n_cap],
        loop_a=p.loop_a[:e_cap], loop_b=p.loop_b[:e_cap],
        loop_q=p.loop_q[:e_cap], loop_t=p.loop_t[:e_cap],
        loop_w=p.loop_w[:e_cap], loop_mask=p.loop_mask[:e_cap],
        switch=p.switch[:e_cap],
        prior_idx=p.prior_idx, prior_q=p.prior_q, prior_t=p.prior_t,
        prior_w=p.prior_w, prior_mask=p.prior_mask,
    )


def problem_astype(p: Problem, dtype) -> Problem:
    """Cast a Problem's float leaves to `dtype` (int leaves untouched).

    Used by the adaptive-precision escalation (ops/lm.lm_solve_adaptive):
    the fp32 observations are a one-time ~1e-7 relative rounding of the fp64
    host inputs — a negligible perturbation of the PROBLEM — while the
    instability the escalation fixes is fp32 error accumulated DURING the
    solve (assembly cancellation + cost comparisons), which the fp64 re-solve
    removes. Casting device-side avoids a host round trip."""
    vals = {}
    for f in dataclasses.fields(Problem):
        a = getattr(p, f.name)
        vals[f.name] = a if a.dtype == jnp.int32 else jnp.asarray(a, dtype)
    return Problem(**vals)


@partial(jax.jit, static_argnames=("sizes", "shapes", "kinds"))
def _unpack_problem(fbuf, ibuf, sizes, shapes, kinds):
    out = []
    fo = io = 0
    for size, shape, kind in zip(sizes, shapes, kinds):
        if kind == "i":
            out.append(jax.lax.dynamic_slice_in_dim(
                ibuf, io, size).reshape(shape))
            io += size
        else:
            out.append(jax.lax.dynamic_slice_in_dim(
                fbuf, fo, size).reshape(shape))
            fo += size
    return out


def transfer_problem(host: Problem) -> Problem:
    """Host-numpy Problem -> device, via two packed flat buffers."""
    names = [f.name for f in dataclasses.fields(Problem)]
    leaves = [np.asarray(getattr(host, n)) for n in names]
    float_dt = leaves[0].dtype
    fparts, iparts, kinds, shapes = [], [], [], []
    for arr in leaves:
        shapes.append(tuple(arr.shape))
        if arr.dtype == np.int32:
            kinds.append("i")
            iparts.append(arr.ravel())
        else:
            kinds.append("f")
            fparts.append(arr.ravel().astype(float_dt))
    fbuf = jnp.asarray(np.concatenate(fparts))
    ibuf = jnp.asarray(np.concatenate(iparts))
    sizes = tuple(int(np.prod(s)) if s else 1 for s in shapes)
    vals = _unpack_problem(fbuf, ibuf, sizes, tuple(shapes), tuple(kinds))
    return Problem(**dict(zip(names, vals)))
