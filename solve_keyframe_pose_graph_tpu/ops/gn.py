"""Gauss-Newton normal-equation blocks for the pose-graph problem.

Replaces Ceres problem assembly + SPARSE_NORMAL_CHOLESKY
(/root/reference/src/PoseGraphSLAM.cpp:1270,1887-1924) with an explicitly
structured block system designed for the TPU memory system:

  H = [ H_nn  H_ns ]   with node-node part H_nn = D (block diag, 6x6)
      [ H_ns' H_ss ]                      + banded B_f (odometry, offsets 1..F)
                                          + sparse loop blocks A_ba
       H_ns: per-loop-edge 6-vectors (node <-> switch coupling)
       H_ss: diagonal (switch scalars)

The odometry band is stored DENSE and node-aligned — (F, Nc, 6, 6) — so the
entire banded matvec is static shifts + batched 6x6 matmuls: zero gather,
zero scatter, perfectly streamed from HBM. Only the loop-closure blocks
(|E| of them) use gather/scatter-add. This is the structural win over
translating Ceres' per-residual-block sparse assembly.

All quantities are masked: padded slots carry zero blocks (identity on the
diagonal) and zero gradient, so their CG updates are exactly zero.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from solve_keyframe_pose_graph_tpu.ops import residuals as res
from solve_keyframe_pose_graph_tpu.solver.problem import Problem


# ---------------------------------------------------------------------------
# shifts (static f, unrolled)
# ---------------------------------------------------------------------------


def shift_down(x, f):
    """out[u] = x[u-f]; first f slots zero."""
    pad = jnp.zeros((f,) + x.shape[1:], x.dtype)
    return jnp.concatenate([pad, x[:-f]], axis=0)


def shift_up(x, f):
    """out[u] = x[u+f]; last f slots zero."""
    pad = jnp.zeros((f,) + x.shape[1:], x.dtype)
    return jnp.concatenate([x[f:], pad], axis=0)


# ---------------------------------------------------------------------------
# GN blocks container
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["cost", "D", "B", "Aba", "cb", "ca", "ds", "g_n", "g_s"],
    meta_fields=[],
)
@dataclasses.dataclass
class GNBlocks:
    cost: jax.Array          # scalar, 0.5 * sum r^2  (Ceres cost convention)
    D: jax.Array             # (Nc,6,6) node diagonal blocks
    B: jax.Array             # (F,Nc,6,6) band: couples u (rows) with u-f (cols)
    Aba: jax.Array           # (Ec,6,6) loop off-diag: couples b (rows), a (cols)
    cb: jax.Array            # (Ec,6) node-b <-> switch coupling
    ca: jax.Array            # (Ec,6) node-a <-> switch coupling
    ds: jax.Array            # (Ec,)  switch diagonal
    g_n: jax.Array           # (Nc,6) gradient J^T r, nodes
    g_s: jax.Array           # (Ec,)  gradient, switches


def _odo_inputs(problem: Problem, q, t):
    """Stacked (F,Nc,...) endpoint states for the odometry grid."""
    F = problem.fanout
    q1 = jnp.broadcast_to(q, (F,) + q.shape)
    t1 = jnp.broadcast_to(t, (F,) + t.shape)
    q2 = jnp.stack([shift_down(q, f + 1) for f in range(F)])
    t2 = jnp.stack([shift_down(t, f + 1) for f in range(F)])
    # padded slots hold identity quats; avoid 0-norm quats in the residual
    q2 = jnp.where(
        jnp.sum(q2 * q2, axis=-1, keepdims=True) < 0.5,
        jnp.zeros_like(q2).at[..., 3].set(1.0),
        q2,
    )
    return q1, t1, q2, t2


def evaluate_cost(problem: Problem, q, t, s, use_switch: bool = True
                  ) -> jax.Array:
    """0.5 * ||r||^2 over all three residual families (no Jacobians)."""
    F, Nc = problem.fanout, problem.n_cap
    q1, t1, q2, t2 = _odo_inputs(problem, q, t)
    w = problem.odo_w * problem.odo_mask
    r_odo = res.six_dof_residual(q1, t1, q2, t2, problem.odo_q, problem.odo_t, w)

    qb, tb = q[problem.loop_b], t[problem.loop_b]
    qa, ta = q[problem.loop_a], t[problem.loop_a]
    if use_switch:
        r_loop = res.six_dof_switch_residual(
            qb, tb, qa, ta, s, problem.loop_q, problem.loop_t, problem.loop_w
        ) * problem.loop_mask[:, None]
    else:
        r_loop = res.six_dof_residual(
            qb, tb, qa, ta, problem.loop_q, problem.loop_t, problem.loop_w
        ) * problem.loop_mask[:, None]

    qp, tp = q[problem.prior_idx], t[problem.prior_idx]
    r_pri = res.node_prior_residual(
        qp, tp, problem.prior_q, problem.prior_t,
        problem.prior_w * problem.prior_mask,
    )
    return 0.5 * (
        jnp.sum(r_odo * r_odo) + jnp.sum(r_loop * r_loop) + jnp.sum(r_pri * r_pri)
    )


def scatter_add_blocks(target, idx, blocks):
    """target (Nc,6,6) .at[idx].add(blocks (E,6,6)) via flat-36 payloads.

    TPU lowers a scatter of (6,6)-shaped updates catastrophically (~0.7 ms at
    16k edges) but the SAME scatter with (36,)-flat updates is ~free; shapes
    are reshaped around the scatter."""
    Nc = target.shape[0]
    E = blocks.shape[0]
    flat = target.reshape(Nc, 36).at[idx].add(blocks.reshape(E, 36))
    return flat.reshape(Nc, 6, 6)


def assemble(problem: Problem, q, t, s) -> GNBlocks:
    """Direct normal-equation assembly: closed-form J'J blocks (no Jacobian
    materialization — residuals.six_dof_block_products) and flat-payload
    scatter-adds for the loop family. Differentially tested against
    assemble_ref."""
    F, Nc, Ec = problem.fanout, problem.n_cap, problem.e_cap
    dt = problem.dtype

    # ---------------- odometry band (dense, shift-aligned) ----------------
    q1, t1, q2, t2 = _odo_inputs(problem, q, t)
    w = problem.odo_w * problem.odo_mask
    r_o, A11, A22, B, gJ1, gJ2 = res.six_dof_block_products(
        q1, t1, q2, t2, problem.odo_q, problem.odo_t, w
    )
    cost = 0.5 * jnp.sum(r_o * r_o)
    D = jnp.sum(A11, axis=0)
    g_n = jnp.sum(gJ1, axis=0)
    for f in range(F):
        D = D + shift_up(A22[f], f + 1)
        g_n = g_n + shift_up(gJ2[f], f + 1)

    # ---------------- loop edges (flat scatter-adds) ----------------
    qb, tb = q[problem.loop_b], t[problem.loop_b]
    qa, ta = q[problem.loop_a], t[problem.loop_a]
    (r_l, Abb, Aaa, Aba, cb, ca, ds, gb, ga, g_s
     ) = res.six_dof_switch_block_products(
        qb, tb, qa, ta, s, problem.loop_q, problem.loop_t, problem.loop_w
    )
    m = problem.loop_mask
    mb = m[:, None, None]
    r_l = r_l * m[:, None]
    Abb = Abb * mb
    Aaa = Aaa * mb
    Aba = Aba * mb
    cb = cb * m[:, None]
    ca = ca * m[:, None]
    ds = jnp.where(m < 0.5, jnp.ones_like(ds), ds)
    gb = gb * m[:, None]
    ga = ga * m[:, None]
    g_s = g_s * m
    cost = cost + 0.5 * jnp.sum(r_l * r_l)

    D = scatter_add_blocks(D, problem.loop_b, Abb)
    D = scatter_add_blocks(D, problem.loop_a, Aaa)
    g_n = g_n.at[problem.loop_b].add(gb)
    g_n = g_n.at[problem.loop_a].add(ga)

    # ---------------- node priors (tiny; scatter is fine) ----------------
    qp, tp = q[problem.prior_idx], t[problem.prior_idx]
    r_p, Ap, gp = res.node_prior_block_products(
        qp, tp, problem.prior_q, problem.prior_t,
        problem.prior_w * problem.prior_mask,
    )
    pm = problem.prior_mask
    r_p = r_p * pm[:, None]
    cost = cost + 0.5 * jnp.sum(r_p * r_p)
    D = D.at[problem.prior_idx].add(Ap * pm[:, None, None])
    g_n = g_n.at[problem.prior_idx].add(gp * pm[:, None])

    # ---------------- inert padding ----------------
    eye = jnp.eye(6, dtype=dt)
    inactive_n = (problem.node_mask < 0.5)[:, None, None]
    D = jnp.where(inactive_n, eye, D)
    g_n = g_n * problem.node_mask[:, None]

    return GNBlocks(cost=cost, D=D, B=B, Aba=Aba, cb=cb, ca=ca, ds=ds,
                    g_n=g_n, g_s=g_s)


def assemble_ref(problem: Problem, q, t, s) -> GNBlocks:
    """Reference assembly via materialized analytic Jacobians + einsum +
    scatter-add. Kept as the differential-test oracle for assemble()."""
    F, Nc, Ec = problem.fanout, problem.n_cap, problem.e_cap
    dt = problem.dtype

    D = jnp.zeros((Nc, 6, 6), dt)
    g_n = jnp.zeros((Nc, 6), dt)

    # ---------------- odometry band (dense, shift-aligned) ----------------
    q1, t1, q2, t2 = _odo_inputs(problem, q, t)
    w = (problem.odo_w * problem.odo_mask).reshape(-1)
    r_o, J1, J2 = res.six_dof_residual_jac(
        q1.reshape(-1, 4), t1.reshape(-1, 3),
        q2.reshape(-1, 4), t2.reshape(-1, 3),
        problem.odo_q.reshape(-1, 4), problem.odo_t.reshape(-1, 3), w,
    )
    r_o = r_o.reshape(F, Nc, 6)
    J1 = J1.reshape(F, Nc, 6, 6)
    J2 = J2.reshape(F, Nc, 6, 6)
    cost = 0.5 * jnp.sum(r_o * r_o)

    A11 = jnp.einsum("fuki,fukj->fuij", J1, J1)
    A22 = jnp.einsum("fuki,fukj->fuij", J2, J2)
    B = jnp.einsum("fuki,fukj->fuij", J1, J2)   # couples u(rows) with u-f(cols)
    D = D + jnp.sum(A11, axis=0)
    gJ1 = jnp.einsum("fuki,fuk->fui", J1, r_o)
    gJ2 = jnp.einsum("fuki,fuk->fui", J2, r_o)
    g_n = g_n + jnp.sum(gJ1, axis=0)
    for f in range(F):
        D = D + shift_up(A22[f], f + 1)
        g_n = g_n + shift_up(gJ2[f], f + 1)

    # ---------------- loop edges (sparse, scatter-add) ----------------
    qb, tb = q[problem.loop_b], t[problem.loop_b]
    qa, ta = q[problem.loop_a], t[problem.loop_a]
    r_l, L1, L2, Ls = res.six_dof_switch_residual_jac(
        qb, tb, qa, ta, s, problem.loop_q, problem.loop_t, problem.loop_w
    )
    m = problem.loop_mask
    r_l = r_l * m[:, None]
    L1 = L1 * m[:, None, None]
    L2 = L2 * m[:, None, None]
    Ls = Ls * m[:, None]
    cost = cost + 0.5 * jnp.sum(r_l * r_l)

    Abb = jnp.einsum("eki,ekj->eij", L1, L1)
    Aaa = jnp.einsum("eki,ekj->eij", L2, L2)
    Aba = jnp.einsum("eki,ekj->eij", L1, L2)
    cb = jnp.einsum("eki,ek->ei", L1, Ls)
    ca = jnp.einsum("eki,ek->ei", L2, Ls)
    ds = jnp.sum(Ls * Ls, axis=-1)
    D = scatter_add_blocks(D, problem.loop_b, Abb)
    D = scatter_add_blocks(D, problem.loop_a, Aaa)
    g_n = g_n.at[problem.loop_b].add(jnp.einsum("eki,ek->ei", L1, r_l))
    g_n = g_n.at[problem.loop_a].add(jnp.einsum("eki,ek->ei", L2, r_l))
    g_s = jnp.einsum("ek,ek->e", Ls, r_l)

    # ---------------- node priors ----------------
    qp, tp = q[problem.prior_idx], t[problem.prior_idx]
    r_p, Jp = res.node_prior_residual_jac(
        qp, tp, problem.prior_q, problem.prior_t,
        problem.prior_w * problem.prior_mask,
    )
    pm = problem.prior_mask
    r_p = r_p * pm[:, None]
    Jp = Jp * pm[:, None, None]
    cost = cost + 0.5 * jnp.sum(r_p * r_p)
    D = D.at[problem.prior_idx].add(jnp.einsum("pki,pkj->pij", Jp, Jp))
    g_n = g_n.at[problem.prior_idx].add(jnp.einsum("pki,pk->pi", Jp, r_p))

    # ---------------- inert padding ----------------
    # masked nodes/switches: identity diagonal, zero gradient -> zero update
    eye = jnp.eye(6, dtype=dt)
    inactive_n = (problem.node_mask < 0.5)[:, None, None]
    D = jnp.where(inactive_n, eye, D)
    g_n = g_n * problem.node_mask[:, None]
    ds = jnp.where(problem.loop_mask < 0.5, jnp.ones_like(ds), ds)
    g_s = g_s * problem.loop_mask

    return GNBlocks(cost=cost, D=D, B=B, Aba=Aba, cb=cb, ca=ca, ds=ds,
                    g_n=g_n, g_s=g_s)


# ---------------------------------------------------------------------------
# entry-major ("T") path — the production TPU layout
#
# TPU tiles the two minor dims to (8,128): (N,6,6) block tensors store ~21x
# padded and every pass pays it in HBM. Entry-major (36, N) puts nodes in
# lanes: compact storage, full VPU lanes (band matvec measured 9x faster).
# Vectors are (6, N); per-edge quantities (36, Ec)/(6, Ec).
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["cost", "D", "B", "Aba", "cb", "ca", "ds", "g_n", "g_s"],
    meta_fields=[],
)
@dataclasses.dataclass
class GNBlocksT:
    cost: jax.Array          # scalar
    D: jax.Array             # (36, Nc) node diagonal blocks, row-major entries
    B: jax.Array             # (F, 36, Nc) band: u rows with u-f cols
    Aba: jax.Array           # (36, Ec) loop off-diag: b rows, a cols
    cb: jax.Array            # (6, Ec)
    ca: jax.Array            # (6, Ec)
    ds: jax.Array            # (Ec,)
    g_n: jax.Array           # (6, Nc)
    g_s: jax.Array           # (Ec,)


def shift_lanes_down(x, f):
    """out[..., u] = x[..., u-f]; first f lanes zero."""
    pad = jnp.zeros(x.shape[:-1] + (f,), x.dtype)
    return jnp.concatenate([pad, x[..., :-f]], axis=-1)


def shift_lanes_up(x, f):
    """out[..., u] = x[..., u+f]; last f lanes zero."""
    pad = jnp.zeros(x.shape[:-1] + (f,), x.dtype)
    return jnp.concatenate([x[..., f:], pad], axis=-1)


def assemble_t(problem: Problem, q, t, s, use_switch: bool = True
               ) -> GNBlocksT:
    """Entry-major direct assembly (differentially tested vs assemble).

    use_switch=False drops the switch variables: loop edges become plain
    weighted SixDOFError residuals (BASELINE config 1 / the reference with
    switchable constraints compiled out) — the switch rows degenerate to
    inert values and the rest of the solver needs no changes."""
    F, Nc, Ec = problem.fanout, problem.n_cap, problem.e_cap
    dt = problem.dtype

    # ---------------- odometry band ----------------
    q1, t1, q2, t2 = _odo_inputs(problem, q, t)
    w = problem.odo_w * problem.odo_mask
    rsq_o, A11, A22, B, g1, g2 = res.six_dof_block_products_t(
        q1, t1, q2, t2, problem.odo_q, problem.odo_t, w
    )   # blocks (36,F,Nc), grads (6,F,Nc), rsq (F,Nc)
    cost = 0.5 * jnp.sum(rsq_o)
    D = jnp.sum(A11, axis=1)                       # (36, Nc)
    g_n = jnp.sum(g1, axis=1)                      # (6, Nc)
    for f in range(F):
        D = D + shift_lanes_up(A22[:, f], f + 1)
        g_n = g_n + shift_lanes_up(g2[:, f], f + 1)
    B_t = jnp.moveaxis(B, 1, 0)                    # (F, 36, Nc)

    # ---------------- loop edges (flat scatter-adds) ----------------
    qb, tb = q[problem.loop_b], t[problem.loop_b]
    qa, ta = q[problem.loop_a], t[problem.loop_a]
    if use_switch:
        (rsq_l, Abb, Aaa, Aba, cb, ca, ds, gb, ga, g_s
         ) = res.six_dof_switch_block_products_t(
            qb, tb, qa, ta, s, problem.loop_q, problem.loop_t,
            problem.loop_w
        )   # blocks (36,Ec), couplings/grads (6,Ec)
    else:
        rsq_l, Abb, Aaa, Aba, gb, ga = res.six_dof_block_products_t(
            qb, tb, qa, ta, problem.loop_q, problem.loop_t, problem.loop_w
        )
        cb = jnp.zeros((6, Ec), dt)
        ca = jnp.zeros((6, Ec), dt)
        ds = jnp.ones((Ec,), dt)
        g_s = jnp.zeros((Ec,), dt)
    m = problem.loop_mask
    rsq_l = rsq_l * m
    Abb = Abb * m
    Aaa = Aaa * m
    Aba = Aba * m
    cb = cb * m
    ca = ca * m
    ds = jnp.where(m < 0.5, jnp.ones_like(ds), ds)
    gb = gb * m
    ga = ga * m
    g_s = g_s * m
    cost = cost + 0.5 * jnp.sum(rsq_l)

    # scatter via the flat-(Nc,K) trick (lane scatters of tall payloads are
    # slow; (E,K)->(N,K) scatters are ~free), then one cheap transpose back
    Dl = jnp.zeros((Nc, 36), dt).at[problem.loop_b].add(Abb.T)
    Dl = Dl.at[problem.loop_a].add(Aaa.T)
    gl = jnp.zeros((Nc, 6), dt).at[problem.loop_b].add(gb.T)
    gl = gl.at[problem.loop_a].add(ga.T)
    D = D + Dl.T
    g_n = g_n + gl.T

    # ---------------- node priors (tiny) ----------------
    qp, tp = q[problem.prior_idx], t[problem.prior_idx]
    rsq_p, Ap, gp = res.node_prior_block_products_t(
        qp, tp, problem.prior_q, problem.prior_t,
        problem.prior_w * problem.prior_mask,
    )
    pm = problem.prior_mask
    cost = cost + 0.5 * jnp.sum(rsq_p * pm)
    Dp = jnp.zeros((Nc, 36), dt).at[problem.prior_idx].add((Ap * pm).T)
    gpv = jnp.zeros((Nc, 6), dt).at[problem.prior_idx].add((gp * pm).T)
    D = D + Dp.T
    g_n = g_n + gpv.T

    # ---------------- inert padding ----------------
    eyecol = jnp.zeros((36,), dt).at[jnp.arange(0, 36, 7, dtype=jnp.int32)].set(1.0)
    inactive = problem.node_mask < 0.5
    D = jnp.where(inactive[None, :], eyecol[:, None], D)
    g_n = g_n * problem.node_mask[None, :]

    return GNBlocksT(cost=cost, D=D, B=B_t, Aba=Aba, cb=cb, ca=ca, ds=ds,
                     g_n=g_n, g_s=g_s)


def assemble_4dof_t(problem: Problem, q, t, s) -> GNBlocksT:
    """4-DOF (yaw-weighted Euler) assembly — the reference's alternative
    residual family (CeresResidues.h:252-422, not its active path). Uses the
    autodiff Jacobians (correctness over speed for this non-hot mode) and
    converts to the entry-major containers the solver consumes."""
    F, Nc, Ec = problem.fanout, problem.n_cap, problem.e_cap
    dt = problem.dtype

    D = jnp.zeros((Nc, 6, 6), dt)
    g_n = jnp.zeros((Nc, 6), dt)

    q1, t1, q2, t2 = _odo_inputs(problem, q, t)
    w = (problem.odo_w * problem.odo_mask).reshape(-1)
    r_o, J1, J2 = res.four_dof_residual_jac(
        q1.reshape(-1, 4), t1.reshape(-1, 3),
        q2.reshape(-1, 4), t2.reshape(-1, 3),
        problem.odo_q.reshape(-1, 4), problem.odo_t.reshape(-1, 3), w,
    )
    r_o = r_o.reshape(F, Nc, 6)
    J1 = J1.reshape(F, Nc, 6, 6)
    J2 = J2.reshape(F, Nc, 6, 6)
    cost = 0.5 * jnp.sum(r_o * r_o)
    A11 = jnp.einsum("fuki,fukj->fuij", J1, J1)
    A22 = jnp.einsum("fuki,fukj->fuij", J2, J2)
    B = jnp.einsum("fuki,fukj->fuij", J1, J2)
    D = D + jnp.sum(A11, axis=0)
    g_n = g_n + jnp.sum(jnp.einsum("fuki,fuk->fui", J1, r_o), axis=0)
    for f in range(F):
        D = D + shift_up(A22[f], f + 1)
        g_n = g_n + shift_up(jnp.einsum("uki,uk->ui", J2[f], r_o[f]), f + 1)

    qb, tb = q[problem.loop_b], t[problem.loop_b]
    qa, ta = q[problem.loop_a], t[problem.loop_a]
    r_l, L1, L2, Ls = res.four_dof_switch_residual_jac(
        qb, tb, qa, ta, s, problem.loop_q, problem.loop_t, problem.loop_w
    )
    m = problem.loop_mask
    r_l = r_l * m[:, None]
    L1 = L1 * m[:, None, None]
    L2 = L2 * m[:, None, None]
    Ls = Ls * m[:, None]
    cost = cost + 0.5 * jnp.sum(r_l * r_l)
    D = scatter_add_blocks(D, problem.loop_b,
                           jnp.einsum("eki,ekj->eij", L1, L1))
    D = scatter_add_blocks(D, problem.loop_a,
                           jnp.einsum("eki,ekj->eij", L2, L2))
    Aba = jnp.einsum("eki,ekj->eij", L1, L2)
    cb = jnp.einsum("eki,ek->ei", L1, Ls)
    ca = jnp.einsum("eki,ek->ei", L2, Ls)
    ds = jnp.sum(Ls * Ls, axis=-1)
    ds = jnp.where(m < 0.5, jnp.ones_like(ds), ds)
    g_n = g_n.at[problem.loop_b].add(jnp.einsum("eki,ek->ei", L1, r_l))
    g_n = g_n.at[problem.loop_a].add(jnp.einsum("eki,ek->ei", L2, r_l))
    g_s = jnp.einsum("ek,ek->e", Ls, r_l)

    qp, tp = q[problem.prior_idx], t[problem.prior_idx]
    r_p, Jp = res.node_prior_residual_jac(
        qp, tp, problem.prior_q, problem.prior_t,
        problem.prior_w * problem.prior_mask,
    )
    pm = problem.prior_mask
    r_p = r_p * pm[:, None]
    Jp = Jp * pm[:, None, None]
    cost = cost + 0.5 * jnp.sum(r_p * r_p)
    D = D.at[problem.prior_idx].add(jnp.einsum("pki,pkj->pij", Jp, Jp))
    g_n = g_n.at[problem.prior_idx].add(jnp.einsum("pki,pk->pi", Jp, r_p))

    eye = jnp.eye(6, dtype=dt)
    inactive_n = (problem.node_mask < 0.5)[:, None, None]
    D = jnp.where(inactive_n, eye, D)
    g_n = g_n * problem.node_mask[:, None]

    def toT(X):
        return jnp.moveaxis(X.reshape(X.shape[0], 36), 0, -1)

    return GNBlocksT(
        cost=cost, D=toT(D),
        B=jnp.stack([toT(B[f]) for f in range(F)]),
        Aba=toT(Aba), cb=cb.T, ca=ca.T, ds=ds, g_n=g_n.T, g_s=g_s,
    )


def evaluate_cost_4dof(problem: Problem, q, t, s) -> jax.Array:
    """0.5 * ||r||^2 for the 4-DOF residual family."""
    q1, t1, q2, t2 = _odo_inputs(problem, q, t)
    w = problem.odo_w * problem.odo_mask
    r_odo = res.four_dof_residual(q1, t1, q2, t2, problem.odo_q,
                                  problem.odo_t, w)
    qb, tb = q[problem.loop_b], t[problem.loop_b]
    qa, ta = q[problem.loop_a], t[problem.loop_a]
    r_loop = res.four_dof_switch_residual(
        qb, tb, qa, ta, s, problem.loop_q, problem.loop_t, problem.loop_w
    ) * problem.loop_mask[:, None]
    qp, tp = q[problem.prior_idx], t[problem.prior_idx]
    r_pri = res.node_prior_residual(
        qp, tp, problem.prior_q, problem.prior_t,
        problem.prior_w * problem.prior_mask,
    )
    return 0.5 * (jnp.sum(r_odo * r_odo) + jnp.sum(r_loop * r_loop)
                  + jnp.sum(r_pri * r_pri))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["Dh", "Bh", "Aba_h", "rhs_n", "chb", "cha", "ds_inv",
                 "rhs_s"],
    meta_fields=[],
)
@dataclasses.dataclass
class ReducedSystemT:
    """Entry-major scaled+damped+switch-eliminated node system."""

    Dh: jax.Array            # (36, Nc)
    Bh: jax.Array            # (F, 36, Nc)
    Aba_h: jax.Array         # (36, Ec)
    rhs_n: jax.Array         # (6, Nc)
    chb: jax.Array           # (6, Ec)
    cha: jax.Array           # (6, Ec)
    ds_inv: jax.Array        # (Ec,)
    rhs_s: jax.Array         # (Ec,)


def _row_idx(dt=jnp.int32):
    i = jnp.arange(36, dtype=jnp.int32) // 6
    j = jnp.arange(36, dtype=jnp.int32) % 6
    return i, j


def schur_reduce_t(gn: GNBlocksT, problem: Problem, scale_n, scale_s,
                   lm_n, lm_s) -> ReducedSystemT:
    """scale_n (6,Nc), scale_s (Ec,), lm_n (6,Nc), lm_s (Ec,)."""
    dt = gn.D.dtype
    Nc = gn.D.shape[-1]
    ii, jj = _row_idx()
    si = scale_n[ii]                   # (36, Nc)
    sj = scale_n[jj]
    Dh = gn.D * si * sj
    diag_slots = jnp.arange(0, 36, 7, dtype=jnp.int32)
    Dh = Dh.at[diag_slots].add(lm_n)
    Bh_list = []
    for f in range(problem.fanout):
        s2 = shift_lanes_down(scale_n, f + 1)
        Bh_list.append(gn.B[f] * si * s2[jj])
    Bh = jnp.stack(Bh_list)

    snT = scale_n.T                    # (Nc, 6); row gathers beat lane ones
    sb = snT[problem.loop_b].T         # (6, Ec)
    sa = snT[problem.loop_a].T
    Aba_h = gn.Aba * sb[ii] * sa[jj]
    chb = gn.cb * sb * scale_s[None, :]
    cha = gn.ca * sa * scale_s[None, :]
    ds_h = gn.ds * scale_s * scale_s + lm_s
    ds_inv = 1.0 / ds_h

    # Schur corrections (flat scatter + transpose back)
    w = ds_inv[None, :]
    corr_b = -(w * chb)[ii] * chb[jj]              # (36, Ec)
    corr_a = -(w * cha)[ii] * cha[jj]
    Dc = jnp.zeros((Nc, 36), dt).at[problem.loop_b].add(corr_b.T)
    Dc = Dc.at[problem.loop_a].add(corr_a.T)
    Dh = Dh + Dc.T
    Aba_h = Aba_h - (w * chb)[ii] * cha[jj]

    rhs_s = -gn.g_s * scale_s
    rhs_n = -gn.g_n * scale_n
    corr = ds_inv * rhs_s
    rc = jnp.zeros((Nc, 6), dt).at[problem.loop_b].add((-chb * corr).T)
    rc = rc.at[problem.loop_a].add((-cha * corr).T)
    rhs_n = rhs_n + rc.T

    # frozen-node projection
    free = problem.free_mask[None, :]              # (1, Nc)
    fb = problem.free_mask[problem.loop_b][None, :]
    fa = problem.free_mask[problem.loop_a][None, :]
    eyecol = jnp.zeros((36,), dt).at[jnp.arange(0, 36, 7, dtype=jnp.int32)].set(1.0)
    Dh = Dh * free + eyecol[:, None] * (1.0 - free)
    for f in range(problem.fanout):
        Bh = Bh.at[f].multiply(free * shift_lanes_down(free, f + 1))
    Aba_h = Aba_h * (fb * fa)
    chb = chb * fb
    cha = cha * fa
    rhs_n = rhs_n * free

    return ReducedSystemT(Dh=Dh, Bh=Bh, Aba_h=Aba_h, rhs_n=rhs_n,
                          chb=chb, cha=cha, ds_inv=ds_inv, rhs_s=rhs_s)


def _bmv(Bf, x):          # y_i = sum_j Bf[6i+j] * x[j]
    return jnp.stack([
        sum(Bf[6 * i + j] * x[j] for j in range(6)) for i in range(6)
    ])


def _bmv_T(Bf, x):        # y_j = sum_i Bf[6i+j] * x[i]
    return jnp.stack([
        sum(Bf[6 * i + j] * x[i] for i in range(6)) for j in range(6)
    ])


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["perm", "src", "bounds"],
    meta_fields=[],
)
@dataclasses.dataclass
class SortedIncidence:
    """Destination-sorted duplicated loop incidence, the key to the
    scatter-free loop matvec (see loop_matvec_sorted). Pure function of
    (loop_b, loop_a); computed once per solve inside the jitted program."""

    perm: jax.Array      # (2Ec,) i32: dup-edge slot -> original dup index
    src: jax.Array       # (2Ec,) i32: source node per sorted dup edge
    bounds: jax.Array    # (Nc+1,) i32: segment boundaries per dest node


def build_sorted_incidence(problem: Problem) -> SortedIncidence:
    dest = jnp.concatenate([problem.loop_b, problem.loop_a])
    src = jnp.concatenate([problem.loop_a, problem.loop_b])
    perm = jnp.argsort(dest, stable=True).astype(jnp.int32)
    dest_s = dest[perm]
    bounds = jnp.searchsorted(
        dest_s, jnp.arange(problem.n_cap + 1, dtype=dest.dtype))
    return SortedIncidence(perm=perm, src=src[perm],
                           bounds=bounds.astype(jnp.int32))


def dup_sorted_blocks(red: ReducedSystemT, inc: SortedIncidence):
    """(2Ec,6,6) dest-sorted loop blocks: Aba for the b-side copies, Aba^T
    for the a-side copies. Rebuilt once per LM iteration (the scaled blocks
    change); read once per CG iteration by loop_matvec_sorted.

    Built entirely in the COMPACT entry-major (36, 2Ec) layout (entry
    permutation = transpose, lane concat, lane gather) and reshaped at the
    very end: materializing/gathering the (2Ec,6,6) AoS form would stream
    the (8,128)-tile-padded layout (~28x the bytes) every LM iteration."""
    ii, jj = _row_idx()
    perm36 = jj * 6 + ii                               # 6x6 transpose
    dup36 = jnp.concatenate([red.Aba_h, red.Aba_h[perm36]], axis=1)
    sorted36 = dup36[:, inc.perm]                      # (36, 2Ec)
    return jnp.moveaxis(sorted36, 0, -1).reshape(-1, 6, 6)


def dup_sorted_blocks36(red: ReducedSystemT, inc: SortedIncidence):
    """(36, 2Ec) dest-sorted duplicated loop blocks, entry-major end to end
    (never materializes a (K,6,6) tensor — whose (8,128)-tiled layout costs
    ~28x the bytes every read inside a jitted loop body)."""
    ii, jj = _row_idx()
    perm36 = jj * 6 + ii                               # 6x6 transpose
    dup36 = jnp.concatenate([red.Aba_h, red.Aba_h[perm36]], axis=1)
    return dup36[:, inc.perm]                          # (36, 2Ec)


def loop_matvec_sorted36(inc: SortedIncidence, blk36, p_n):
    """Fully entry-major scatter-free loop matvec: row-gather sources,
    36 lane multiply-adds against (36, 2Ec) blocks, lane cumsum, sorted
    lane boundary gathers. See loop_matvec_sorted for why scatter-free."""
    pT = p_n.T                                         # (Nc, 6)
    xsT = pT[inc.src].T                                # (6, 2Ec)
    vT = jnp.stack([
        sum(blk36[6 * i + j] * xsT[j] for j in range(6)) for i in range(6)
    ])                                                 # (6, 2Ec)
    cs = jnp.concatenate(
        [jnp.zeros((6, 1), vT.dtype), jnp.cumsum(vT, axis=1)], axis=1)
    hi = cs.at[:, inc.bounds[1:]].get(indices_are_sorted=True)
    lo = cs.at[:, inc.bounds[:-1]].get(indices_are_sorted=True)
    return hi - lo


def loop_matvec_sorted(inc: SortedIncidence, blocks_dup, p_n):
    """Scatter-free loop-edge matvec: y = A_loop p via dest-sorted
    duplicated edges + cumulative-sum segment reduction.

    Why: XLA's TPU scatter-add of (Ec,6) payloads costs ~0.24 ms at bench
    scale (16k edges) — ~80% of a whole CG iteration — and sorted-index
    hints don't help. With edges duplicated (one copy per direction) and
    pre-sorted by destination, the scatter becomes an exclusive-prefix-sum
    plus two SORTED boundary gathers, which measure ~free. Net: the loop
    matvec drops 0.33 -> 0.16 ms and a full CG iteration 0.45 -> 0.25 ms
    (benchmarks/exp_loop_matvec.py). Masked/padded edges carry zero blocks
    and land in node 0's segment — they add exact zeros."""
    pT = p_n.T                                        # (Nc, 6)
    xs = pT[inc.src]                                  # (2Ec, 6)
    v = jnp.einsum("eij,ej->ei", blocks_dup, xs)      # dest-sorted payload
    csum = jnp.concatenate(
        [jnp.zeros((1, 6), v.dtype), jnp.cumsum(v, axis=0)], axis=0)
    hi = csum.at[inc.bounds[1:]].get(indices_are_sorted=True)
    lo = csum.at[inc.bounds[:-1]].get(indices_are_sorted=True)
    return (hi - lo).T


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["slot_edge", "slot_src", "onehot"],
    meta_fields=["tile_k", "fake_gather", "gather_mode"],
)
@dataclasses.dataclass
class TiledIncidence:
    """Dest-tile-padded duplicated loop incidence — the scatter-free,
    cumsum-free loop matvec (loop_matvec_tiled).

    The 2Ec duplicated edges (one copy per direction) are bucketed by
    destination-node TILE (128 nodes per tile) into a static (T, K) slot
    grid (K = tile_k, a static capacity >= the max per-tile load — see
    tile_k_for). The segment reduction then becomes ONE batched matmul
    against a solve-invariant one-hot tensor: no scatter, no cumsum, no
    boundary gathers — the three ops that dominated every previous loop
    matvec formulation (~0.26 ms of the 0.33 ms in-context CG iteration at
    bench scale; see BASELINE.md round-3 notes).

    slot_edge (T*K,) i32: dup-edge index per slot (2Ec = zero-block padding)
    slot_src  (T*K,) i32: source node per slot (0 for padding slots)
    onehot    (T, K, 128): S[t, k, n] = 1 iff slot t*K+k's dest == t*128+n.
              Padding slots in tile 0 alias node 0 but carry the zero
              block, contributing exact zeros.
    """

    slot_edge: jax.Array
    slot_src: jax.Array
    onehot: jax.Array
    tile_k: int
    # diagnostic ONLY: skip the per-iteration source gather (WRONG results)
    # to attribute in-context cost between gather and reduction
    fake_gather: bool = False
    # "rows" (row gather + transpose back) | "stack6" (six 1-D gathers,
    # directly entry-major)
    gather_mode: str = "stack6"

    TILE_N = 128


def tile_k_for(loop_b, loop_a, n_cap: int, bucket: int = 128,
               loop_mask=None) -> int:
    """Host-side static tile capacity: max VALID dup-edge load over 128-node
    dest tiles, rounded up to `bucket` (each K value is its own compiled
    program, so bucketing amortizes compiles like the capacity buckets).
    Masked/padding edges are excluded — they all alias node 0 and would
    otherwise blow the capacity up ~25x (their blocks are zero, and
    build_tiled_incidence drops them the same way)."""
    import numpy as np
    dest = np.concatenate([np.asarray(loop_b), np.asarray(loop_a)])
    if loop_mask is not None:
        m = np.asarray(loop_mask) > 0.5
        dest = dest[np.concatenate([m, m])]
    tiles = dest // TiledIncidence.TILE_N
    n_tiles = max(1, -(-n_cap // TiledIncidence.TILE_N))
    load = np.bincount(tiles, minlength=n_tiles).max() if dest.size else 0
    return int(max(bucket, -(-int(load) // bucket) * bucket))


def tile_k_rule(n_cap: int, e_cap: int, bucket: int = 128) -> int:
    """Data-free STICKY tile capacity for a (n_cap, e_cap) bucket: twice the
    mean duplicated-edge load per 128-node dest tile at FULL edge capacity,
    floored at one bucket. This is the value engine.warmup() pre-compiles
    AND the engine's first trigger in a bucket uses, so the warmed program
    is exactly the one the stream dispatches (tile_k is a static program
    argument — a data-derived value that drifts mid-stream would trigger
    20-90 s trigger-time compiles over the tunnel, the coarse_group
    lesson). Streams whose live edge distribution concentrates beyond the
    2x-mean headroom bump the sticky value by doubling (engine._sticky_
    tile_k) — a rare one-time recompile; overflow would otherwise silently
    drop edges (build_tiled_incidence routes overflow slots to drop)."""
    tiles = max(1, -(-n_cap // TiledIncidence.TILE_N))
    mean2 = (4 * e_cap + tiles - 1) // tiles      # ceil(2 * mean dup load)
    return int(max(bucket, -(-mean2 // bucket) * bucket))


def build_tiled_incidence(problem: Problem, tile_k: int) -> TiledIncidence:
    """Device-side slot assignment (once per solve, inside the jitted
    program): stable-sort dup edges by dest tile, rank within tile, scatter
    dup indices into the (T*K,) slot grid. tile_k MUST be >= the max
    per-tile load (tile_k_for) — overflow slots would silently drop edges."""
    TN = TiledIncidence.TILE_N
    Nc = problem.n_cap
    T = -(-Nc // TN)
    dest = jnp.concatenate([problem.loop_b, problem.loop_a])
    src = jnp.concatenate([problem.loop_a, problem.loop_b])
    E2 = dest.shape[0]
    valid = jnp.concatenate([problem.loop_mask, problem.loop_mask]) > 0.5
    # masked/padding edges (zero blocks, all aliasing node 0) are excluded
    # from the slot grid entirely: sort them to a virtual tile PAST the end
    # so they never consume (or overflow) tile 0's capacity
    tile = jnp.where(valid, dest // TN, T)
    order = jnp.argsort(tile, stable=True).astype(jnp.int32)
    tile_s = tile[order]
    starts = jnp.searchsorted(tile_s, jnp.arange(T, dtype=tile_s.dtype))
    rank = jnp.arange(E2, dtype=jnp.int32) - starts[tile_s].astype(jnp.int32)
    slot = tile_s.astype(jnp.int32) * tile_k + rank
    # overflow (rank >= tile_k) and the invalid virtual tile must NOT spill
    # into other tiles' slots: route them out of bounds so mode="drop"
    # discards them (the engine sizes tile_k via tile_k_for so real edges
    # are never dropped in valid use)
    slot = jnp.where((rank < tile_k) & (tile_s < T), slot, T * tile_k)
    slot_edge = jnp.full((T * tile_k,), E2, jnp.int32).at[slot].set(
        order.astype(jnp.int32), mode="drop")
    src_pad = jnp.concatenate([src, jnp.zeros((1,), src.dtype)])
    dest_pad = jnp.concatenate([dest, jnp.zeros((1,), dest.dtype)])
    slot_src = src_pad[slot_edge].astype(jnp.int32)
    destrel = (dest_pad[slot_edge].astype(jnp.int32)
               - (jnp.arange(T * tile_k, dtype=jnp.int32) // tile_k) * TN)
    onehot = (destrel[:, None] == jnp.arange(TN, dtype=jnp.int32)[None, :])
    onehot = onehot.astype(problem.dtype).reshape(T, tile_k, TN)
    return TiledIncidence(slot_edge=slot_edge, slot_src=slot_src,
                          onehot=onehot, tile_k=tile_k)


def tiled_blocks_rows(red: ReducedSystemT, inc: TiledIncidence):
    """(T*K, 36) slot-ordered duplicated loop blocks in ROW form (for
    loop_matvec_tiled_rows), rebuilt once per LM iteration."""
    ii, jj = _row_idx()
    perm36 = (jj * 6 + ii).astype(jnp.int32)
    rows = red.Aba_h.T                                  # (Ec, 36)
    dup_rows = jnp.concatenate(
        [rows, rows[:, perm36],
         jnp.zeros((1, 36), rows.dtype)], axis=0)       # (2Ec+1, 36)
    return dup_rows[inc.slot_edge]                      # (T*K, 36)


def tiled_blocks36(red: ReducedSystemT, inc: TiledIncidence):
    """(36, T*K) slot-ordered duplicated loop blocks (Aba for b-side copies,
    Aba^T for a-side), rebuilt once per LM iteration. Row-form gather +
    one transpose (lane gathers of wide entry-major tensors are ~10x
    slower than row gathers)."""
    ii, jj = _row_idx()
    perm36 = (jj * 6 + ii).astype(jnp.int32)
    rows = red.Aba_h.T                                  # (Ec, 36)
    dup_rows = jnp.concatenate(
        [rows, rows[:, perm36],
         jnp.zeros((1, 36), rows.dtype)], axis=0)       # (2Ec+1, 36)
    return dup_rows[inc.slot_edge].T                    # (36, T*K)


def loop_matvec_tiled_rows(inc: TiledIncidence, blkrows, p_n):
    """y_loop via the tile-padded one-hot reduction, entirely in ROW form —
    the only gather pattern XLA lowers fast in-context is a row gather
    consumed AS rows (sorted2's gathers measure ~free; the same gather
    followed by a transpose-back to entry-major costs ~0.7 ms/iteration).

    blkrows: (T*K, 36) slot-ordered dup blocks (tiled_blocks36(...).T — kept
    in row form). Per dest tile: tmp[k, 6i+j] = blkrows[k, 6i+j] *
    xs_rows[k, j]; W_t (36, TN) = tmp_t^T @ S_t (MXU contraction over the
    slot dim); y_t (6, TN) = Z^T W_t with Z the constant 36->6 row-sum
    combine. No transposes, no cumsum, no scatter."""
    TN = TiledIncidence.TILE_N
    T, K, _ = inc.onehot.shape
    dt = p_n.dtype
    pT = p_n.T                                          # (Nc, 6)
    xs_rows = pT[inc.slot_src]                          # (T*K, 6)
    xs6 = jnp.tile(xs_rows, (1, 6))                     # (T*K, 36)
    # The one-hot contraction is the HBM-dominant op of the whole CG
    # iteration (the (T, K, TN) one-hot streams ~21 MB/matvec at bench
    # scale in f32). When the incidence carries a bf16 one-hot (exact:
    # values are 0/1), run the MXU contraction in bf16 with f32
    # accumulation — halves both operands' traffic; the tmp cast is
    # loop-variant so it fuses into the dot instead of hoisting.
    od = inc.onehot.dtype
    tmp = (blkrows * xs6).reshape(T, K, 36).astype(od)
    W = jax.lax.dot_general(
        tmp, inc.onehot,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=dt,
    )                                                   # (T, 36, TN)
    W = W.astype(dt)
    Z = jnp.zeros((36, 6), dt).at[jnp.arange(36, dtype=jnp.int32), jnp.arange(36, dtype=jnp.int32) // 6].set(
        1.0)
    y = jnp.einsum("ci,tcn->itn", Z, W)                 # (6, T, TN)
    return y.reshape(6, T * TN)[:, : p_n.shape[-1]]


def loop_matvec_tiled_rows6(inc: TiledIncidence, blkrows, p_n):
    """tiledrows with the j-reduction hoisted BEFORE the one-hot dot: the
    per-slot 6-vector y_k[i] = sum_j A_k[i,j] x_k[j] is formed first (one
    fused multiply+reduce), so the MXU contraction is (T,K,6)x(T,K,TN) —
    6x less dot work than tiledrows' (T,K,36) form — and the 36->6 combine
    einsum disappears. Fewer, smaller ops: the loop matvec is op-latency
    bound in-context (bf16 operand halving measured ZERO change)."""
    TN = TiledIncidence.TILE_N
    T, K, _ = inc.onehot.shape
    dt = p_n.dtype
    pT = p_n.T                                          # (Nc, 6)
    xs_rows = pT[inc.slot_src]                          # (T*K, 6)
    xs6 = jnp.tile(xs_rows, (1, 6))                     # (T*K, 36)
    tmp6 = (blkrows * xs6).reshape(T * K, 6, 6).sum(-1)
    W = jax.lax.dot_general(
        tmp6.reshape(T, K, 6).astype(inc.onehot.dtype), inc.onehot,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=dt,
    ).astype(dt)                                        # (T, 6, TN)
    y = jnp.swapaxes(W, 0, 1)                           # (6, T, TN)
    return y.reshape(6, T * TN)[:, : p_n.shape[-1]]


def loop_matvec_tiled(inc: TiledIncidence, blk36, p_n):
    """y_loop = A_loop p via the tile-padded one-hot reduction: row-gather
    sources, 36 lane FMAs, ONE batched matmul per solve-invariant one-hot.
    p_n (6, Nc) -> (6, Nc)."""
    TN = TiledIncidence.TILE_N
    T, K, _ = inc.onehot.shape
    if inc.fake_gather:
        # diagnostic: no gather — replicate p lanes (WRONG results)
        reps = -(-(T * K) // p_n.shape[-1])
        xs = jnp.tile(p_n, (1, reps))[:, : T * K]
    elif inc.gather_mode == "stack6":
        # six 1-D gathers from p's rows: lands DIRECTLY in entry-major,
        # avoiding the transpose-back of a (T*K, 6) row gather (measured
        # ~0.7 ms in-context — 20x its isolated cost)
        xs = jnp.stack([p_n[j][inc.slot_src] for j in range(6)])
    else:
        pT = p_n.T                                      # (Nc, 6)
        xs = pT[inc.slot_src].T                         # (6, T*K)
    v = jnp.stack([
        sum(blk36[6 * i + j] * xs[j] for j in range(6)) for i in range(6)
    ])                                                  # (6, T*K)
    y = jax.lax.dot_general(
        v.reshape(6, T, K), inc.onehot,
        dimension_numbers=(((2,), (1,)), ((1,), (0,))),
        preferred_element_type=p_n.dtype,
    )                                                   # (T, 6, TN)
    return jnp.moveaxis(y, 0, 1).reshape(6, T * TN)[:, : p_n.shape[-1]]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["perm_b", "bounds_b", "perm_a", "bounds_a"],
    meta_fields=[],
)
@dataclasses.dataclass
class SortedIncidence2:
    """Per-endpoint sorted incidence WITHOUT edge duplication: the v0
    einsums stay untouched (they read the (Ec,6,6) blocks once) and only
    the two scatter-adds become permute + cumsum + boundary-diff."""

    perm_b: jax.Array     # (Ec,) argsort of loop_b
    bounds_b: jax.Array   # (Nc+1,)
    perm_a: jax.Array
    bounds_a: jax.Array


def build_sorted_incidence2(problem: Problem) -> SortedIncidence2:
    def side(idx):
        perm = jnp.argsort(idx, stable=True).astype(jnp.int32)
        bounds = jnp.searchsorted(
            idx[perm], jnp.arange(problem.n_cap + 1, dtype=idx.dtype))
        return perm, bounds.astype(jnp.int32)
    pb, bb = side(problem.loop_b)
    pa, ba = side(problem.loop_a)
    return SortedIncidence2(perm_b=pb, bounds_b=bb, perm_a=pa, bounds_a=ba)


def _cumsum_segments(v, perm, bounds):
    """sum of v rows per destination node: permute to dest-sorted order,
    exclusive prefix sum, boundary differences (scatter-free)."""
    vs = v[perm]
    csum = jnp.concatenate(
        [jnp.zeros((1, v.shape[1]), v.dtype), jnp.cumsum(vs, axis=0)],
        axis=0)
    hi = csum.at[bounds[1:]].get(indices_are_sorted=True)
    lo = csum.at[bounds[:-1]].get(indices_are_sorted=True)
    return hi - lo


def loop_matvec_sorted2(inc: SortedIncidence2, red: ReducedSystemT,
                        problem: Problem, p_n, Aba_aos=None,
                        fake_gather: bool = False):
    """Loop matvec with v0's gathers/einsums but scatter-free reduction.
    fake_gather is a diagnostic ONLY (wrong results): replaces the two
    row gathers with tiled copies to attribute in-context cost."""
    if Aba_aos is None:
        Aba_aos = t_blocks_to_aos(red.Aba_h)
    pT = p_n.T
    if fake_gather:
        reps = -(-problem.e_cap // pT.shape[0])
        xb = jnp.tile(pT, (reps, 1))[: problem.e_cap]
        xa = xb
    else:
        xb = pT[problem.loop_b]
        xa = pT[problem.loop_a]
    vb = jnp.einsum("eij,ej->ei", Aba_aos, xa)
    va = jnp.einsum("eij,ei->ej", Aba_aos, xb)
    yb = _cumsum_segments(vb, inc.perm_b, inc.bounds_b)
    ya = _cumsum_segments(va, inc.perm_a, inc.bounds_a)
    return (yb + ya).T


def loop_matvec_t(red: ReducedSystemT, problem: Problem, p_n, Aba_aos=None):
    """Loop-edge rows of the reduced matvec (scatter-add fallback; the hot
    path uses loop_matvec_sorted).

    Formulation matters 2.5x in-context: row-gather into (Ec,6) AoS, one
    batched einsum per direction against the AoS loop blocks, flat scatter —
    measured 0.41 ms/iteration inside the LM loop vs 1.05 ms for the
    entry-major _bmv stacks. Pass Aba_aos = t_blocks_to_aos(red.Aba_h)
    precomputed (loop-invariant) when calling from inside CG."""
    dt = p_n.dtype
    Nc = p_n.shape[-1]
    if Aba_aos is None:
        Aba_aos = t_blocks_to_aos(red.Aba_h)        # (Ec,6,6)
    pT = p_n.T                         # (Nc, 6)
    xb = pT[problem.loop_b]            # (Ec, 6)
    xa = pT[problem.loop_a]
    vb = jnp.einsum("eij,ej->ei", Aba_aos, xa)
    va = jnp.einsum("eij,ei->ej", Aba_aos, xb)
    yl = jnp.zeros((Nc, 6), dt).at[problem.loop_b].add(vb)
    yl = yl.at[problem.loop_a].add(va)
    return yl.T


def band_matvec_t(red: ReducedSystemT, problem: Problem, p_n):
    """Band rows of the reduced matvec (XLA fused form)."""
    F = problem.fanout
    y = _bmv(red.Dh, p_n)
    for f in range(F):
        y = y + _bmv(red.Bh[f], shift_lanes_down(p_n, f + 1))
        y = y + shift_lanes_up(_bmv_T(red.Bh[f], p_n), f + 1)
    return y


def reduced_matvec_t(red: ReducedSystemT, problem: Problem, p_n,
                     impl: str = "xla", Bup=None, Aba_aos=None,
                     inc=None, blocks_dup=None):
    """y = H_red p, p (6, Nc) — the lane-parallel hot op of every CG iter.

    impl="pallas" runs the band part through the fused Pallas kernel
    (ops/pallas_band.py): measured ~0.1 ms/iteration faster INSIDE the LM
    loop, where XLA's in-context codegen is ~2.5x slower than isolated (the
    kernel's explicit layout is immune). Pass Bup = shift_band_up(red.Bh)
    precomputed (loop-invariant) when calling from inside CG.

    Loop rows: pass inc = build_sorted_incidence(problem) (per solve) and
    blocks_dup = dup_sorted_blocks(red, inc) (per LM iteration) to take the
    scatter-free path (~1.8x faster CG iterations); otherwise falls back to
    the scatter-add form (optionally with Aba_aos hoisted)."""
    if inc == "none":
        # diagnostic: band rows only (drops the loop blocks — WRONG results,
        # used to decompose in-context per-iteration cost)
        yl = 0.0
    elif isinstance(inc, TiledIncidence):
        if inc.gather_mode == "rows6":
            if blocks_dup is None:
                blocks_dup = tiled_blocks_rows(red, inc)
            yl = loop_matvec_tiled_rows6(inc, blocks_dup, p_n)
        elif inc.gather_mode == "rowsdot":
            if blocks_dup is None:
                blocks_dup = tiled_blocks_rows(red, inc)
            yl = loop_matvec_tiled_rows(inc, blocks_dup, p_n)
        else:
            if blocks_dup is None:
                blocks_dup = tiled_blocks36(red, inc)
            yl = loop_matvec_tiled(inc, blocks_dup, p_n)
    elif isinstance(inc, SortedIncidence2):
        yl = loop_matvec_sorted2(inc, red, problem, p_n, Aba_aos,
                                 fake_gather=(impl == "s2ng"))
    elif inc is not None:
        if blocks_dup is None:
            blocks_dup = dup_sorted_blocks36(red, inc)
        if blocks_dup.ndim == 2:        # (36, 2Ec) entry-major
            yl = loop_matvec_sorted36(inc, blocks_dup, p_n)
        else:                           # (2Ec, 6, 6) AoS
            yl = loop_matvec_sorted(inc, blocks_dup, p_n)
    else:
        yl = loop_matvec_t(red, problem, p_n, Aba_aos)
    if impl == "pallas":
        from solve_keyframe_pose_graph_tpu.ops import pallas_band
        if Bup is None:
            Bup = pallas_band.shift_band_up(red.Bh)
        return pallas_band.band_matvec_pre(red.Dh, red.Bh, Bup, p_n,
                                           block_n=256) + yl
    return band_matvec_t(red, problem, p_n) + yl


def recover_switches_t(red: ReducedSystemT, problem: Problem, x_n):
    xT = x_n.T
    xb = xT[problem.loop_b].T
    xa = xT[problem.loop_a].T
    coupling = jnp.sum(red.chb * xb, axis=0) + jnp.sum(red.cha * xa, axis=0)
    return red.ds_inv * (red.rhs_s - coupling)


def t_blocks_to_aos(Dt):
    """(36, N) -> (N, 6, 6) (for the BCR bridge / tests)."""
    return jnp.moveaxis(Dt, 0, -1).reshape(Dt.shape[-1], 6, 6)


# ---------------------------------------------------------------------------
# scaled, damped matvec:  y = S H (S p) + lm ⊙ p
# ---------------------------------------------------------------------------


def matvec(gn: GNBlocks, problem: Problem, p_n, p_s, scale_n, scale_s,
           lm_n, lm_s):
    """Apply the Jacobi-scaled, LM-damped GN Hessian.

    p_n (Nc,6), p_s (Ec,) -> (y_n, y_s). scale_* are Ceres jacobi-scaling
    columns 1/(1+sqrt(diag)); lm_* are the additive damping diagonals
    (scale^2 * diag / radius, clamped)."""
    F = problem.fanout
    x_n = p_n * scale_n
    x_s = p_s * scale_s

    y = jnp.einsum("uij,uj->ui", gn.D, x_n)
    for f in range(F):
        Bf = gn.B[f]
        y = y + jnp.einsum("uij,uj->ui", Bf, shift_down(x_n, f + 1))
        y = y + shift_up(jnp.einsum("uij,ui->uj", Bf, x_n), f + 1)

    xb = x_n[problem.loop_b]
    xa = x_n[problem.loop_a]
    y = y.at[problem.loop_b].add(
        jnp.einsum("eij,ej->ei", gn.Aba, xa) + gn.cb * x_s[:, None]
    )
    y = y.at[problem.loop_a].add(
        jnp.einsum("eij,ei->ej", gn.Aba, xb) + gn.ca * x_s[:, None]
    )
    y_s = gn.ds * x_s + jnp.sum(gn.cb * xb, axis=-1) + jnp.sum(gn.ca * xa, axis=-1)

    return y * scale_n + lm_n * p_n, y_s * scale_s + lm_s * p_s


# ---------------------------------------------------------------------------
# switch-variable Schur elimination (reduced node-only system)
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["Dh", "Bh", "Aba_h", "rhs_n", "chb", "cha", "ds_inv", "rhs_s"],
    meta_fields=[],
)
@dataclasses.dataclass
class ReducedSystem:
    """Scaled + damped + switch-eliminated node system.

    Each switch variable couples only its own edge's two nodes, so its Schur
    elimination is exact and O(E): the TPU-friendly analog of Ceres' Schur
    trick (switches play the role of points). CG then runs over nodes only;
    switches are recovered in closed form afterwards.

    Dh    (Nc,6,6): diagonal blocks (scaled, damped, Schur-corrected)
    Bh    (F,Nc,6,6): scaled odometry band
    Aba_h (Ec,6,6): scaled loop blocks, Schur-corrected
    rhs_n (Nc,6): reduced RHS (-g reduced onto nodes)
    chb/cha (Ec,6): scaled node<->switch couplings (for recovery)
    ds_inv (Ec,): inverse damped switch diagonal
    rhs_s (Ec,): switch RHS (-g_s scaled)
    """

    Dh: jax.Array
    Bh: jax.Array
    Aba_h: jax.Array
    rhs_n: jax.Array
    chb: jax.Array
    cha: jax.Array
    ds_inv: jax.Array
    rhs_s: jax.Array


def schur_reduce(gn: GNBlocks, problem: Problem, scale_n, scale_s, lm_n, lm_s
                 ) -> ReducedSystem:
    dt = gn.D.dtype
    # scale + damp node diagonal
    Dh = gn.D * scale_n[:, :, None] * scale_n[:, None, :]
    Dh = Dh + jnp.eye(6, dtype=dt) * lm_n[:, None, :]
    # scale band: Bh[f,u] couples u with u-f
    Bh_list = []
    for f in range(problem.fanout):
        s2 = shift_down(scale_n, f + 1)
        Bh_list.append(gn.B[f] * scale_n[:, :, None] * s2[:, None, :])
    Bh = jnp.stack(Bh_list)
    # scale loop blocks and couplings
    sb = scale_n[problem.loop_b]
    sa = scale_n[problem.loop_a]
    Aba_h = gn.Aba * sb[:, :, None] * sa[:, None, :]
    chb = gn.cb * sb * scale_s[:, None]
    cha = gn.ca * sa * scale_s[:, None]
    ds_h = gn.ds * scale_s * scale_s + lm_s
    ds_inv = 1.0 / ds_h

    # Schur corrections
    w = ds_inv[:, None, None]
    Dh = scatter_add_blocks(Dh, problem.loop_b,
                            -w * chb[:, :, None] * chb[:, None, :])
    Dh = scatter_add_blocks(Dh, problem.loop_a,
                            -w * cha[:, :, None] * cha[:, None, :])
    Aba_h = Aba_h - w * chb[:, :, None] * cha[:, None, :]

    # RHS: b = -g (scaled); reduced bn' = bn - Hns Hss^-1 bs
    rhs_s = -gn.g_s * scale_s
    rhs_n = -gn.g_n * scale_n
    corr = ds_inv * rhs_s
    rhs_n = rhs_n.at[problem.loop_b].add(-chb * corr[:, None])
    rhs_n = rhs_n.at[problem.loop_a].add(-cha * corr[:, None])

    # project out frozen nodes (free_mask = 0): rows/cols -> 0, diag -> I,
    # rhs -> 0, so their CG update is exactly zero while their poses still
    # constrain free nodes through the residuals (the reference's
    # SetParameterBlockConstant semantics for checkpoint-restored nodes)
    free = problem.free_mask
    fb = free[problem.loop_b]
    fa = free[problem.loop_a]
    Dh = Dh * free[:, None, None] + jnp.eye(6, dtype=dt) * (1.0 - free)[:, None, None]
    for f in range(problem.fanout):
        Bh = Bh.at[f].multiply(
            (free * shift_down(free, f + 1))[:, None, None]
        )
    Aba_h = Aba_h * (fb * fa)[:, None, None]
    chb = chb * fb[:, None]
    cha = cha * fa[:, None]
    rhs_n = rhs_n * free[:, None]

    return ReducedSystem(Dh=Dh, Bh=Bh, Aba_h=Aba_h, rhs_n=rhs_n,
                         chb=chb, cha=cha, ds_inv=ds_inv, rhs_s=rhs_s)


def reduced_matvec(red: ReducedSystem, problem: Problem, p_n):
    """y = H_reduced p over nodes only (scaling/damping baked in).
    Scatter-free: loop-edge rows reduce through incidence gathers."""
    F = problem.fanout
    y = jnp.einsum("uij,uj->ui", red.Dh, p_n)
    for f in range(F):
        Bf = red.Bh[f]
        y = y + jnp.einsum("uij,uj->ui", Bf, shift_down(p_n, f + 1))
        y = y + shift_up(jnp.einsum("uij,ui->uj", Bf, p_n), f + 1)
    xb = p_n[problem.loop_b]
    xa = p_n[problem.loop_a]
    y = y.at[problem.loop_b].add(jnp.einsum("eij,ej->ei", red.Aba_h, xa))
    y = y.at[problem.loop_a].add(jnp.einsum("eij,ei->ej", red.Aba_h, xb))
    return y


def recover_switches(red: ReducedSystem, problem: Problem, x_n):
    """xs = Hss^-1 (bs - Hsn xn), then un-scale happens in the caller."""
    xb = x_n[problem.loop_b]
    xa = x_n[problem.loop_a]
    coupling = jnp.sum(red.chb * xb, axis=-1) + jnp.sum(red.cha * xa, axis=-1)
    return red.ds_inv * (red.rhs_s - coupling)


def block_jacobi_precond(gn: GNBlocks, scale_n, scale_s, lm_n, lm_s):
    """Inverse 6x6 diagonal blocks of the scaled+damped system (+ switch
    scalars). The analog of Ceres' JACOBI/ SCHUR_JACOBI preconditioners, on
    6x6 pose blocks."""
    M = gn.D * scale_n[:, :, None] * scale_n[:, None, :]
    M = M + jnp.eye(6, dtype=M.dtype) * lm_n[:, None, :]  # + diag(lm_n)
    Minv = jnp.linalg.inv(M)
    ms = gn.ds * scale_s * scale_s + lm_s
    return Minv, 1.0 / ms


def apply_precond(Minv, ms_inv, r_n, r_s):
    return jnp.einsum("uij,uj->ui", Minv, r_n), ms_inv * r_s
