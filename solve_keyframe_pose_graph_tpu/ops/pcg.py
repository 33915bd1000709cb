"""Preconditioned conjugate gradients over (node, switch) vector pairs.

The inner linear solver of the LM engine — replaces Ceres'
SPARSE_NORMAL_CHOLESKY (PoseGraphSLAM.cpp:1270) with an iterative method
whose per-iteration work is the structured matvec in ops/gn.py (banded
shifts + batched 6x6 matmuls + one gather/scatter for loop blocks): the
shape that streams at HBM speed-of-light on TPU.

Entirely jittable: lax.while_loop with a static iteration cap and a
relative-residual stopping rule.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class PCGResult(NamedTuple):
    x_n: jax.Array
    x_s: jax.Array
    iterations: jax.Array      # int32
    rel_residual: jax.Array    # final ||r|| / ||b||


class PCGNodesResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array
    rel_residual: jax.Array
    r: jax.Array               # final residual b - A x (exact by recurrence)


def pcg_nodes(
    matvec: Callable,          # x -> H x
    precond: Callable,         # r -> M^-1 r
    b: jax.Array,
    *,
    max_iterations: int,
    r_tolerance: float,
    q_tolerance: float = 0.0,
    x0: jax.Array | None = None,   # warm start (e.g. previous LM step)
) -> PCGNodesResult:
    """PCG over a single (node) vector with Ceres' two stopping rules:

    * residual rule: ||r|| <= r_tolerance * ||b||
    * Q rule (conjugate_gradients_solver.cc): track the quadratic model
      Q(x) = -0.5 x.(b + r); stop when the per-iteration relative
      improvement zeta = k (Q_k - Q_{k-1}) / Q_k drops below q_tolerance.
      This is the "forcing sequence" that makes inexact-Newton LM cheap:
      inner iterations stop as soon as they no longer move the outer model.
    """
    dt = b.dtype
    b_norm = jnp.sqrt(jnp.vdot(b, b))
    threshold = r_tolerance * b_norm
    # trace-time gate: with the Q rule off (a plain-0 python float) skip its
    # per-iteration vdot entirely instead of computing a dead zeta
    use_q = not (isinstance(q_tolerance, (int, float)) and q_tolerance == 0)

    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        x = x0
        r = b - matvec(x0)
    z = precond(r)
    p = z
    rz = jnp.vdot(r, z)
    Q0 = -0.5 * jnp.vdot(x, b + r)   # 0 for a cold start

    def cond(state):
        x, r, p, rz, Q0, k, done = state
        return jnp.logical_and(k < max_iterations, jnp.logical_not(done))

    def body(state):
        x, r, p, rz, Q0, k, done = state
        Ap = matvec(p)
        pAp = jnp.vdot(p, Ap)
        alpha = rz / jnp.where(pAp <= 0, jnp.asarray(1.0, dt), pAp)
        alpha = jnp.where(pAp <= 0, jnp.asarray(0.0, dt), alpha)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.where(rz == 0, jnp.asarray(1.0, dt), rz)
        p = z + beta * p

        k = k + 1
        if use_q:
            Q1 = -0.5 * jnp.vdot(x, b + r)
            zeta = (k.astype(dt) * (Q1 - Q0)
                    / jnp.where(Q1 == 0, jnp.asarray(1.0, dt), Q1))
            q_done = jnp.logical_and(q_tolerance > 0,
                                     jnp.abs(zeta) < q_tolerance)
        else:
            Q1 = Q0
            q_done = jnp.asarray(False)
        r_done = jnp.sqrt(jnp.vdot(r, r)) <= threshold
        breakdown = pAp <= 0
        done = jnp.logical_or(jnp.logical_or(q_done, r_done), breakdown)
        return x, r, p, rz_new, Q1, k, done

    x, r, p, rz, Q0, k, done = jax.lax.while_loop(
        cond, body,
        (x, r, p, rz, Q0, jnp.int32(0), jnp.asarray(False)),
    )
    r_norm = jnp.sqrt(jnp.vdot(r, r))
    rel = r_norm / jnp.where(b_norm == 0, jnp.asarray(1.0, dt), b_norm)
    return PCGNodesResult(x, k, rel, r)


def _dot(an, as_, bn, bs):
    return jnp.vdot(an, bn) + jnp.vdot(as_, bs)


def pcg(
    matvec: Callable,          # (p_n, p_s) -> (y_n, y_s)
    precond: Callable,         # (r_n, r_s) -> (z_n, z_s)
    b_n: jax.Array,
    b_s: jax.Array,
    *,
    max_iterations: int,
    tolerance: float,
) -> PCGResult:
    dt = b_n.dtype
    b_norm = jnp.sqrt(_dot(b_n, b_s, b_n, b_s))
    # absolute threshold on ||r||
    threshold = tolerance * b_norm

    x_n = jnp.zeros_like(b_n)
    x_s = jnp.zeros_like(b_s)
    r_n, r_s = b_n, b_s
    z_n, z_s = precond(r_n, r_s)
    p_n, p_s = z_n, z_s
    rz = _dot(r_n, r_s, z_n, z_s)

    def cond(state):
        x_n, x_s, r_n, r_s, p_n, p_s, rz, k = state
        r_norm = jnp.sqrt(_dot(r_n, r_s, r_n, r_s))
        return jnp.logical_and(k < max_iterations, r_norm > threshold)

    def body(state):
        x_n, x_s, r_n, r_s, p_n, p_s, rz, k = state
        Ap_n, Ap_s = matvec(p_n, p_s)
        pAp = _dot(p_n, p_s, Ap_n, Ap_s)
        # guard against breakdown on (near-)zero curvature
        alpha = rz / jnp.where(pAp <= 0, jnp.asarray(1.0, dt), pAp)
        alpha = jnp.where(pAp <= 0, jnp.asarray(0.0, dt), alpha)
        x_n = x_n + alpha * p_n
        x_s = x_s + alpha * p_s
        r_n = r_n - alpha * Ap_n
        r_s = r_s - alpha * Ap_s
        z_n, z_s = precond(r_n, r_s)
        rz_new = _dot(r_n, r_s, z_n, z_s)
        beta = rz_new / jnp.where(rz == 0, jnp.asarray(1.0, dt), rz)
        p_n = z_n + beta * p_n
        p_s = z_s + beta * p_s
        return x_n, x_s, r_n, r_s, p_n, p_s, rz_new, k + 1

    x_n, x_s, r_n, r_s, _, _, _, k = jax.lax.while_loop(
        cond, body, (x_n, x_s, r_n, r_s, p_n, p_s, rz, jnp.int32(0))
    )
    r_norm = jnp.sqrt(_dot(r_n, r_s, r_n, r_s))
    rel = r_norm / jnp.where(b_norm == 0, jnp.asarray(1.0, dt), b_norm)
    return PCGResult(x_n, x_s, k, rel)
