"""Batched residual evaluation + tangent-space Jacobians for the pose graph.

Residual types (algebra matches /root/reference/src/CeresResidues.h exactly —
required for chi^2 parity with the Ceres formulation):

  * six_dof            — odometry edge, 6 rows          (CeresResidues.h:19-90)
  * six_dof_switch     — loop edge + switch var, 7 rows (CeresResidues.h:145-222)
                         NOTE the reference quirks, reproduced deliberately:
                         the ENTIRE residual (incl. the switch-prior row) is
                         multiplied by s, and the edge weight is IGNORED
                         (CeresResidues.h:189-198).
  * node_prior         — soft anchor ("regularization") on a node, 6 rows
                         (CeresResidues.h:96-141); used instead of marking
                         blocks constant so anchors can move on world merges.
  * four_dof(_switch)  — yaw-weighted Euler variants (CeresResidues.h:252-422),
                         available but not the reference's active path.

Parameterization: the local tangent of a node is [dtheta(3), dt(3)] with
q <- Exp(dtheta) * q (Ceres EigenQuaternionParameterization) and t <- t + dt.
Jacobians are evaluated at delta = 0 by batched forward-mode autodiff
(vmap(jacfwd)) — exact, fully fused by XLA, and bit-consistent with the
residual definition (the same property Ceres gets from autodiff). Residuals
here are cheap (tens of flops), so the 12-13 JVP columns are negligible next
to the PCG matvecs that consume them.

All functions are batched over a leading dimension and masked: a masked-out
residual contributes exactly zero rows and zero Jacobian.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from solve_keyframe_pose_graph_tpu.ops import se3

# ---------------------------------------------------------------------------
# raw residual functions (single instance; vmapped below)
# ---------------------------------------------------------------------------


def _six_dof_core(q1, t1, q2, t2, obs_q, obs_t):
    """Common 6-row pose error: [delta_t; 2*vec(delta_q)].

    delta_q = (q1^-1 q2)^-1 * obs_q
    delta_t = (q1^-1 q2)^-1 * (obs_t - q1^-1 (t2 - t1))
    (CeresResidues.h:47-59)."""
    q12, p12 = se3.pose_relative(q1, t1, q2, t2)
    q12c = se3.quat_conj(q12)
    delta_q = se3.quat_mul(q12c, obs_q)
    delta_t = se3.quat_rotate(q12c, obs_t - p12)
    return jnp.concatenate([delta_t, 2.0 * delta_q[..., :3]], axis=-1)


def six_dof_residual(q1, t1, q2, t2, obs_q, obs_t, weight):
    """SixDOFError: 6 rows, scaled by weight (CeresResidues.h:63-66 keeps the
    dynamic-covariance-scaling stub disabled, s = 1)."""
    return _six_dof_core(q1, t1, q2, t2, obs_q, obs_t) * weight[..., None]


def six_dof_switch_residual(q1, t1, q2, t2, s, obs_q, obs_t, weight):
    """SixDOFErrorWithSwitchingConstraints: 7 rows.

    rows 0..5 = six-dof error, row 6 = (1 - s); ALL rows then multiplied by s
    and the edge weight deliberately ignored (CeresResidues.h:186-198)."""
    del weight  # reproduced quirk: weight unused in the reference
    core = _six_dof_core(q1, t1, q2, t2, obs_q, obs_t)
    row6 = (1.0 - s)[..., None]
    r = jnp.concatenate([core, row6], axis=-1)
    return r * s[..., None]


def node_prior_residual(q, t, prior_q, prior_t, weight):
    """NodePoseRegularization: delta = prior^-1 * node,
    rows = weight * [delta_t; 2*vec(delta_q)] (CeresResidues.h:104-127)."""
    dq, dt = se3.pose_relative(prior_q, prior_t, q, t)
    r = jnp.concatenate([dt, 2.0 * dq[..., :3]], axis=-1)
    return r * weight[..., None]


def four_dof_residual(q1, t1, q2, t2, obs_q, obs_t, weight):
    """FourDOFError: translation rows + yaw*4 / pitch*10 / roll*10 (degrees),
    all * weight (CeresResidues.h:293-307)."""
    q12, p12 = se3.pose_relative(q1, t1, q2, t2)
    q12c = se3.quat_conj(q12)
    delta_q = se3.quat_mul(q12c, obs_q)
    delta_t = se3.quat_rotate(q12c, obs_t - p12)
    ypr = se3.rot_to_ypr_deg(se3.quat_to_rot(delta_q))
    rot_rows = jnp.stack(
        [4.0 * ypr[..., 0], 10.0 * ypr[..., 1], 10.0 * ypr[..., 2]], axis=-1
    )
    return jnp.concatenate([delta_t, rot_rows], axis=-1) * weight[..., None]


def four_dof_switch_residual(q1, t1, q2, t2, s, obs_q, obs_t, weight):
    """FourDOFErrorWithSwitchingConstraints (CeresResidues.h:338-422):
    same quirks as the 6-dof switch variant (×s on every row, weight
    ignored)."""
    del weight
    q12, p12 = se3.pose_relative(q1, t1, q2, t2)
    q12c = se3.quat_conj(q12)
    delta_q = se3.quat_mul(q12c, obs_q)
    delta_t = se3.quat_rotate(q12c, obs_t - p12)
    ypr = se3.rot_to_ypr_deg(se3.quat_to_rot(delta_q))
    rot_rows = jnp.stack(
        [4.0 * ypr[..., 0], 10.0 * ypr[..., 1], 10.0 * ypr[..., 2]], axis=-1
    )
    row6 = (1.0 - s)[..., None]
    r = jnp.concatenate([delta_t, rot_rows, row6], axis=-1)
    return r * s[..., None]


# ---------------------------------------------------------------------------
# tangent-space Jacobians (at delta = 0), batched
# ---------------------------------------------------------------------------


def _apply_tangent(q, t, dth, dt):
    return se3.quat_box_plus(q, dth), t + dt


def _binary_jac(residual_fn, out_dim):
    """Build a batched (residual, J1, J2) evaluator for a two-node residual.

    J1, J2 are (out_dim, 6) w.r.t. [dtheta, dt] of node 1 / node 2."""

    def single(q1, t1, q2, t2, obs_q, obs_t, w):
        def f(d):
            a1, b1 = _apply_tangent(q1, t1, d[0:3], d[3:6])
            a2, b2 = _apply_tangent(q2, t2, d[6:9], d[9:12])
            return residual_fn(a1, b1, a2, b2, obs_q, obs_t, w)

        z = jnp.zeros((12,), dtype=q1.dtype)
        r = f(z)
        J = jax.jacfwd(f)(z)  # (out_dim, 12)
        return r, J[:, 0:6], J[:, 6:12]

    return jax.vmap(single)


def _binary_switch_jac(residual_fn, out_dim):
    """Like _binary_jac but with a switch scalar: returns (r, J1, J2, Js)."""

    def single(q1, t1, q2, t2, s, obs_q, obs_t, w):
        def f(d):
            a1, b1 = _apply_tangent(q1, t1, d[0:3], d[3:6])
            a2, b2 = _apply_tangent(q2, t2, d[6:9], d[9:12])
            return residual_fn(a1, b1, a2, b2, s + d[12], obs_q, obs_t, w)

        z = jnp.zeros((13,), dtype=q1.dtype)
        r = f(z)
        J = jax.jacfwd(f)(z)  # (out_dim, 13)
        return r, J[:, 0:6], J[:, 6:12], J[:, 12]

    return jax.vmap(single)


def _unary_jac(residual_fn):
    def single(q, t, prior_q, prior_t, w):
        def f(d):
            a, b = _apply_tangent(q, t, d[0:3], d[3:6])
            return residual_fn(a, b, prior_q, prior_t, w)

        z = jnp.zeros((6,), dtype=q.dtype)
        return f(z), jax.jacfwd(f)(z)

    return jax.vmap(single)


# Public batched evaluators. Each returns residual rows and Jacobian blocks;
# callers multiply by the (0/1) mask.
six_dof_residual_jac = _binary_jac(six_dof_residual, 6)
six_dof_switch_residual_jac = _binary_switch_jac(six_dof_switch_residual, 7)
four_dof_residual_jac = _binary_jac(four_dof_residual, 6)
four_dof_switch_residual_jac = _binary_switch_jac(four_dof_switch_residual, 7)
node_prior_residual_jac = _unary_jac(node_prior_residual)
