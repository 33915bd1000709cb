"""Residual-kernel tests: algebra identities, reference quirks, and
Jacobians vs central finite differences (fp64 oracle).

The residual definitions mirror /root/reference/src/CeresResidues.h; the
quirk tests pin down the behaviors that matter for chi^2 parity."""

import numpy as np
import jax.numpy as jnp

from solve_keyframe_pose_graph_tpu.ops import residuals as res
from solve_keyframe_pose_graph_tpu.ops import se3


def random_pose(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q), jnp.asarray(rng.normal(size=(n, 3)))


def test_six_dof_zero_at_observation(rng):
    q1, t1 = random_pose(rng, 16)
    q2, t2 = random_pose(rng, 16)
    obs_q, obs_t = se3.pose_relative(q1, t1, q2, t2)
    w = jnp.ones(16)
    r = res.six_dof_residual(q1, t1, q2, t2, obs_q, obs_t, w)
    np.testing.assert_allclose(np.array(r), 0.0, atol=1e-12)


def test_six_dof_weight_scales_rows(rng):
    q1, t1 = random_pose(rng, 4)
    q2, t2 = random_pose(rng, 4)
    obs_q, obs_t = random_pose(rng, 4)
    obs_q = se3.quat_normalize(obs_q)
    r1 = res.six_dof_residual(q1, t1, q2, t2, obs_q, obs_t, jnp.ones(4))
    r3 = res.six_dof_residual(q1, t1, q2, t2, obs_q, obs_t, 3.0 * jnp.ones(4))
    np.testing.assert_allclose(np.array(r3), 3.0 * np.array(r1), atol=1e-12)


def test_switch_quirks(rng):
    """CeresResidues.h:186-198: entire 7-vec (incl. prior row) scaled by s;
    edge weight ignored."""
    q1, t1 = random_pose(rng, 8)
    q2, t2 = random_pose(rng, 8)
    obs_q, obs_t = random_pose(rng, 8)
    obs_q = se3.quat_normalize(obs_q)
    s = jnp.asarray(rng.uniform(0.2, 0.99, size=8))

    r = res.six_dof_switch_residual(q1, t1, q2, t2, s, obs_q, obs_t, jnp.ones(8))
    r_w9 = res.six_dof_switch_residual(
        q1, t1, q2, t2, s, obs_q, obs_t, 9.0 * jnp.ones(8)
    )
    # weight ignored
    np.testing.assert_allclose(np.array(r), np.array(r_w9), atol=1e-15)
    # rows 0..5 = s * plain six-dof (weight=1)
    plain = res.six_dof_residual(q1, t1, q2, t2, obs_q, obs_t, jnp.ones(8))
    np.testing.assert_allclose(
        np.array(r[:, :6]), np.array(s[:, None] * plain), atol=1e-12
    )
    # row 6 = s * (1 - s)
    np.testing.assert_allclose(
        np.array(r[:, 6]), np.array(s * (1 - s)), atol=1e-12
    )


def test_node_prior_zero_at_prior(rng):
    q, t = random_pose(rng, 8)
    w = jnp.asarray(rng.uniform(1, 3, size=8))
    r = res.node_prior_residual(q, t, q, t, w)
    np.testing.assert_allclose(np.array(r), 0.0, atol=1e-12)


def _fd_jacobian(f, dim, eps=1e-7):
    """Central finite differences of f: R^dim -> R^k at zero."""
    cols = []
    for i in range(dim):
        d = np.zeros(dim)
        d[i] = eps
        cols.append((f(d) - f(-d)) / (2 * eps))
    return np.stack(cols, axis=-1)


def test_six_dof_jacobian_vs_fd(rng):
    q1, t1 = random_pose(rng, 1)
    q2, t2 = random_pose(rng, 1)
    obs_q, obs_t = random_pose(rng, 1)
    obs_q = se3.quat_normalize(obs_q)
    w = jnp.asarray([1.7])

    r, J1, J2 = res.six_dof_residual_jac(q1, t1, q2, t2, obs_q, obs_t, w)

    def f(d):
        d = jnp.asarray(d)
        a1 = se3.quat_box_plus(q1[0], d[0:3])
        b1 = t1[0] + d[3:6]
        a2 = se3.quat_box_plus(q2[0], d[6:9])
        b2 = t2[0] + d[9:12]
        return np.array(
            res.six_dof_residual(a1, b1, a2, b2, obs_q[0], obs_t[0], w[0])
        )

    J_fd = _fd_jacobian(f, 12)
    np.testing.assert_allclose(np.array(J1[0]), J_fd[:, 0:6], atol=1e-6)
    np.testing.assert_allclose(np.array(J2[0]), J_fd[:, 6:12], atol=1e-6)


def test_switch_jacobian_vs_fd(rng):
    q1, t1 = random_pose(rng, 1)
    q2, t2 = random_pose(rng, 1)
    obs_q, obs_t = random_pose(rng, 1)
    obs_q = se3.quat_normalize(obs_q)
    s = jnp.asarray([0.8])
    w = jnp.asarray([1.0])

    r, J1, J2, Js = res.six_dof_switch_residual_jac(
        q1, t1, q2, t2, s, obs_q, obs_t, w
    )

    def f(d):
        d = jnp.asarray(d)
        a1 = se3.quat_box_plus(q1[0], d[0:3])
        b1 = t1[0] + d[3:6]
        a2 = se3.quat_box_plus(q2[0], d[6:9])
        b2 = t2[0] + d[9:12]
        return np.array(
            res.six_dof_switch_residual(
                a1, b1, a2, b2, s[0] + d[12], obs_q[0], obs_t[0], w[0]
            )
        )

    J_fd = _fd_jacobian(f, 13)
    np.testing.assert_allclose(np.array(J1[0]), J_fd[:, 0:6], atol=1e-6)
    np.testing.assert_allclose(np.array(J2[0]), J_fd[:, 6:12], atol=1e-6)
    np.testing.assert_allclose(np.array(Js[0]), J_fd[:, 12], atol=1e-6)


def test_prior_jacobian_vs_fd(rng):
    q, t = random_pose(rng, 1)
    pq, pt = random_pose(rng, 1)
    pq = se3.quat_normalize(pq)
    w = jnp.asarray([2.5])
    r, J = res.node_prior_residual_jac(q, t, pq, pt, w)

    def f(d):
        d = jnp.asarray(d)
        a = se3.quat_box_plus(q[0], d[0:3])
        b = t[0] + d[3:6]
        return np.array(res.node_prior_residual(a, b, pq[0], pt[0], w[0]))

    J_fd = _fd_jacobian(f, 6)
    np.testing.assert_allclose(np.array(J[0]), J_fd, atol=1e-6)


def test_four_dof_rows(rng):
    """FourDOFError: yaw row x4, pitch/roll x10, degrees
    (CeresResidues.h:303-305)."""
    q1, t1 = random_pose(rng, 4)
    q2, t2 = random_pose(rng, 4)
    obs_q, obs_t = se3.pose_relative(q1, t1, q2, t2)
    r = res.four_dof_residual(q1, t1, q2, t2, obs_q, obs_t, jnp.ones(4))
    np.testing.assert_allclose(np.array(r), 0.0, atol=1e-9)

    # perturb yaw only: residual row 3 = 4 * yaw_deg approx
    dyaw = 2.0  # degrees
    Rz = se3.ypr_deg_to_rot(jnp.asarray([[dyaw, 0.0, 0.0]]))
    dq = se3.rot_to_quat(Rz)
    obs_q2 = se3.quat_mul(obs_q, jnp.tile(dq, (4, 1)))
    r2 = res.four_dof_residual(q1, t1, q2, t2, obs_q2, obs_t, jnp.ones(4))
    np.testing.assert_allclose(np.array(r2[:, 3]), 4.0 * dyaw, atol=1e-6)
