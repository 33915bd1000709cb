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


class TestAnalyticJacobians:
    """Analytic Jacobians must match the autodiff oracle to fp64 precision."""

    def _rand_pose(self, rng, n):
        q = rng.normal(size=(n, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        return jnp.asarray(q), jnp.asarray(rng.normal(size=(n, 3)))

    def test_six_dof(self, rng):
        n = 64
        q1, t1 = self._rand_pose(rng, n)
        q2, t2 = self._rand_pose(rng, n)
        oq, ot = self._rand_pose(rng, n)
        w = jnp.asarray(rng.uniform(0.2, 1.5, size=n))
        r_a, J1_a, J2_a = res.six_dof_residual_jac(q1, t1, q2, t2, oq, ot, w)
        r_d, J1_d, J2_d = res.six_dof_residual_jac_ad(q1, t1, q2, t2, oq, ot, w)
        np.testing.assert_allclose(r_a, r_d, atol=1e-12)
        np.testing.assert_allclose(J1_a, J1_d, atol=1e-9)
        np.testing.assert_allclose(J2_a, J2_d, atol=1e-9)

    def test_six_dof_switch(self, rng):
        n = 64
        q1, t1 = self._rand_pose(rng, n)
        q2, t2 = self._rand_pose(rng, n)
        oq, ot = self._rand_pose(rng, n)
        s = jnp.asarray(rng.uniform(0.01, 0.99, size=n))
        w = jnp.asarray(rng.uniform(0.2, 1.5, size=n))
        out_a = res.six_dof_switch_residual_jac(q1, t1, q2, t2, s, oq, ot, w)
        out_d = res.six_dof_switch_residual_jac_ad(q1, t1, q2, t2, s, oq, ot, w)
        for a, d in zip(out_a, out_d):
            np.testing.assert_allclose(a, d, atol=1e-9)

    def test_node_prior(self, rng):
        n = 64
        q, t = self._rand_pose(rng, n)
        pq, pt = self._rand_pose(rng, n)
        w = jnp.asarray(rng.uniform(0.2, 1.5, size=n))
        r_a, J_a = res.node_prior_residual_jac(q, t, pq, pt, w)
        r_d, J_d = res.node_prior_residual_jac_ad(q, t, pq, pt, w)
        np.testing.assert_allclose(r_a, r_d, atol=1e-12)
        np.testing.assert_allclose(J_a, J_d, atol=1e-9)


class TestBlockProducts:
    """Direct normal-equation blocks == einsum of the analytic Jacobians."""

    def _rand_pose(self, rng, n):
        q = rng.normal(size=(n, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        return jnp.asarray(q), jnp.asarray(rng.normal(size=(n, 3)))

    def test_six_dof_products(self, rng):
        n = 48
        q1, t1 = self._rand_pose(rng, n)
        q2, t2 = self._rand_pose(rng, n)
        oq, ot = self._rand_pose(rng, n)
        w = jnp.asarray(rng.uniform(0.2, 1.5, size=n))
        r, J1, J2 = res.six_dof_residual_jac(q1, t1, q2, t2, oq, ot, w)
        out = res.six_dof_block_products(q1, t1, q2, t2, oq, ot, w)
        rb, A11, A22, B12, g1, g2 = out
        np.testing.assert_allclose(rb, r, atol=1e-12)
        np.testing.assert_allclose(
            A11, jnp.einsum("eki,ekj->eij", J1, J1), atol=1e-9)
        np.testing.assert_allclose(
            A22, jnp.einsum("eki,ekj->eij", J2, J2), atol=1e-9)
        np.testing.assert_allclose(
            B12, jnp.einsum("eki,ekj->eij", J1, J2), atol=1e-9)
        np.testing.assert_allclose(
            g1, jnp.einsum("eki,ek->ei", J1, r), atol=1e-9)
        np.testing.assert_allclose(
            g2, jnp.einsum("eki,ek->ei", J2, r), atol=1e-9)

    def test_switch_products(self, rng):
        n = 48
        q1, t1 = self._rand_pose(rng, n)
        q2, t2 = self._rand_pose(rng, n)
        oq, ot = self._rand_pose(rng, n)
        s = jnp.asarray(rng.uniform(0.01, 0.99, size=n))
        w = jnp.asarray(rng.uniform(0.2, 1.5, size=n))
        r, L1, L2, Ls = res.six_dof_switch_residual_jac(
            q1, t1, q2, t2, s, oq, ot, w)
        out = res.six_dof_switch_block_products(q1, t1, q2, t2, s, oq, ot, w)
        rb, A11, A22, B12, c1, c2, ds, g1, g2, gs = out
        np.testing.assert_allclose(rb, r, atol=1e-12)
        np.testing.assert_allclose(
            A11, jnp.einsum("eki,ekj->eij", L1, L1), atol=1e-9)
        np.testing.assert_allclose(
            A22, jnp.einsum("eki,ekj->eij", L2, L2), atol=1e-9)
        np.testing.assert_allclose(
            B12, jnp.einsum("eki,ekj->eij", L1, L2), atol=1e-9)
        np.testing.assert_allclose(
            c1, jnp.einsum("eki,ek->ei", L1, Ls), atol=1e-9)
        np.testing.assert_allclose(
            c2, jnp.einsum("eki,ek->ei", L2, Ls), atol=1e-9)
        np.testing.assert_allclose(ds, jnp.sum(Ls * Ls, axis=-1), atol=1e-9)
        np.testing.assert_allclose(
            g1, jnp.einsum("eki,ek->ei", L1, r), atol=1e-9)
        np.testing.assert_allclose(
            g2, jnp.einsum("eki,ek->ei", L2, r), atol=1e-9)
        np.testing.assert_allclose(
            gs, jnp.einsum("ek,ek->e", Ls, r), atol=1e-9)

    def test_prior_products(self, rng):
        n = 48
        q, t = self._rand_pose(rng, n)
        pq, pt = self._rand_pose(rng, n)
        w = jnp.asarray(rng.uniform(0.2, 1.5, size=n))
        r, J = res.node_prior_residual_jac(q, t, pq, pt, w)
        rb, A, g = res.node_prior_block_products(q, t, pq, pt, w)
        np.testing.assert_allclose(rb, r, atol=1e-12)
        np.testing.assert_allclose(
            A, jnp.einsum("eki,ekj->eij", J, J), atol=1e-9)
        np.testing.assert_allclose(
            g, jnp.einsum("eki,ek->ei", J, r), atol=1e-9)
