"""Unit tests for the SE(3) core vs independent scipy references.

Mirrors the conversions in the reference's PoseManipUtils
(/root/reference/src/utils/PoseManipUtils.cpp:3-187)."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from solve_keyframe_pose_graph_tpu.ops import se3


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mul_matches_scipy(rng):
    p = random_quats(rng, 64)
    q = random_quats(rng, 64)
    got = np.asarray(se3.quat_mul(jnp.asarray(p), jnp.asarray(q)))
    want = (Rotation.from_quat(p) * Rotation.from_quat(q)).as_quat()
    # sign-ambiguous
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-12)


def test_quat_rotate_matches_matrix(rng):
    q = random_quats(rng, 64)
    v = rng.normal(size=(64, 3))
    got = np.asarray(se3.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    want = np.einsum("nij,nj->ni", Rotation.from_quat(q).as_matrix(), v)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_quat_rot_roundtrip(rng):
    q = random_quats(rng, 256)
    R = se3.quat_to_rot(jnp.asarray(q))
    np.testing.assert_allclose(
        np.asarray(R), Rotation.from_quat(q).as_matrix(), atol=1e-12
    )
    q2 = np.asarray(se3.rot_to_quat(R))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2, q * sign, atol=1e-9)


def test_rot_to_quat_degenerate_cases():
    # 180-degree rotations hit every branch of Shepperd
    for axis in ["x", "y", "z"]:
        R = Rotation.from_euler(axis, 180, degrees=True).as_matrix()
        q = np.array(se3.rot_to_quat(jnp.asarray(R)))
        np.testing.assert_allclose(
            Rotation.from_quat(q).as_matrix(), R, atol=1e-9
        )
    q = np.asarray(se3.rot_to_quat(jnp.eye(3)))
    np.testing.assert_allclose(q, [0, 0, 0, 1], atol=1e-12)


def test_pose_mul_inv_matches_matrices(rng):
    qa, qb = random_quats(rng, 32), random_quats(rng, 32)
    ta, tb = rng.normal(size=(32, 3)), rng.normal(size=(32, 3))
    Ta = np.asarray(se3.pose_to_matrix(jnp.asarray(qa), jnp.asarray(ta)))
    Tb = np.asarray(se3.pose_to_matrix(jnp.asarray(qb), jnp.asarray(tb)))
    qc, tc = se3.pose_mul(jnp.asarray(qa), jnp.asarray(ta), jnp.asarray(qb), jnp.asarray(tb))
    Tc = np.asarray(se3.pose_to_matrix(qc, tc))
    np.testing.assert_allclose(Tc, Ta @ Tb, atol=1e-12)

    qi, ti = se3.pose_inv(jnp.asarray(qa), jnp.asarray(ta))
    Ti = np.asarray(se3.pose_to_matrix(qi, ti))
    np.testing.assert_allclose(Ti @ Ta, np.tile(np.eye(4), (32, 1, 1)), atol=1e-12)


def test_pose_relative(rng):
    q1, q2 = random_quats(rng, 16), random_quats(rng, 16)
    t1, t2 = rng.normal(size=(16, 3)), rng.normal(size=(16, 3))
    q12, p12 = se3.pose_relative(*map(jnp.asarray, (q1, t1, q2, t2)))
    T1 = np.asarray(se3.pose_to_matrix(jnp.asarray(q1), jnp.asarray(t1)))
    T2 = np.asarray(se3.pose_to_matrix(jnp.asarray(q2), jnp.asarray(t2)))
    T12 = np.asarray(se3.pose_to_matrix(q12, p12))
    np.testing.assert_allclose(T12, np.linalg.inv(T1) @ T2, atol=1e-11)


def test_ypr_roundtrip_and_convention(rng):
    # reference convention: R = Rz(yaw) Ry(pitch) Rx(roll), degrees
    ypr = rng.uniform(-60, 60, size=(64, 3))
    R = np.asarray(se3.ypr_deg_to_rot(jnp.asarray(ypr)))
    want = Rotation.from_euler("ZYX", ypr, degrees=True).as_matrix()
    np.testing.assert_allclose(R, want, atol=1e-12)
    back = np.asarray(se3.rot_to_ypr_deg(jnp.asarray(R)))
    np.testing.assert_allclose(back, ypr, atol=1e-9)


def test_quat_box_plus_matches_ceres_eigen_parameterization(rng):
    # Ceres EigenQuaternionParameterization: q_new = Exp(delta) * q,
    # Exp(d) = [sin|d|/|d| d, cos|d|]
    q = random_quats(rng, 8)
    d = rng.normal(size=(8, 3)) * 0.3
    got = np.asarray(se3.quat_box_plus(jnp.asarray(q), jnp.asarray(d)))
    norm = np.linalg.norm(d, axis=-1, keepdims=True)
    dq = np.concatenate([np.sin(norm) / norm * d, np.cos(norm)], axis=-1)
    want = np.asarray(se3.quat_mul(jnp.asarray(dq), jnp.asarray(q)))
    np.testing.assert_allclose(got, want, atol=1e-12)
    # tiny delta: identity-ish
    tiny = np.asarray(se3.quat_box_plus(jnp.asarray(q), jnp.zeros((8, 3))))
    np.testing.assert_allclose(tiny, q, atol=1e-12)


def test_skew(rng):
    v = rng.normal(size=(8, 3))
    w = rng.normal(size=(8, 3))
    S = np.asarray(se3.skew(jnp.asarray(v)))
    np.testing.assert_allclose(
        np.einsum("nij,nj->ni", S, w), np.cross(v, w), atol=1e-12
    )
