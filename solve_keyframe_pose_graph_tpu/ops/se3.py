"""Batched SE(3) / quaternion primitives in pure JAX.

Conventions (chosen to match the reference's storage and algebra so that
chi^2 parity is checkable):
  * quaternions are stored **xyzw** (Eigen's internal coefficient order; the
    reference's opt array `_opt_quat_` is xyzw, PoseGraphSLAM.cpp:17-25).
  * Hamilton product, active rotations:  R(q) v = q v q^-1.
  * a "pose" is the pair (q, t) meaning the rigid transform w_T_c with
    rotation R(q) and translation t; matrix form [[R, t], [0, 1]].
  * yaw/pitch/roll conversions are in DEGREES, mirroring
    PoseManipUtils::R2ypr / ypr2R (utils/PoseManipUtils.cpp:143-187) — the
    odometry weight exp(-yaw^2/6) consumes degrees
    (PoseGraphSLAM.cpp:1603-1606).

Everything is shape-polymorphic over leading batch dimensions and
dtype-polymorphic (float32 on TPU, float64 for parity tests).
"""

from __future__ import annotations

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# quaternion primitives (xyzw)
# ---------------------------------------------------------------------------


def quat_identity(shape=(), dtype=jnp.float32):
    q = jnp.zeros(tuple(shape) + (4,), dtype=dtype)
    return q.at[..., 3].set(1.0)


def quat_mul(p, q):
    """Hamilton product p * q, xyzw layout."""
    px, py, pz, pw = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            pw * qx + px * qw + py * qz - pz * qy,
            pw * qy - px * qz + py * qw + pz * qx,
            pw * qz + px * qy - py * qx + pz * qw,
            pw * qw - px * qx - py * qy - pz * qz,
        ],
        axis=-1,
    )


def quat_conj(q):
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_normalize(q, eps=0.0):
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps if eps else jnp.finfo(q.dtype).tiny)


def quat_canonical(q):
    """Flip sign so w >= 0 (q and -q are the same rotation)."""
    return jnp.where(q[..., 3:4] < 0, -q, q)


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q: R(q) v.

    Uses the 2-cross-product expansion (cheaper than building R)."""
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_to_rot(q):
    """(..., 4) xyzw -> (..., 3, 3) rotation matrix. Assumes unit norm."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def rot_to_quat(R):
    """(..., 3, 3) -> (..., 4) xyzw, branchless Shepperd (stable for all R).

    Computes all four candidate quadruples and selects the one keyed by the
    largest diagonal combination — vectorizes cleanly on the VPU (no
    data-dependent branches)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # four candidates, each valid when its pivot is the largest
    qw_w = 1.0 + tr
    qx_x = 1.0 + m00 - m11 - m22
    qy_y = 1.0 - m00 + m11 - m22
    qz_z = 1.0 - m00 - m11 + m22

    # candidate vectors (unnormalized): order xyzw
    cw = jnp.stack([m21 - m12, m02 - m20, m10 - m01, qw_w], axis=-1)
    cx = jnp.stack([qx_x, m01 + m10, m02 + m20, m21 - m12], axis=-1)
    cy = jnp.stack([m01 + m10, qy_y, m12 + m21, m02 - m20], axis=-1)
    cz = jnp.stack([m02 + m20, m12 + m21, qz_z, m10 - m01], axis=-1)

    pivots = jnp.stack([qw_w, qx_x, qy_y, qz_z], axis=-1)  # (..., 4)
    cands = jnp.stack([cw, cx, cy, cz], axis=-2)           # (..., 4, 4)
    idx = jnp.argmax(pivots, axis=-1)
    best = jnp.take_along_axis(
        cands, idx[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    return quat_canonical(quat_normalize(best))


def quat_box_plus(q, delta):
    """Ceres EigenQuaternionParameterization::Plus in xyzw layout.

    q_new = Exp(delta) * q  with  Exp(d) = [sin|d|/|d| * d, cos|d|].
    delta is the 3-vector local update (half-angle units: the residual rows
    use 2*vec(dq), so this pairing makes J consistent with Ceres autodiff).
    """
    theta2 = jnp.sum(delta * delta, axis=-1, keepdims=True)
    # Differentiable at 0: guard the sqrt argument (the where-grad trap —
    # sqrt'(0)=inf would poison the untaken branch's tangent under autodiff).
    small = theta2 < 1e-12
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    k = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    w = jnp.where(small, 1.0 - theta2 / 2.0, jnp.cos(theta))
    dq = jnp.concatenate([k * delta, w], axis=-1)
    return quat_mul(dq, q)


# ---------------------------------------------------------------------------
# pose (q, t) primitives
# ---------------------------------------------------------------------------


def pose_identity(shape=(), dtype=jnp.float32):
    return quat_identity(shape, dtype), jnp.zeros(tuple(shape) + (3,), dtype=dtype)


def pose_mul(qa, ta, qb, tb):
    """(a_T_b compose) returns a_T_b = a_T_x * x_T_b given (qa,ta)=a_T_x? No:
    standard composition: given A = (qa, ta), B = (qb, tb), returns A*B,
    i.e. rotation qa*qb, translation ta + R(qa) tb."""
    return quat_mul(qa, qb), ta + quat_rotate(qa, tb)


def pose_inv(q, t):
    qi = quat_conj(q)
    return qi, -quat_rotate(qi, t)


def pose_relative(q1, t1, q2, t2):
    """Relative transform 1_T_2 = (w_T_1)^-1 * (w_T_2).

    Matches the estimate used in all reference residuals
    (CeresResidues.h:47-50): q12 = q1^-1 q2, p12 = q1^-1 (p2 - p1)."""
    q1i = quat_conj(q1)
    q12 = quat_mul(q1i, q2)
    p12 = quat_rotate(q1i, t2 - t1)
    return q12, p12


def pose_to_matrix(q, t):
    """(q,t) -> (...,4,4) homogeneous matrix."""
    R = quat_to_rot(q)
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def matrix_to_pose(T):
    return rot_to_quat(T[..., :3, :3]), T[..., :3, 3]


# ---------------------------------------------------------------------------
# Euler (yaw-pitch-roll, degrees) — mirrors PoseManipUtils conventions
# ---------------------------------------------------------------------------


def rot_to_ypr_deg(R):
    """R -> [yaw, pitch, roll] in degrees.

    Same formula as PoseManipUtils::R2ypr (utils/PoseManipUtils.cpp:143-158)
    and the templated R2ypr in CeresResidues.h:227-242."""
    n = R[..., :, 0]
    o = R[..., :, 1]
    a = R[..., :, 2]
    y = jnp.arctan2(n[..., 1], n[..., 0])
    p = jnp.arctan2(-n[..., 2], n[..., 0] * jnp.cos(y) + n[..., 1] * jnp.sin(y))
    r = jnp.arctan2(
        a[..., 0] * jnp.sin(y) - a[..., 1] * jnp.cos(y),
        -o[..., 0] * jnp.sin(y) + o[..., 1] * jnp.cos(y),
    )
    ypr = jnp.stack([y, p, r], axis=-1)
    return ypr / jnp.pi * 180.0


def ypr_deg_to_rot(ypr):
    """[yaw, pitch, roll] degrees -> R. Mirrors PoseManipUtils::ypr2R
    (utils/PoseManipUtils.cpp:162-187): R = Rz(y) Ry(p) Rx(r)."""
    rad = ypr / 180.0 * jnp.pi
    y, p, r = rad[..., 0], rad[..., 1], rad[..., 2]
    cy, sy = jnp.cos(y), jnp.sin(y)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cr, sr = jnp.cos(r), jnp.sin(r)
    row = jnp.stack(
        [
            cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
            sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
            -sp, cp * sr, cp * cr,
        ],
        axis=-1,
    )
    return row.reshape(row.shape[:-1] + (3, 3))


def relative_yaw_deg(q12):
    """Yaw (degrees) of a relative rotation — feeds the odometry edge weight
    exp(-yaw^2/6) (PoseGraphSLAM.cpp:1603-1606)."""
    return rot_to_ypr_deg(quat_to_rot(q12))[..., 0]


# ---------------------------------------------------------------------------
# small matrix helpers
# ---------------------------------------------------------------------------


def skew(v):
    """(...,3) -> (...,3,3) cross-product matrix [v]x."""
    z = jnp.zeros_like(v[..., 0])
    r = jnp.stack(
        [z, -v[..., 2], v[..., 1],
         v[..., 2], z, -v[..., 0],
         -v[..., 1], v[..., 0], z],
        axis=-1,
    )
    return r.reshape(v.shape[:-1] + (3, 3))
