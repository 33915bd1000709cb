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


# Autodiff evaluators (exact oracle; 12-13 JVP columns each -> used for the
# non-hot 4-dof path and as the test reference for the analytic versions).
six_dof_residual_jac_ad = _binary_jac(six_dof_residual, 6)
six_dof_switch_residual_jac_ad = _binary_switch_jac(six_dof_switch_residual, 7)
four_dof_residual_jac = _binary_jac(four_dof_residual, 6)
four_dof_switch_residual_jac = _binary_switch_jac(four_dof_switch_residual, 7)
node_prior_residual_jac_ad = _unary_jac(node_prior_residual)


# ---------------------------------------------------------------------------
# analytic Jacobians (the hot path: one evaluation instead of 13 JVP columns)
#
# With the left increment q' = [delta, 1] (x) q (se3.quat_box_plus at 0,
# R(dq) ~ I + 2[delta]_x), the 6-dof core
#     delta_t = R2^T (R1 obs_t + t1 - t2)
#     e       = 2 vec(q2^-1 (x) q1 (x) obs_q)
# differentiates in closed form; both rotation-row blocks share
#     M = 2 [ (b_w I - [b_v]_x)(a_w I + [a_v]_x) - b_v a_v^T ],
# a = q2^-1, b = q1 (x) obs_q:
#     de/ddelta1 = M,  de/ddelta2 = -M
#     ddelta_t/ddelta1 = -2 R2^T [R1 obs_t]_x
#     ddelta_t/ddelta2 = +2 R2^T [u]_x,   u = R1 obs_t + t1 - t2
#     ddelta_t/dt1 = R2^T,  ddelta_t/dt2 = -R2^T.
# Verified against the autodiff versions in tests/test_residuals.py.
# ---------------------------------------------------------------------------


def _rot_row_M(q2, q1, obs_q):
    """Shared 3x3 block of the rotation-row Jacobians (see derivation)."""
    a = se3.quat_conj(q2)
    b = se3.quat_mul(q1, obs_q)
    av, aw = a[..., :3], a[..., 3:4]
    bv, bw = b[..., :3], b[..., 3:4]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=q1.dtype), av.shape + (3,))
    left = bw[..., None] * eye - se3.skew(bv)
    right = aw[..., None] * eye + se3.skew(av)
    M = left @ right - bv[..., :, None] * av[..., None, :]
    return 2.0 * M


def _six_dof_core_and_jac(q1, t1, q2, t2, obs_q, obs_t):
    """core (...,6) and J1, J2 (...,6,6); tangent cols [dtheta(3), dt(3)]."""
    R1o = se3.quat_rotate(q1, obs_t)
    u = R1o + t1 - t2
    q2c = se3.quat_conj(q2)
    R2T = se3.quat_to_rot(q2c)
    delta_t = se3.quat_rotate(q2c, u)
    delta_q = se3.quat_mul(se3.quat_mul(q2c, q1), obs_q)
    core = jnp.concatenate([delta_t, 2.0 * delta_q[..., :3]], axis=-1)

    M = _rot_row_M(q2, q1, obs_q)
    dt_dth1 = -2.0 * (R2T @ se3.skew(R1o))
    dt_dth2 = 2.0 * (R2T @ se3.skew(u))
    zero = jnp.zeros_like(M)

    J1 = jnp.concatenate([
        jnp.concatenate([dt_dth1, R2T], axis=-1),
        jnp.concatenate([M, zero], axis=-1),
    ], axis=-2)
    J2 = jnp.concatenate([
        jnp.concatenate([dt_dth2, -R2T], axis=-1),
        jnp.concatenate([-M, zero], axis=-1),
    ], axis=-2)
    return core, J1, J2


def six_dof_residual_jac(q1, t1, q2, t2, obs_q, obs_t, weight):
    """(r, J1, J2) for the weighted 6-dof residual — analytic."""
    core, J1, J2 = _six_dof_core_and_jac(q1, t1, q2, t2, obs_q, obs_t)
    w = weight[..., None]
    return core * w, J1 * w[..., None], J2 * w[..., None]


def six_dof_switch_residual_jac(q1, t1, q2, t2, s, obs_q, obs_t, weight):
    """(r, J1, J2, Js) for the 7-row switch residual — analytic.

    r = s * [core; 1-s]  =>  dr/dnode = s * [J_core; 0],
    dr/ds = [core; 1 - 2 s]. Weight ignored (reference quirk)."""
    del weight
    core, J1c, J2c = _six_dof_core_and_jac(q1, t1, q2, t2, obs_q, obs_t)
    sN = s[..., None]
    r = jnp.concatenate([core * sN, (s * (1.0 - s))[..., None]], axis=-1)
    zrow = jnp.zeros_like(J1c[..., :1, :])
    J1 = jnp.concatenate([J1c * sN[..., None], zrow], axis=-2)
    J2 = jnp.concatenate([J2c * sN[..., None], zrow], axis=-2)
    Js = jnp.concatenate([core, (1.0 - 2.0 * s)[..., None]], axis=-1)
    return r, J1, J2, Js


# ---------------------------------------------------------------------------
# direct normal-equation block products (no Jacobian materialization)
#
# R2's orthogonality collapses every J^T J block to closed form. With
# v = R1 obs_t, u = v + t1 - t2 (so the translation rows are R2^T u), and
# M the shared rotation-row block:
#   A11 = J1'J1 = [[4(|v|^2 I - v v') + M'M,  2[v]x], [-2[v]x, I]]
#   A22 = J2'J2 = [[4(|u|^2 I - u u') + M'M,  2[u]x], [-2[u]x, I]]
#   B12 = J1'J2 = [[4(u v' - (u.v) I) - M'M, -2[v]x], [ 2[u]x, -I]]
# and the gradients (z = R2 r_t = u exactly):
#   g1 = J1'r = [2 v x u + M' r_e;  u]
#   g2 = J2'r = [       - M' r_e; -u]        (u x u = 0)
# Verified against einsum(J, J) of the analytic Jacobians in tests.
# ---------------------------------------------------------------------------


def _blk(tl, tr, bl, br):
    top = jnp.concatenate([tl, tr], axis=-1)
    bot = jnp.concatenate([bl, br], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _six_dof_products_core(q1, t1, q2, t2, obs_q, obs_t):
    v = se3.quat_rotate(q1, obs_t)
    u = v + t1 - t2
    q2c = se3.quat_conj(q2)
    delta_t = se3.quat_rotate(q2c, u)
    delta_q = se3.quat_mul(se3.quat_mul(q2c, q1), obs_q)
    core_e = 2.0 * delta_q[..., :3]
    core = jnp.concatenate([delta_t, core_e], axis=-1)

    M = _rot_row_M(q2, q1, obs_q)
    MtM = jnp.einsum("...ki,...kj->...ij", M, M)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=q1.dtype), MtM.shape)

    def ssq(w3):   # |w|^2 I - w w'
        n2 = jnp.sum(w3 * w3, axis=-1)[..., None, None]
        return n2 * eye - w3[..., :, None] * w3[..., None, :]

    sv, su = se3.skew(v), se3.skew(u)
    A11 = _blk(4.0 * ssq(v) + MtM, 2.0 * sv, -2.0 * sv, eye)
    A22 = _blk(4.0 * ssq(u) + MtM, 2.0 * su, -2.0 * su, eye)
    uv = jnp.sum(u * v, axis=-1)[..., None, None]
    uvT = u[..., :, None] * v[..., None, :]
    B12 = _blk(4.0 * (uvT - uv * eye) - MtM, -2.0 * sv, 2.0 * su, -eye)

    Mte = jnp.einsum("...ki,...k->...i", M, core_e)
    g1 = jnp.concatenate([2.0 * jnp.cross(v, u) + Mte, u], axis=-1)
    g2 = jnp.concatenate([-Mte, -u], axis=-1)
    return core, A11, A22, B12, g1, g2


def six_dof_block_products(q1, t1, q2, t2, obs_q, obs_t, weight):
    """(r, A11, A22, B12, g1, g2) for the weighted 6-dof residual.
    r = w * core; blocks = w^2 J'J; grads = w^2 J'core (= J_w' r_w)."""
    core, A11, A22, B12, g1, g2 = _six_dof_products_core(
        q1, t1, q2, t2, obs_q, obs_t)
    w = weight[..., None]
    w2 = (weight * weight)[..., None]
    return (core * w, A11 * w2[..., None], A22 * w2[..., None],
            B12 * w2[..., None], g1 * w2, g2 * w2)


def six_dof_switch_block_products(q1, t1, q2, t2, s, obs_q, obs_t, weight):
    """(r, A11, A22, B12, c1, c2, ds, g1, g2, gs) for the 7-row switch
    residual (weight ignored — reference quirk):
      r = [s*core, s(1-s)];  node blocks = s^2 * (core blocks)
      c1 = J1'Js = s * g1c,  c2 = s * g2c,  ds = |core|^2 + (1-2s)^2
      g1 = s^2 g1c,  g2 = s^2 g2c,  gs = s|core|^2 + s(1-s)(1-2s)."""
    del weight
    core, A11, A22, B12, g1c, g2c = _six_dof_products_core(
        q1, t1, q2, t2, obs_q, obs_t)
    sN = s[..., None]
    s2 = (s * s)[..., None]
    r = jnp.concatenate([core * sN, (s * (1.0 - s))[..., None]], axis=-1)
    cc = jnp.sum(core * core, axis=-1)
    one2s = 1.0 - 2.0 * s
    ds = cc + one2s * one2s
    gs = s * cc + s * (1.0 - s) * one2s
    return (r, A11 * s2[..., None], A22 * s2[..., None], B12 * s2[..., None],
            g1c * sN, g2c * sN, ds, g1c * s2, g2c * s2, gs)


def node_prior_block_products(q, t, prior_q, prior_t, weight):
    """(r, A, g) for the prior: A = w^2 [[Mp'Mp, 0], [0, I]],
    g = w^2 [Mp' r_e; t - tp]."""
    qpc = se3.quat_conj(prior_q)
    dt_ = se3.quat_rotate(qpc, t - prior_t)
    dq = se3.quat_mul(qpc, q)
    r_e = 2.0 * dq[..., :3]
    r = jnp.concatenate([dt_, r_e], axis=-1)

    Mp = _rot_row_M(prior_q, se3.quat_identity(q.shape[:-1], q.dtype), q)
    MtM = jnp.einsum("...ki,...kj->...ij", Mp, Mp)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), MtM.shape)
    zero = jnp.zeros_like(MtM)
    A = _blk(MtM, zero, zero, eye)
    g = jnp.concatenate(
        [jnp.einsum("...ki,...k->...i", Mp, r_e), t - prior_t], axis=-1)
    w = weight[..., None]
    w2 = (weight * weight)[..., None]
    return r * w, A * w2[..., None], g * w2


# ---------------------------------------------------------------------------
# transposed (entry-major) block products — the TPU layout
#
# TPU tiles the two minor dims to (8,128): an (N,6,6) f32 block tensor is
# stored ~21x padded and every pass over it pays that in HBM. Entry-major
# (36, N) layout puts the node axis in lanes: compact storage, full VPU
# utilization (measured 9x on the band matvec). These functions compute the
# same closed-form products as six_dof_block_products but entirely in scalar
# components, emitting (36,)+batch stacks. Differentially tested against the
# AoS versions.
# ---------------------------------------------------------------------------


def _qmul_c(p, q):
    px, py, pz, pw = p
    qx, qy, qz, qw = q
    return (pw * qx + px * qw + py * qz - pz * qy,
            pw * qy - px * qz + py * qw + pz * qx,
            pw * qz + px * qy - py * qx + pz * qw,
            pw * qw - px * qx - py * qy - pz * qz)


def _qrot_c(q, v):
    qx, qy, qz, qw = q
    vx, vy, vz = v
    ux = qy * vz - qz * vy
    uy = qz * vx - qx * vz
    uz = qx * vy - qy * vx
    wx = qy * uz - qz * uy
    wy = qz * ux - qx * uz
    wz = qx * uy - qy * ux
    return (vx + 2 * (qw * ux + wx),
            vy + 2 * (qw * uy + wy),
            vz + 2 * (qw * uz + wz))


def _unpack4(q):
    return q[..., 0], q[..., 1], q[..., 2], q[..., 3]


def _unpack3(t):
    return t[..., 0], t[..., 1], t[..., 2]


def _M_entries(q2, q1, obs_q):
    """9 scalar entries (row-major) of the shared rotation-row block M."""
    x2, y2, z2, w2 = _unpack4(q2)
    a = (-x2, -y2, -z2, w2)                       # conj(q2)
    b = _qmul_c(_unpack4(q1), _unpack4(obs_q))    # q1 (x) obs_q
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    # P = bw I - [bv]x ; Q = aw I + [av]x ; M = 2 (P Q - bv av^T)
    P = ((bw, bz, -by), (-bz, bw, bx), (by, -bx, bw))
    Q = ((aw, -az, ay), (az, aw, -ax), (-ay, ax, aw))
    bv = (bx, by, bz)
    av = (ax, ay, az)
    M = []
    for i in range(3):
        for j in range(3):
            s = P[i][0] * Q[0][j] + P[i][1] * Q[1][j] + P[i][2] * Q[2][j]
            M.append(2.0 * (s - bv[i] * av[j]))
    return M, a, b


def _six_dof_products_core_t(q1, t1, q2, t2, obs_q, obs_t):
    """Entry-major core products. Returns (rsq, core6, A11, A22, B12, g1, g2)
    with rsq batch-shaped (sum of squared core rows), core6 a 6-tuple of
    components, blocks 36-lists, grads 6-lists — all batch-shaped scalars."""
    M, a, b = _M_entries(q2, q1, obs_q)
    v = _qrot_c(_unpack4(q1), _unpack3(obs_t))
    t1c = _unpack3(t1)
    t2c = _unpack3(t2)
    u = tuple(v[i] + t1c[i] - t2c[i] for i in range(3))
    dt_ = _qrot_c((a[0], a[1], a[2], a[3]), u)     # R2^T u
    dq = _qmul_c(a, b)                             # conj(q2) (x) q1 (x) obs_q
    core_e = tuple(2.0 * dq[i] for i in range(3))
    core = dt_ + core_e
    rsq = sum(c * c for c in core)

    MtM = [None] * 9
    for i in range(3):
        for j in range(i, 3):
            s = M[0 + i] * M[0 + j] + M[3 + i] * M[3 + j] + M[6 + i] * M[6 + j]
            MtM[3 * i + j] = s
            MtM[3 * j + i] = s

    v2 = v[0] * v[0] + v[1] * v[1] + v[2] * v[2]
    u2 = u[0] * u[0] + u[1] * u[1] + u[2] * u[2]
    uv = u[0] * v[0] + u[1] * v[1] + u[2] * v[2]
    one = jnp.ones_like(v2)
    zero = jnp.zeros_like(v2)

    def sk(w3):   # 2[w]x entries, row-major
        return (zero, -2.0 * w3[2], 2.0 * w3[1],
                2.0 * w3[2], zero, -2.0 * w3[0],
                -2.0 * w3[1], 2.0 * w3[0], zero)

    sv = sk(v)
    su = sk(u)

    def blk(tl, tr, bl, br):
        """4 row-major 9-entry 3x3 blocks -> 36-entry row-major 6x6 list."""
        out = []
        for i in range(3):
            out += [tl[3 * i], tl[3 * i + 1], tl[3 * i + 2],
                    tr[3 * i], tr[3 * i + 1], tr[3 * i + 2]]
        for i in range(3):
            out += [bl[3 * i], bl[3 * i + 1], bl[3 * i + 2],
                    br[3 * i], br[3 * i + 1], br[3 * i + 2]]
        return out

    eye9 = (one, zero, zero, zero, one, zero, zero, zero, one)
    neye9 = tuple(-e for e in eye9)

    tl11 = [4.0 * (v2 * eye9[k] - v[k // 3] * v[k % 3]) + MtM[k]
            for k in range(9)]
    A11 = blk(tl11, sv, tuple(-e for e in sv), eye9)
    tl22 = [4.0 * (u2 * eye9[k] - u[k // 3] * u[k % 3]) + MtM[k]
            for k in range(9)]
    A22 = blk(tl22, su, tuple(-e for e in su), eye9)
    tl12 = [4.0 * (u[k // 3] * v[k % 3] - uv * eye9[k]) - MtM[k]
            for k in range(9)]
    B12 = blk(tl12, tuple(-e for e in sv), su, neye9)

    vxu = (v[1] * u[2] - v[2] * u[1],
           v[2] * u[0] - v[0] * u[2],
           v[0] * u[1] - v[1] * u[0])
    Mte = tuple(M[0 + i] * core_e[0] + M[3 + i] * core_e[1]
                + M[6 + i] * core_e[2] for i in range(3))
    g1 = [2.0 * vxu[i] + Mte[i] for i in range(3)] + [u[0], u[1], u[2]]
    g2 = [-Mte[i] for i in range(3)] + [-u[0], -u[1], -u[2]]
    return rsq, core, A11, A22, B12, g1, g2


def six_dof_block_products_t(q1, t1, q2, t2, obs_q, obs_t, weight):
    """Entry-major weighted products: (rsq, A11, A22, B12, g1, g2) with
    rsq = w^2 |core|^2 (batch,), blocks (36,)+batch, grads (6,)+batch."""
    rsq, _, A11, A22, B12, g1, g2 = _six_dof_products_core_t(
        q1, t1, q2, t2, obs_q, obs_t)
    w2 = weight * weight
    st = lambda xs: jnp.stack([x * w2 for x in xs])
    return rsq * w2, st(A11), st(A22), st(B12), st(g1), st(g2)


def six_dof_switch_block_products_t(q1, t1, q2, t2, s, obs_q, obs_t, weight):
    """Entry-major switch products: (rsq, A11, A22, B12, c1, c2, ds, g1, g2,
    gs); rsq includes the 7th row (weight ignored — reference quirk)."""
    del weight
    csq, core, A11, A22, B12, g1c, g2c = _six_dof_products_core_t(
        q1, t1, q2, t2, obs_q, obs_t)
    s2 = s * s
    one2s = 1.0 - 2.0 * s
    r7 = s * (1.0 - s)
    rsq = s2 * csq + r7 * r7
    ds = csq + one2s * one2s
    gs = s * csq + r7 * one2s
    stb = lambda xs, f: jnp.stack([x * f for x in xs])
    return (rsq, stb(A11, s2), stb(A22, s2), stb(B12, s2),
            stb(g1c, s), stb(g2c, s), ds, stb(g1c, s2), stb(g2c, s2), gs)


def node_prior_block_products_t(q, t, prior_q, prior_t, weight):
    """Entry-major prior products: (rsq, A (36,)+batch, g (6,)+batch)."""
    xp, yp, zp, wp = _unpack4(prior_q)
    a = (-xp, -yp, -zp, wp)
    qt = _unpack4(q)
    tc = _unpack3(t)
    tpc = _unpack3(prior_t)
    diff = tuple(tc[i] - tpc[i] for i in range(3))
    dt_ = _qrot_c(a, diff)
    dq = _qmul_c(a, qt)
    r_e = tuple(2.0 * dq[i] for i in range(3))
    rsq = sum(c * c for c in dt_ + r_e)

    # M with a = conj(prior_q), b = q
    ax, ay, az, aw = a
    bx, by, bz, bw = qt
    P = ((bw, bz, -by), (-bz, bw, bx), (by, -bx, bw))
    Q = ((aw, -az, ay), (az, aw, -ax), (-ay, ax, aw))
    bv = (bx, by, bz)
    av = (ax, ay, az)
    M = []
    for i in range(3):
        for j in range(3):
            sv = P[i][0] * Q[0][j] + P[i][1] * Q[1][j] + P[i][2] * Q[2][j]
            M.append(2.0 * (sv - bv[i] * av[j]))
    MtM = [None] * 9
    for i in range(3):
        for j in range(i, 3):
            sv = (M[0 + i] * M[0 + j] + M[3 + i] * M[3 + j]
                  + M[6 + i] * M[6 + j])
            MtM[3 * i + j] = sv
            MtM[3 * j + i] = sv
    one = jnp.ones_like(rsq)
    zero = jnp.zeros_like(rsq)
    eye9 = (one, zero, zero, zero, one, zero, zero, zero, one)
    zero9 = (zero,) * 9
    A = []
    for i in range(3):
        A += [MtM[3 * i], MtM[3 * i + 1], MtM[3 * i + 2],
              zero, zero, zero]
    for i in range(3):
        A += [zero, zero, zero, eye9[3 * i], eye9[3 * i + 1], eye9[3 * i + 2]]
    del zero9
    Mte = tuple(M[0 + i] * r_e[0] + M[3 + i] * r_e[1] + M[6 + i] * r_e[2]
                for i in range(3))
    g = list(Mte) + list(diff)
    w2 = weight * weight
    return (rsq * w2, jnp.stack([x * w2 for x in A]),
            jnp.stack([x * w2 for x in g]))


def node_prior_residual_jac(q, t, prior_q, prior_t, weight):
    """(r, J) for the prior residual — analytic.

    delta_t = Rp^T (t - tp) -> d/dt = Rp^T, d/dtheta = 0;
    e = 2 vec(qp^-1 (x) dq (x) q) -> d/dtheta = M(a=qp^-1, b=q)."""
    qpc = se3.quat_conj(prior_q)
    RpT = se3.quat_to_rot(qpc)
    dt_ = se3.quat_rotate(qpc, t - prior_t)
    dq = se3.quat_mul(qpc, q)
    r = jnp.concatenate([dt_, 2.0 * dq[..., :3]], axis=-1)

    M = _rot_row_M(prior_q, se3.quat_identity(q.shape[:-1], q.dtype), q)
    zero = jnp.zeros_like(M)
    J = jnp.concatenate([
        jnp.concatenate([zero, RpT], axis=-1),
        jnp.concatenate([M, zero], axis=-1),
    ], axis=-2)
    w = weight[..., None]
    return r * w, J * w[..., None]
