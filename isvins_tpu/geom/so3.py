"""SO(3) operations on quaternions and rotation matrices.

Quaternion convention: Hamilton, stored **wxyz** as shape (..., 4) arrays
(matches Eigen's semantics in the reference; Eigen stores xyzw internally but
constructs as (w,x,y,z)).

All functions broadcast over leading batch dimensions and preserve input
dtype. Small-angle branches use Taylor expansions selected with `jnp.where`
on *safe* arguments so no NaN leaks through the unused branch (required for
`jax.grad` correctness).

Reference parity: include/utility/utility.h (deltaQ, skewSymmetric, Qleft,
Qright, ypr/R conversions, g2R) and include/utility/sophus_utils.hpp
(rightJacobian{,Inv}SO3, leftJacobian{,Inv}SO3 — Basalt-derived).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def skew(v):
    """(...,3) -> (...,3,3) cross-product matrix [v]x (utility.h skewSymmetric)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def unskew(M):
    """(...,3,3) -> (...,3), inverse of skew (antisymmetric part)."""
    return jnp.stack(
        [M[..., 2, 1] - M[..., 1, 2], M[..., 0, 2] - M[..., 2, 0], M[..., 1, 0] - M[..., 0, 1]],
        axis=-1,
    ) * 0.5


def quat_identity(dtype=jnp.float64):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_mul(q, p):
    """Hamilton product q*p, both (...,4) wxyz."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    return jnp.stack(
        [
            qw * pw - qx * px - qy * py - qz * pz,
            qw * px + qx * pw + qy * pz - qz * py,
            qw * py - qx * pz + qy * pw + qz * px,
            qw * pz + qx * py - qy * px + qz * pw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q):
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(n, _EPS)
    # canonicalize sign (w >= 0) so log/interp are stable
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_rotate(q, v):
    """Rotate vector(s) v (...,3) by quaternion(s) q (...,4): R(q) @ v."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_mat(q):
    """(...,4) wxyz -> (...,3,3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def mat_to_quat(R):
    """(...,3,3) -> (...,4) wxyz. Branchless Shepperd: build all four candidate
    quaternions and select the one keyed by the largest diagonal combination
    (numerically stable for any rotation)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidates, each scaled by 4*component^2 (non-negative)
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def safe_sqrt(a):
        return jnp.sqrt(jnp.maximum(a, 0.0))

    # candidate from w
    sw = safe_sqrt(qw2) * 2.0
    cw = jnp.stack([qw2 * 2.0 / 2.0, (m21 - m12), (m02 - m20), (m10 - m01)], axis=-1) / jnp.maximum(
        sw, _EPS
    )[..., None]
    # candidate from x
    sx = safe_sqrt(qx2) * 2.0
    cx = jnp.stack([(m21 - m12), qx2 * 2.0 / 2.0, (m01 + m10), (m02 + m20)], axis=-1) / jnp.maximum(
        sx, _EPS
    )[..., None]
    # candidate from y
    sy = safe_sqrt(qy2) * 2.0
    cy = jnp.stack([(m02 - m20), (m01 + m10), qy2 * 2.0 / 2.0, (m12 + m21)], axis=-1) / jnp.maximum(
        sy, _EPS
    )[..., None]
    # candidate from z
    sz = safe_sqrt(qz2) * 2.0
    cz = jnp.stack([(m10 - m01), (m02 + m20), (m12 + m21), qz2 * 2.0 / 2.0], axis=-1) / jnp.maximum(
        sz, _EPS
    )[..., None]

    vals = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)  # (...,4)
    idx = jnp.argmax(vals, axis=-1)  # (...,)
    cands = jnp.stack([cw, cx, cy, cz], axis=-2)  # (...,4cand,4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32).repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    return quat_normalize(q)


def _safe_angle_terms(theta_sq):
    """Common Taylor-vs-exact coefficient helpers on |phi|^2.

    Returns (small, theta, theta_sq_safe); exact-branch expressions MUST use
    the safe values so the unselected `where` branch never produces inf/NaN
    (which would poison gradients)."""
    small = theta_sq < _EPS
    theta_sq_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(theta_sq_safe)
    return small, theta, theta_sq_safe


def so3_exp_quat(phi):
    """Exponential map (...,3) -> unit quaternion (...,4)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    small, theta, theta_sq_safe = _safe_angle_terms(theta_sq)
    half = theta * 0.5
    # sin(t/2)/t
    k_exact = jnp.sin(half) / theta
    k_taylor = 0.5 - theta_sq / 48.0
    k = jnp.where(small, k_taylor, k_exact)
    w_exact = jnp.cos(half)
    w_taylor = 1.0 - theta_sq / 8.0
    w = jnp.where(small, w_taylor, w_exact)
    return jnp.concatenate([w[..., None], k[..., None] * phi], axis=-1)


def so3_exp_mat(phi):
    """Rodrigues: (...,3) -> (...,3,3)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    small, theta, theta_sq_safe = _safe_angle_terms(theta_sq)
    W = skew(phi)
    W2 = W @ W
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq_safe)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return I + a[..., None, None] * W + b[..., None, None] * W2


def quat_log(q):
    """Log map (...,4) -> (...,3). Handles double cover by sign fix."""
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    vn_sq = jnp.sum(v * v, axis=-1)
    small = vn_sq < _EPS
    vn = jnp.sqrt(jnp.where(small, 1.0, vn_sq))
    angle = 2.0 * jnp.arctan2(vn, w)
    k_exact = angle / vn
    # small angle: 2/w * (1 - |v|^2/(3 w^2))
    k_taylor = 2.0 / jnp.maximum(w, _EPS) * (1.0 - vn_sq / (3.0 * jnp.maximum(w * w, _EPS)))
    k = jnp.where(small, k_taylor, k_exact)
    return k[..., None] * v


def so3_log_mat(R):
    return quat_log(mat_to_quat(R))


def right_jacobian_so3(phi):
    """Jr(phi): Exp(phi + dphi) ~= Exp(phi) Exp(Jr dphi).
    sophus_utils.hpp rightJacobianSO3."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    small, theta, theta_sq_safe = _safe_angle_terms(theta_sq)
    W = skew(phi)
    W2 = W @ W
    c1 = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq_safe)
    c2 = jnp.where(
        small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / (theta_sq_safe * theta)
    )
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return I - c1[..., None, None] * W + c2[..., None, None] * W2


def right_jacobian_inv_so3(phi):
    """Jr^{-1}(phi). sophus_utils.hpp rightJacobianInvSO3."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    small, theta, theta_sq_safe = _safe_angle_terms(theta_sq)
    W = skew(phi)
    W2 = W @ W
    sin_safe = jnp.where(small, 1.0, jnp.sin(theta))
    c_exact = 1.0 / theta_sq_safe - (1.0 + jnp.cos(theta)) / (2.0 * theta * sin_safe)
    c_taylor = 1.0 / 12.0 + theta_sq / 720.0
    c = jnp.where(small, c_taylor, c_exact)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return I + 0.5 * W + c[..., None, None] * W2


def left_jacobian_so3(phi):
    return right_jacobian_so3(-phi)


def left_jacobian_inv_so3(phi):
    return right_jacobian_inv_so3(-phi)


def ypr_to_mat(ypr_deg):
    """(...,3) yaw,pitch,roll in degrees -> (...,3,3) = Rz(y)Ry(p)Rx(r).
    utility.h ypr2R."""
    ypr = ypr_deg * (jnp.pi / 180.0)
    y, p, r = ypr[..., 0], ypr[..., 1], ypr[..., 2]
    cy, sy = jnp.cos(y), jnp.sin(y)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cr, sr = jnp.cos(r), jnp.sin(r)
    zero = jnp.zeros_like(y)
    one = jnp.ones_like(y)
    Rz = jnp.stack(
        [
            jnp.stack([cy, -sy, zero], -1),
            jnp.stack([sy, cy, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )
    Ry = jnp.stack(
        [
            jnp.stack([cp, zero, sp], -1),
            jnp.stack([zero, one, zero], -1),
            jnp.stack([-sp, zero, cp], -1),
        ],
        -2,
    )
    Rx = jnp.stack(
        [
            jnp.stack([one, zero, zero], -1),
            jnp.stack([zero, cr, -sr], -1),
            jnp.stack([zero, sr, cr], -1),
        ],
        -2,
    )
    return Rz @ Ry @ Rx


def mat_to_ypr(R):
    """(...,3,3) -> (...,3) yaw,pitch,roll in degrees. utility.h R2ypr."""
    n = R[..., :, 0]
    o = R[..., :, 1]
    a = R[..., :, 2]
    y = jnp.arctan2(n[..., 1], n[..., 0])
    p = jnp.arctan2(-n[..., 2], n[..., 0] * jnp.cos(y) + n[..., 1] * jnp.sin(y))
    r = jnp.arctan2(
        a[..., 0] * jnp.sin(y) - a[..., 1] * jnp.cos(y),
        -o[..., 0] * jnp.sin(y) + o[..., 1] * jnp.cos(y),
    )
    return jnp.stack([y, p, r], axis=-1) * (180.0 / jnp.pi)


def g2R(g):
    """Gravity-aligning rotation with yaw zeroed (utility.cpp g2R): returns R0
    such that R0 @ g.normalized() = [0,0,1] and yaw(R0) = 0."""
    ng1 = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    ng2 = jnp.array([0.0, 0.0, 1.0], dtype=g.dtype)
    # rotation taking ng1 to ng2 (axis-angle)
    axis = jnp.cross(ng1, ng2)
    s = jnp.linalg.norm(axis, axis=-1)
    c = jnp.sum(ng1 * ng2, axis=-1)
    angle = jnp.arctan2(s, c)
    axis = axis / jnp.maximum(s, _EPS)[..., None]
    R0 = so3_exp_mat(axis * angle[..., None])
    yaw = mat_to_ypr(R0)[..., 0]
    Ryaw = ypr_to_mat(jnp.stack([-yaw, jnp.zeros_like(yaw), jnp.zeros_like(yaw)], axis=-1))
    return Ryaw @ R0
