"""Inverse-depth reprojection factor i -> j through the IMU-camera extrinsic.

Math contract: src/factor/projection_factor.cpp:24–122 (pinhole normalized-
plane error variant; the unit-sphere ifdef branch is not used by the EuRoC
config). All functions are unweighted — the solver scales residual rows by
PIXEL_SQRT_INFO (estimator.cpp:35) and applies the Cauchy robust weight.

Batched via vmap over observations; this is the highest-count factor
(~500–1000 per window solve) and the main Schur-complement workload.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geom import quat_conj, quat_rotate, quat_to_mat, skew


def _safe_depth(d, eps=1e-6):
    """Sign-preserving clamp away from zero; a landmark passing through the
    camera plane during an aggressive LM trial step must yield a large finite
    residual (Cauchy-downweighted), not NaN."""
    return jnp.where(jnp.abs(d) > eps, d, jnp.where(d >= 0, eps, -eps))


def projection_residual(pts_i, pts_j, Pi, Qi, Pj, Qj, tic, qic, inv_dep_i):
    """pts_i, pts_j: (3,) normalized-plane bearings [x, y, 1] in frames i, j.
    Returns (2,) residual."""
    pts_cam_i = pts_i / inv_dep_i
    pts_imu_i = quat_rotate(qic, pts_cam_i) + tic
    pts_w = quat_rotate(Qi, pts_imu_i) + Pi
    pts_imu_j = quat_rotate(quat_conj(Qj), pts_w - Pj)
    pts_cam_j = quat_rotate(quat_conj(qic), pts_imu_j - tic)
    dep_j = _safe_depth(pts_cam_j[2])
    return pts_cam_j[:2] / dep_j - pts_j[:2]


def projection_residual_jacobians(pts_i, pts_j, Pi, Qi, Pj, Qj, tic, qic, inv_dep_i):
    """Residual + minimal Jacobians wrt pose_i (2,6), pose_j (2,6),
    extrinsic (2,6), inv_depth (2,). projection_factor.cpp:54–118."""
    dtype = Pi.dtype
    pts_cam_i = pts_i / inv_dep_i
    pts_imu_i = quat_rotate(qic, pts_cam_i) + tic
    pts_w = quat_rotate(Qi, pts_imu_i) + Pi
    pts_imu_j = quat_rotate(quat_conj(Qj), pts_w - Pj)
    pts_cam_j = quat_rotate(quat_conj(qic), pts_imu_j - tic)
    dep_j = _safe_depth(pts_cam_j[2])
    r = pts_cam_j[:2] / dep_j - pts_j[:2]

    Ri = quat_to_mat(Qi)
    Rj = quat_to_mat(Qj)
    ric = quat_to_mat(qic)
    ricT = ric.T
    RjT = Rj.T

    reduce = jnp.array(
        [
            [1.0 / dep_j, 0.0, -pts_cam_j[0] / (dep_j * dep_j)],
            [0.0, 1.0 / dep_j, -pts_cam_j[1] / (dep_j * dep_j)],
        ],
        dtype,
    )

    ricT_RjT = ricT @ RjT
    J_pi = jnp.concatenate(
        [ricT_RjT, ricT_RjT @ Ri @ (-skew(pts_imu_i))], axis=1
    )  # (3,6)
    J_pj = jnp.concatenate([-ricT_RjT, ricT @ skew(pts_imu_j)], axis=1)

    tmp_r = ricT_RjT @ Ri @ ric
    J_ex_rot = (
        -tmp_r @ skew(pts_cam_i)
        + skew(tmp_r @ pts_cam_i)
        + skew(ricT @ (RjT @ (Ri @ tic + Pi - Pj) - tic))
    )
    J_ex = jnp.concatenate([ricT @ (RjT @ Ri - jnp.eye(3, dtype=dtype)), J_ex_rot], axis=1)

    J_dep = tmp_r @ pts_i * (-1.0 / (inv_dep_i * inv_dep_i))

    return r, reduce @ J_pi, reduce @ J_pj, reduce @ J_ex, reduce @ J_dep
