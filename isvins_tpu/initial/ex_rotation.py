"""Online camera-IMU extrinsic rotation calibration (hand-eye).

Replaces InitialEXRotation (src/initial/initial_ex_rotation.cpp:11–66): per
frame pair, the camera rotation (from the essential matrix) and the IMU
preintegrated rotation constrain q_cam ⊗ q_ic = q_ic ⊗ q_imu; the stacked
quaternion-product-matrix system is solved by SVD with Huber-style angular
weights, accepted once the second-smallest singular value shows the rotation
is well-observed (frame_count >= Vo_SIZE && sigma[2] > 0.25). Used only when
estimate_extrinsic == 2 (estimator.cpp:139–153).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..geom import mat_to_quat, quat_conj, quat_mul, quat_to_mat
from .five_point import solve_relative_pose


def _qleft_mat(q):
    """Eigen-vec-last-layout left-product matrix (x,y,z,w ordering like the
    reference's stacked system)."""
    w, x, y, z = q
    v = np.array([x, y, z])
    L = np.zeros((4, 4))
    L[:3, :3] = w * np.eye(3) + _skew(v)
    L[:3, 3] = v
    L[3, :3] = -v
    L[3, 3] = w
    return L


def _qright_mat(q):
    w, x, y, z = q
    v = np.array([x, y, z])
    R = np.zeros((4, 4))
    R[:3, :3] = w * np.eye(3) - _skew(v)
    R[:3, 3] = v
    R[3, :3] = -v
    R[3, 3] = w
    return R


def _skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


class ExtrinsicRotationCalibrator:
    def __init__(self, vo_size: int = 8):
        self.vo_size = vo_size
        self.Rc: List[np.ndarray] = []
        self.Rimu: List[np.ndarray] = []
        self.ric = np.eye(3)
        self.last_S = np.zeros(4)  # singular values of the last stacked solve

    def push(self, corres_i, corres_j, delta_q_imu) -> Optional[np.ndarray]:
        """corres_*: (n, 2|3) normalized correspondences between consecutive
        frames; delta_q_imu: (4,) wxyz preintegrated rotation. Returns the
        calibrated R_ic once confident, else None."""
        ok, R_rel, _, _ = solve_relative_pose(corres_i, corres_j)
        if not ok:
            # fall back: pure rotation guess from the IMU via current ric
            R_rel = self.ric.T @ np.asarray(quat_to_mat(jnp.asarray(delta_q_imu))) @ self.ric
        # solve_relative_pose's R (pose of cam_j in cam_i) satisfies
        # R_c = R_ic^T R_imu R_ic directly — the hand-eye stack's R_c
        self.Rc.append(np.asarray(R_rel))
        self.Rimu.append(np.asarray(quat_to_mat(jnp.asarray(delta_q_imu))))

        n = len(self.Rc)
        A = np.zeros((4 * n, 4))
        for i in range(n):
            q_c = np.asarray(mat_to_quat(jnp.asarray(self.Rc[i])))
            # predicted camera rotation through the current extrinsic
            Rc_g = self.ric.T @ self.Rimu[i] @ self.ric
            q_cg = np.asarray(mat_to_quat(jnp.asarray(Rc_g)))
            ang = 2 * np.degrees(
                np.arccos(np.clip(abs(float(np.dot(q_c, q_cg))), -1, 1))
            )
            huber = 5.0 / ang if ang > 5.0 else 1.0
            L = _qleft_mat(q_c)
            q_imu = np.asarray(mat_to_quat(jnp.asarray(self.Rimu[i])))
            R = _qright_mat(q_imu)
            A[4 * i : 4 * i + 4] = huber * (L - R)

        _, S, Vt = np.linalg.svd(A)
        self.last_S = S
        x = Vt[-1]  # (x,y,z,w) layout
        q_ic = np.array([x[3], x[0], x[1], x[2]])
        self.ric = np.asarray(quat_to_mat(jnp.asarray(q_ic))).T

        # ref gate: singularValues().tail<3>()(1) == S[2], the second-smallest
        # (initial_ex_rotation.cpp:60–63) — accepts only once the rotation is
        # observed in all directions
        if n >= self.vo_size and S[2] > 0.25:
            return self.ric.copy()
        return None
