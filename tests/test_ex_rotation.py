"""Hand-eye extrinsic rotation calibration on synthetic rotations."""

import numpy as np
import jax.numpy as jnp

import isvins_tpu  # noqa: F401
from isvins_tpu.geom import mat_to_quat, so3_exp_mat, so3_exp_quat
from isvins_tpu.initial.ex_rotation import ExtrinsicRotationCalibrator


def test_ex_rotation_recovers_known_extrinsic(rng):
    # true extrinsic: EuRoC-like rotation
    R_ic = np.asarray(
        so3_exp_mat(jnp.asarray([0.3, -1.2, 0.5]))
    )
    calib = ExtrinsicRotationCalibrator(vo_size=8)

    result = None
    for k in range(14):
        phi = rng.normal(size=3) * 0.3  # strong rotational excitation
        R_imu = np.asarray(so3_exp_mat(jnp.asarray(phi)))
        q_imu = np.asarray(mat_to_quat(jnp.asarray(R_imu)))
        # camera rotation consistent with the hand-eye constraint:
        # R_c = R_ic^T R_imu R_ic
        R_c = R_ic.T @ R_imu @ R_ic

        # synthesize correspondences realizing R_c with small translation
        n = 60
        X = rng.normal(size=(n, 3)) * np.array([2.0, 1.5, 0.5]) + np.array([0, 0, 6.0])
        t = rng.normal(size=3) * 0.1
        x1 = X / X[:, 2:3]
        X2 = (R_c.T @ (X - t).T).T
        x2 = X2 / X2[:, 2:3]
        r = calib.push(x1[:, :2], x2[:, :2], q_imu)
        if r is not None:
            result = r

    assert result is not None, "calibration never became confident"
    err = np.abs(result - R_ic).max()
    assert err < 2e-2, err
