"""Hand-eye extrinsic rotation calibration on synthetic rotations."""

import numpy as np
import jax.numpy as jnp

import isvins_tpu  # noqa: F401
from isvins_tpu.geom import mat_to_quat, quat_to_mat, so3_exp_mat, so3_exp_quat
from isvins_tpu.initial.ex_rotation import ExtrinsicRotationCalibrator


def _rot_angle_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(c, -1.0, 1.0)))


def test_wired_extrinsic_calibration():
    """estimate_extrinsic==2 end-to-end (estimator.cpp:139–165): the estimator
    runs the hand-eye calibrator per frame, defers initialization until it is
    confident, installs the calibrated ric, and drops to refinement mode 1.
    Observations are rendered with the TRUE extrinsic while the config carries
    a ~12°-perturbed guess."""
    from isvins_tpu.config import euroc_config, WindowConfig
    from isvins_tpu.estimator.estimator import Estimator
    from isvins_tpu.solver import WindowDims
    from isvins_tpu.utils.synthetic import make_world, project

    R_true = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    q_true = np.asarray(mat_to_quat(jnp.asarray(R_true)))
    dR = np.asarray(so3_exp_mat(jnp.asarray([0.10, -0.12, 0.08])))  # ~10.3°
    cfg = euroc_config()
    cfg = cfg.replace(
        window=WindowConfig(vo_size=4, all_size=10, max_features=256,
                            max_imu_per_frame=64),
        tic=(0.02, -0.01, 0.01),
        ric=tuple(tuple(float(v) for v in row) for row in (dR @ R_true)),
        estimate_extrinsic=2,
    )
    n_frames = 48
    world = make_world(
        n_frames=n_frames, n_landmarks=900, seed=3,
        traj_w=0.8, wobble=(0.5, 0.45),  # 3-axis excitation for observability
    )
    dims = WindowDims(B=10, Vo=4, F=256, N=2048)
    est = Estimator(cfg, dims)
    assert _rot_angle_deg(
        np.asarray(so3_exp_mat(jnp.zeros(3))) @ R_true,
        np.asarray(jnp.asarray(cfg.ric_np)),
    ) > 8.0  # the config guess really is wrong

    tic = np.asarray(cfg.tic_np)
    fired_at = None
    n_solved = 0
    for k in range(n_frames):
        if k > 0:
            n = int(np.sum(world.imu_dts[k - 1] > 0))
            for s in range(n):
                est.process_imu(
                    world.imu_dts[k - 1][s],
                    world.imu_accs[k - 1][s],
                    world.imu_gyrs[k - 1][s],
                )
        pts, _, vis = project(world, k, tic, q_true)
        ids = np.where(vis)[0]
        info = est.process_image(ids, pts[vis], world.frame_times[k])
        if info.get("extrinsic_calibrated") and fired_at is None:
            fired_at = k
            err0 = _rot_angle_deg(
                np.asarray(quat_to_mat(jnp.asarray(est.qic))), R_true
            )
            assert err0 < 3.0, err0  # hand-eye output close to truth
        if info.get("solved"):
            n_solved += 1

    assert fired_at is not None, "calibration never became confident"
    assert est.estimate_extrinsic == 1  # promoted to refinement mode
    assert n_solved >= 5, "initialization never succeeded after calibration"
    # after solver refinement, the extrinsic should be tight
    err = _rot_angle_deg(np.asarray(quat_to_mat(jnp.asarray(est.qic))), R_true)
    assert err < 1.5, err
    assert est.failure_count == 0


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
