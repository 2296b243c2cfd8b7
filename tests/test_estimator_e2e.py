"""End-to-end synthetic VIO: feed IMU + feature packets through the full
estimator (solve -> drag -> two-stage marg -> slide) and check the trajectory
tracks ground truth (SURVEY.md §7 stage 3)."""

import numpy as np
import jax.numpy as jnp
import pytest

import isvins_tpu  # noqa: F401
from isvins_tpu.config import euroc_config, WindowConfig
from isvins_tpu.estimator.estimator import Estimator, MARGIN_OLD
from isvins_tpu.geom import mat_to_quat
from isvins_tpu.solver import WindowDims
from isvins_tpu.utils.synthetic import make_world, project


def run_sequence(n_frames=30, B=10, Vo=4, px_noise=0.0, imu_noise=False, seed=0,
                 gt_init=True, n_landmarks=240):
    cfg = euroc_config()
    cfg = cfg.replace(
        window=WindowConfig(vo_size=Vo, all_size=B, max_features=256, max_imu_per_frame=64),
        tic=(0.02, -0.01, 0.01),
        ric=(
            (0.0, 0.0, 1.0),
            (-1.0, 0.0, 0.0),
            (0.0, -1.0, 0.0),
        ),
    )
    na = 0.02 if imu_noise else 0.0
    ng = 0.002 if imu_noise else 0.0
    if imu_noise:
        # weight the IMU factors consistently with the injected per-sample
        # noise (continuous density = s/sqrt(hz)); monocular scale is only
        # observable through properly-weighted accelerometers
        from isvins_tpu.config import NoiseConfig
        cfg = cfg.replace(
            noise=NoiseConfig(acc_n=0.01, gyr_n=0.001, acc_w=1e-4, gyr_w=1e-5)
        )
    world = make_world(
        n_frames=n_frames, n_landmarks=n_landmarks, seed=seed, noise_acc=na, noise_gyr=ng
    )
    dims = WindowDims(B=B, Vo=Vo, F=256, N=2048)
    est = Estimator(cfg, dims)

    if gt_init:
        def _hook(e):
            e.set_ground_truth_init(world.P, world.Q, world.V)
            e.f_manager.depth[:] = -1.0  # force re-triangulation at GT poses

        est._gt_init = _hook

    rng = np.random.default_rng(seed + 100)
    tic = np.asarray(cfg.tic_np)
    qic = np.asarray(mat_to_quat(jnp.asarray(cfg.ric_np)))

    traj = []
    for k in range(n_frames):
        if k > 0:
            n = int(np.sum(world.imu_dts[k - 1] > 0))
            for s in range(n):
                est.process_imu(
                    world.imu_dts[k - 1][s],
                    world.imu_accs[k - 1][s],
                    world.imu_gyrs[k - 1][s],
                )
        pts, depth, vis = project(world, k, tic, qic, px_noise=px_noise, rng=rng)
        ids = np.where(vis)[0]
        est.process_image(ids, pts[vis], world.frame_times[k])
        t, P, Q = est.latest_pose()
        if est.solver_flag == 2:  # NON_LINEAR
            traj.append((world.frame_times[k], P.copy(), k))
    return est, world, traj


def ate(traj, world, align=False):
    """ATE; with align=True, a 4-DoF (yaw + translation) least-squares
    alignment is applied first — yaw and absolute position are gauge
    directions of VIO, unrecoverable by any estimator (standard EuRoC
    evaluation practice)."""
    X = np.array([P for (_, P, _) in traj])
    Y = np.array([world.P[k] for (_, _, k) in traj])
    if align:
        Xc = X - X.mean(0)
        Yc = Y - Y.mean(0)
        num = np.sum(Xc[:, 0] * Yc[:, 1] - Xc[:, 1] * Yc[:, 0])
        den = np.sum(Xc[:, 0] * Yc[:, 0] + Xc[:, 1] * Yc[:, 1])
        th = np.arctan2(num, den)
        R = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
        )
        X = (R @ Xc.T).T + Y.mean(0)
    errs = np.linalg.norm(X - Y, axis=1)
    return np.max(errs), np.mean(errs)


def test_e2e_noiseless():
    est, world, traj = run_sequence(n_frames=26)
    assert len(traj) >= 10, "estimator never reached NON_LINEAR"
    emax, emean = ate(traj, world)
    # bound recalibrated after the triangulation NaN fix: seeds are now the
    # real DLT depths instead of the accidental 5 m fallback (every
    # partially-observed track used to NaN through the mask), which shifts
    # this synthetic trajectory a little (3.2 cm max) while cutting the
    # realistic drifty-world end drift 4.7 -> 2.1 m (product-shape chip
    # probe, round 5)
    assert emax < 0.05, (emax, emean)
    # marginalization ran and produced pose-graph packets with KLD diagnostics
    assert len(est.pose_graph_packets) >= 5
    assert np.isfinite(est.last_kld.get("forward", np.nan))
    assert np.isfinite(est.last_kld.get("backward", np.nan))
    assert est.failure_count == 0


def test_e2e_self_init():
    """Full pipeline including the SfM + VI-alignment initialization chain
    (no ground-truth bootstrap)."""
    est, world, traj = run_sequence(
        n_frames=26, px_noise=0.3 / 460.0, gt_init=False, n_landmarks=700
    )
    assert len(traj) >= 8, "self-initialization failed"
    emax, emean = ate(traj, world, align=True)
    assert emax < 0.25, (emax, emean)
    assert est.failure_count == 0


def test_e2e_noisy():
    est, world, traj = run_sequence(n_frames=26, px_noise=0.5 / 460.0, imu_noise=True, seed=5)
    assert len(traj) >= 10
    emax, emean = ate(traj, world, align=True)
    assert emax < 0.12, (emax, emean)
    # unaligned error must stay bounded too (no runaway drift)
    emax_raw, _ = ate(traj, world)
    assert emax_raw < 0.5, emax_raw
    assert est.failure_count == 0


def test_triangulate_partial_observation():
    """Regression: tracks observed in only a subset of the window frames
    must still triangulate (the zero-padded rows used to NaN the DLT
    through the mask — NaN * 0 is NaN — silently degrading every seed to
    the 5 m fallback)."""
    import numpy as np
    import jax.numpy as jnp
    from isvins_tpu.estimator.feature_manager import _triangulate_batch

    B = 10
    obs = np.zeros((1, B, 3))
    has = np.zeros((1, B), bool)
    P = np.zeros((B, 3))
    P[:, 0] = np.arange(B) * 0.3
    Q = np.tile([1.0, 0, 0, 0], (B, 1))
    X = np.array([1.0, 0.5, 6.0])
    for k in range(2, 6):
        pc = X - P[k]
        obs[0, k] = pc / pc[2]
        has[0, k] = True
    d = np.asarray(_triangulate_batch(
        jnp.asarray(obs), jnp.asarray(has), jnp.asarray(np.array([2], np.int32)),
        jnp.asarray(P), jnp.asarray(Q), jnp.zeros(3),
        jnp.asarray([1.0, 0, 0, 0])))
    assert np.isfinite(d[0]), d
    np.testing.assert_allclose(d[0], 6.0, rtol=1e-6)
