"""Instrumented run of the loop-closure e2e scenario: per-frame estimator
health (velocity, biases, cost, feature counts) to localize the divergence."""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import isvins_tpu  # noqa: F401
from debug_loop import build_and_run  # reuse config/world
from isvins_tpu.config import (
    CameraConfig, NoiseConfig, PoseGraphConfig, TrackerConfig, WindowConfig,
    euroc_config,
)
from isvins_tpu.geom import mat_to_quat
from isvins_tpu.solver import WindowDims
from isvins_tpu.system import System
from isvins_tpu.utils.synthetic import RoomRenderer, make_world


def main():
    H, W = 240, 320
    f = 200.0
    cam = CameraConfig(width=W, height=H, fx=f, fy=f, cx=W / 2, cy=H / 2,
                       k1=0.0, k2=0.0, p1=0.0, p2=0.0)
    R_bc = ((0.0, 0.0, 1.0), (-1.0, 0.0, 0.0), (0.0, -1.0, 0.0))
    cfg = euroc_config().replace(
        camera=cam,
        tracker=TrackerConfig(max_cnt=70, min_dist=16, freq=100, lk_levels=4,
                              lk_win=21, equalize=False, border=4),
        window=WindowConfig(vo_size=4, all_size=10, max_features=256,
                            max_imu_per_frame=64),
        noise=NoiseConfig(acc_n=0.01, gyr_n=0.001, acc_w=1e-4, gyr_w=1e-5,
                          pixel_sqrt_info=f),
        solver=euroc_config().solver.__class__(excitation_threshold=0.08),
        posegraph=PoseGraphConfig(enabled=False),
        tic=(0.0, 0.0, 0.0),
        ric=R_bc,
    )
    dims = WindowDims(B=10, Vo=4, F=256, N=2048)
    n_frames = 130
    world = make_world(n_frames=n_frames, frame_hz=10.0, imu_hz=200.0,
                       n_landmarks=300, seed=4, traj_r=3.0, traj_w=0.6,
                       noise_acc=0.05, noise_gyr=0.005,
                       ba=(0.02, -0.015, 0.01), bg=(0.002, -0.003, 0.004))
    qic = np.asarray(mat_to_quat(jnp.asarray(np.array(R_bc))))
    renderer = RoomRenderer(world, cam, np.zeros(3), qic, seed=5)

    sys_ = System(cfg, dims, enable_loop=False)
    est = sys_.estimator
    rows = []
    for k in range(n_frames):
        if k > 0:
            n = int(np.sum(world.imu_dts[k - 1] > 0))
            acc_t = world.frame_times[k - 1]
            for s in range(n):
                acc_t += world.imu_dts[k - 1][s]
                sys_.pub_imu(acc_t, world.imu_accs[k - 1][s], world.imu_gyrs[k - 1][s])
        img, _, _ = renderer.render(k)
        sys_.pub_image(world.frame_times[k], img)
        j = est.dims.B - 1
        fm = est.f_manager
        good = fm.good_mask()
        n_good = int(good.sum())
        n_depth = int((good & (fm.depth > 0)).sum())
        gt_v = world.V[k] if hasattr(world, "V") else np.zeros(3)
        print(
            f"f {k:3d} t={world.frame_times[k]:6.2f} flag={est.solver_flag} "
            f"P={np.round(est.Ps[j],2)} gtP={np.round(world.P[k],2)} "
            f"|V|={np.linalg.norm(est.Vs[j]):.2f} "
            f"ba={np.round(est.Bas[j],3)} bg={np.round(est.Bgs[j],4)} "
            f"cost={getattr(est,'last_cost',0):.1f} feats good={n_good} "
            f"depth={n_depth} fails={est.failure_count}",
            flush=True,
        )


if __name__ == "__main__":
    main()
