"""Offline debug harness for the loop-closure e2e scenario.

Runs the exact test_system_loop_closure_reduces_drift sequence once, dumps
the keyframe DB to debug_loop_db.npz, and prints a per-keyframe retrieval
score table + _find_connection reject reasons so retrieval tuning can be
replayed offline without the 7-minute pipeline run.
"""

import sys
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import isvins_tpu  # noqa: F401
from isvins_tpu.config import (
    CameraConfig, NoiseConfig, PoseGraphConfig, TrackerConfig, WindowConfig,
    euroc_config,
)
from isvins_tpu.geom import mat_to_quat
from isvins_tpu.solver import WindowDims
from isvins_tpu.system import System
from isvins_tpu.utils.synthetic import RoomRenderer, make_world


def build_and_run():
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
        posegraph=PoseGraphConfig(skip_recent=25, min_loop_matches=15,
                                  keyframe_min_dist=0.3,
                                  max_keyframes=256, max_kp_per_kf=256),
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

    sys_ = System(cfg, dims, enable_loop=True)
    for k in range(n_frames):
        if k > 0:
            n = int(np.sum(world.imu_dts[k - 1] > 0))
            acc_t = world.frame_times[k - 1]
            for s in range(n):
                acc_t += world.imu_dts[k - 1][s]
                sys_.pub_imu(acc_t, world.imu_accs[k - 1][s], world.imu_gyrs[k - 1][s])
        img, _, _ = renderer.render(k)
        sys_.pub_image(world.frame_times[k], img)
    return sys_, world


def dump(sys_, path="debug_loop_db.npz"):
    db = sys_.pgbuilder.db
    arrs = {k: v for k, v in vars(db).items() if isinstance(v, np.ndarray)}
    arrs["n"] = np.asarray(db.n)
    np.savez_compressed(path, **arrs)
    print(f"dumped db (n={db.n}) to {path}")


def analyze(sys_, world):
    db = sys_.pgbuilder.db
    pg = sys_.pgbuilder.pg
    n = db.n
    print(f"keyframes: {n}, n_loops: {sys_.pgbuilder.n_loops}")
    # ground-truth positions per keyframe (by timestamp association)
    gt = np.array([world.P[np.argmin(np.abs(world.frame_times - t))] for t in db.ts[:n]])
    for idx in range(n):
        hi = idx - pg.skip_recent
        if hi <= 0:
            continue
        # gt distance to each older candidate
        d = np.linalg.norm(gt[:hi] - gt[idx], axis=1)
        near = np.where(d < 1.0)[0]
        scores = _scores(db, idx, hi)
        top = np.argsort(-scores)[:4]
        msg = (f"kf {idx:3d} hi={hi:3d} gt-near={list(near)} "
               f"top4={[(int(o), round(float(scores[o]), 3)) for o in top]}")
        if len(near) > 0:
            msg += f" near-scores={[round(float(scores[o]), 3) for o in near]}"
        print(msg)


def _scores(db, idx, hi):
    from isvins_tpu.posegraph.keyframe_db import _retrieval_scores
    Kb = 128
    while Kb < hi:
        Kb *= 2
    Kb = min(Kb, db.K)
    dbv = db.ret_valid[:Kb] & (np.arange(Kb) < hi)[:, None]
    return np.asarray(
        _retrieval_scores(
            jnp.asarray(db.ret_desc[idx]), jnp.asarray(db.ret_valid[idx]),
            jnp.asarray(db.ret_desc[:Kb]), jnp.asarray(dbv), 64,
        )
    )[:hi]


if __name__ == "__main__":
    sys_, world = build_and_run()
    dump(sys_)
    np.savez_compressed(
        "debug_loop_world.npz", P=world.P, frame_times=world.frame_times,
    )
    analyze(sys_, world)
