"""Dispatch-level pipelining (System(pipeline=True)) must be output-
equivalent to the synchronous mode: same packets, same order, same values —
only the wall-clock schedule differs (the tracker's device step overlaps the
previous frame's estimator update; reference analogue: the tracker/backend
thread pair, System.cpp:224)."""

import numpy as np
import jax.numpy as jnp

import isvins_tpu  # noqa: F401
from isvins_tpu.config import (CameraConfig, NoiseConfig, PoseGraphConfig,
                               TrackerConfig, WindowConfig, euroc_config)
from isvins_tpu.geom import mat_to_quat
from isvins_tpu.solver import WindowDims
from isvins_tpu.system import System
from isvins_tpu.utils.synthetic import RoomRenderer, make_world


def _build():
    H, W, f = 240, 320, 200.0
    cam = CameraConfig(width=W, height=H, fx=f, fy=f, cx=W / 2, cy=H / 2,
                       k1=0.0, k2=0.0, p1=0.0, p2=0.0)
    R_bc = ((0.0, 0.0, 1.0), (-1.0, 0.0, 0.0), (0.0, -1.0, 0.0))
    cfg = euroc_config().replace(
        camera=cam,
        tracker=TrackerConfig(max_cnt=70, min_dist=16, freq=100, lk_levels=4,
                              lk_win=21, equalize=False, border=4),
        window=WindowConfig(vo_size=4, all_size=10, max_features=256,
                            max_imu_per_frame=64),
        noise=NoiseConfig(acc_n=0.05, gyr_n=0.005, acc_w=1e-4, gyr_w=1e-5,
                          pixel_sqrt_info=f),
        solver=euroc_config().solver.__class__(excitation_threshold=0.08),
        posegraph=PoseGraphConfig(enabled=False),
        tic=(0.0, 0.0, 0.0), ric=R_bc,
    )
    dims = WindowDims(B=10, Vo=4, F=256, N=2048)
    world = make_world(n_frames=16, frame_hz=10.0, imu_hz=200.0,
                       n_landmarks=500, seed=3)
    qic = np.asarray(mat_to_quat(jnp.asarray(np.array(R_bc))))
    renderer = RoomRenderer(world, cam, np.zeros(3), qic)
    frames = [renderer.render(k)[0] for k in range(16)]
    return cfg, dims, world, frames


def _run(cfg, dims, world, frames, pipeline):
    sys_ = System(cfg, dims, enable_loop=False, pipeline=pipeline)
    n = len(frames)
    for k in range(n):
        if k > 0:
            m = int(np.sum(world.imu_dts[k - 1] > 0))
            acc_t = world.frame_times[k - 1]
            for s in range(m):
                acc_t += world.imu_dts[k - 1][s]
                sys_.pub_imu(acc_t, world.imu_accs[k - 1][s],
                             world.imu_gyrs[k - 1][s])
        sys_.pub_image(world.frame_times[k], frames[k])
    sys_.flush()
    return sys_


def test_pipeline_equivalent_to_sync():
    cfg, dims, world, frames = _build()
    a = _run(cfg, dims, world, frames, pipeline=False)
    b = _run(cfg, dims, world, frames, pipeline=True)
    # identical packet stream => identical estimator evolution
    assert len(a.vio_trajectory) == len(b.vio_trajectory) > 0
    for (ta, Pa, Qa), (tb, Pb, Qb) in zip(a.vio_trajectory, b.vio_trajectory):
        assert ta == tb
        np.testing.assert_allclose(Pa, Pb, atol=1e-9)
        np.testing.assert_allclose(Qa, Qb, atol=1e-9)


def test_solve_async_equivalent_to_sync():
    """Cross-frame solve pipelining (System(solve_async=True)) must be
    VALUE-identical to the synchronous estimator: the same packed program
    runs on the same inputs in the same order — only the collect point moves
    to the next frame (the install still lands before that frame's IMU
    feed, so propagation seeds and the slide see identical state)."""
    cfg, dims, world, frames = _build()
    a = _run(cfg, dims, world, frames, pipeline=False)
    b = System(cfg, dims, enable_loop=False, solve_async=True)
    n = len(frames)
    for k in range(n):
        if k > 0:
            m = int(np.sum(world.imu_dts[k - 1] > 0))
            acc_t = world.frame_times[k - 1]
            for s in range(m):
                acc_t += world.imu_dts[k - 1][s]
                b.pub_imu(acc_t, world.imu_accs[k - 1][s],
                          world.imu_gyrs[k - 1][s])
        b.pub_image(world.frame_times[k], frames[k])
    b.flush()
    assert len(a.vio_trajectory) == len(b.vio_trajectory) > 0
    for (ta, Pa, Qa), (tb, Pb, Qb) in zip(a.vio_trajectory, b.vio_trajectory):
        assert ta == tb
        np.testing.assert_allclose(Pa, Pb, atol=1e-9)
        np.testing.assert_allclose(Qa, Qb, atol=1e-9)


def test_pg_thread_equivalent_to_sync():
    """The pose-graph worker thread (System(pg_thread=True)) consumes the
    same packet stream in the same order as the in-line builder, so after a
    flush/join the keyframe db and trajectories must be IDENTICAL — the
    thread changes only where the work runs (reference analogue: the
    decoupled pose-graph process thread, pose_graph_builder.cpp). A
    mid-stream timestamp gap exercises the queued new_sequence command."""
    cfg, dims, world, frames = _build()
    cfg = cfg.replace(posegraph=PoseGraphConfig(
        enabled=True, keyframe_min_dist=0.15, skip_recent=100,
        max_keyframes=64, max_kp_per_kf=128))

    def run(pg_thread):
        sys_ = System(cfg, dims, enable_loop=True, pg_thread=pg_thread)
        n = len(frames)
        for k in range(n):
            if k > 0:
                m = int(np.sum(world.imu_dts[k - 1] > 0))
                acc_t = world.frame_times[k - 1]
                for s in range(m):
                    acc_t += world.imu_dts[k - 1][s]
                    sys_.pub_imu(acc_t, world.imu_accs[k - 1][s],
                                 world.imu_gyrs[k - 1][s])
            # timestamp gap before the final frame: a new sequence must
            # start, routed through the worker queue in packet order
            t_img = world.frame_times[k] + (2.5 if k == n - 1 else 0.0)
            sys_.pub_image(t_img, frames[k])
        sys_.flush()
        return sys_

    a = run(False)
    b = run(True)
    assert a.pgbuilder.db.n == b.pgbuilder.db.n > 0
    assert a.pgbuilder.sequence == b.pgbuilder.sequence == 2
    np.testing.assert_allclose(
        a.pgbuilder.db.vio_t[: a.pgbuilder.db.n],
        b.pgbuilder.db.vio_t[: b.pgbuilder.db.n], atol=1e-12)
    assert a.loop_tum() == b.loop_tum()
    assert a.vio_tum() == b.vio_tum()
