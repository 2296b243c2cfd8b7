"""Synthetic visual-inertial world generator (numpy, host-side).

Provides ground-truth trajectories with analytically consistent IMU
measurements and landmark observations — the test bed for the window solver,
marginalization, initialization, and the full estimator (SURVEY.md §4:
"solver tests on synthetic BA problems with known optima").
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..geom import quat_conj, quat_mul, quat_normalize, quat_rotate, quat_to_mat, so3_exp_quat

import jax.numpy as jnp


@dataclass
class SynthWorld:
    frame_times: np.ndarray  # (B,)
    P: np.ndarray  # (B,3) GT positions (body/IMU in world)
    Q: np.ndarray  # (B,4) GT quaternions wxyz
    V: np.ndarray  # (B,3)
    landmarks: np.ndarray  # (M,3)
    # per-frame-segment IMU buffers, zero-padded to capacity
    imu_dts: np.ndarray  # (B-1, C)
    imu_accs: np.ndarray  # (B-1, C, 3)
    imu_gyrs: np.ndarray  # (B-1, C, 3)
    imu_acc0: np.ndarray  # (B-1, 3) sample at segment start
    imu_gyr0: np.ndarray  # (B-1, 3)
    gravity: np.ndarray  # (3,)
    ba: np.ndarray  # (3,) true accel bias
    bg: np.ndarray  # (3,)


def _traj(t, r=5.0, w=0.4, h=0.6, w2=0.9):
    """Circle with vertical oscillation."""
    p = np.stack([r * np.cos(w * t), r * np.sin(w * t), h * np.sin(w2 * t)], axis=-1)
    return p


def _traj_quat(t, w=0.4):
    """Body x points radially outward (at the landmark ring); small pitch/roll
    wobble for IMU excitation."""
    yaw = w * t
    pitch = 0.12 * np.sin(0.7 * t)
    roll = 0.1 * np.cos(1.1 * t)
    # R = Rz(yaw) Ry(pitch) Rx(roll)
    qz = np.stack([np.cos(yaw / 2), 0 * t, 0 * t, np.sin(yaw / 2)], axis=-1)
    qy = np.stack([np.cos(pitch / 2), 0 * t, np.sin(pitch / 2), 0 * t], axis=-1)
    qx = np.stack([np.cos(roll / 2), np.sin(roll / 2), 0 * t, 0 * t], axis=-1)
    q = np.asarray(quat_mul(jnp.asarray(qz), quat_mul(jnp.asarray(qy), jnp.asarray(qx))))
    return q


def make_world(
    n_frames: int = 18,
    frame_hz: float = 10.0,
    imu_hz: float = 200.0,
    imu_capacity: int = 64,
    n_landmarks: int = 300,
    g_norm: float = 9.81007,
    ba=(0.0, 0.0, 0.0),
    bg=(0.0, 0.0, 0.0),
    noise_acc: float = 0.0,
    noise_gyr: float = 0.0,
    t0: float = 0.0,
    seed: int = 0,
) -> SynthWorld:
    rng = np.random.default_rng(seed)
    G = np.array([0.0, 0.0, g_norm])
    fdt = 1.0 / frame_hz
    idt = 1.0 / imu_hz
    frame_times = t0 + np.arange(n_frames) * fdt
    eps = 1e-6

    def pos(t):
        return _traj(np.atleast_1d(t))

    def quat(t):
        return _traj_quat(np.atleast_1d(t))

    def vel(t):
        return (pos(t + eps) - pos(t - eps)) / (2 * eps)

    def acc_w(t):
        return (pos(t + eps) - 2 * pos(t) + pos(t - eps)) / (eps * eps)

    def omega_body(t):
        q0 = quat(t - eps)
        q1 = quat(t + eps)
        dq = np.asarray(quat_mul(quat_conj(jnp.asarray(q0)), jnp.asarray(q1)))
        # log(dq)/2eps
        v = dq[..., 1:]
        w = np.clip(dq[..., :1], -1, 1)
        ang = 2 * np.arctan2(np.linalg.norm(v, axis=-1, keepdims=True), w)
        axis = v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
        return axis * ang / (2 * eps)

    P = pos(frame_times)
    Q = quat(frame_times)
    V = vel(frame_times)

    ba = np.asarray(ba)
    bg = np.asarray(bg)

    C = imu_capacity
    B = n_frames
    imu_dts = np.zeros((B - 1, C))
    imu_accs = np.zeros((B - 1, C, 3))
    imu_gyrs = np.zeros((B - 1, C, 3))
    imu_acc0 = np.zeros((B - 1, 3))
    imu_gyr0 = np.zeros((B - 1, 3))

    def imu_at(t):
        R = np.asarray(quat_to_mat(jnp.asarray(quat(t))))[0]
        a = R.T @ (acc_w(t)[0] + G) + ba + rng.normal(size=3) * noise_acc
        g = omega_body(t)[0] + bg + rng.normal(size=3) * noise_gyr
        return a, g

    for k in range(B - 1):
        ts = np.arange(frame_times[k], frame_times[k + 1] + idt * 0.5, idt)
        ts[-1] = frame_times[k + 1]
        a0, g0 = imu_at(ts[0])
        imu_acc0[k] = a0
        imu_gyr0[k] = g0
        n = len(ts) - 1
        assert n <= C
        for i in range(n):
            imu_dts[k, i] = ts[i + 1] - ts[i]
            a, g = imu_at(ts[i + 1])
            imu_accs[k, i] = a
            imu_gyrs[k, i] = g

    # landmarks: ring around the trajectory at varied radius/height
    th = rng.uniform(0, 2 * np.pi, n_landmarks)
    rad = rng.uniform(6.5, 12.0, n_landmarks)
    z = rng.uniform(-2.0, 3.0, n_landmarks)
    landmarks = np.stack([rad * np.cos(th), rad * np.sin(th), z], axis=-1)

    return SynthWorld(
        frame_times=frame_times, P=P, Q=Q, V=V, landmarks=landmarks,
        imu_dts=imu_dts, imu_accs=imu_accs, imu_gyrs=imu_gyrs,
        imu_acc0=imu_acc0, imu_gyr0=imu_gyr0, gravity=G, ba=ba, bg=bg,
    )


class StampRenderer:
    """Renders frames of a SynthWorld as images: each landmark gets a
    distinctive seeded random stamp (so binary descriptors can identify it),
    over a faint static background texture. Used by the full-pipeline tests
    and image benches."""

    def __init__(self, world: SynthWorld, cam_cfg, tic, qic, stamp: int = 25,
                 seed: int = 99):
        self.world = world
        self.cam = cam_cfg
        self.tic = np.asarray(tic)
        self.qic = np.asarray(qic)
        self.K = np.array(
            [[cam_cfg.fx, 0, cam_cfg.cx], [0, cam_cfg.fy, cam_cfg.cy], [0, 0, 1]]
        )
        H, W = cam_cfg.height, cam_cfg.width
        # flat background: a static image-space texture would violate the
        # epipolar geometry the tracker's RANSAC enforces (it does not move
        # with the camera); per-frame sensor noise is added in render()
        self.base = np.full((H, W), 100.0)
        self.noise_sigma = 1.5
        from scipy.ndimage import gaussian_filter

        self.half = stamp // 2
        self.stamps = []
        for m in range(len(world.landmarks)):
            s_rng = np.random.default_rng(7000 + m)
            # multi-scale structure: LK's convergence basin equals the feature
            # correlation length, so the stamp needs content at blob scale
            # (sigma ~ stamp/3, survives two pyramid levels), mid scale, and
            # fine detail (for BRIEF identity)
            yy, xx = np.mgrid[0:stamp, 0:stamp].astype(np.float64)
            c = (stamp - 1) / 2.0
            blob = np.exp(-((xx - c) ** 2 + (yy - c) ** 2) / (2 * (stamp / 3.5) ** 2))
            mid = gaussian_filter(s_rng.uniform(0, 1, size=(stamp, stamp)), 3.0)
            fine = gaussian_filter(s_rng.uniform(0, 1, size=(stamp, stamp)), 0.8)
            s = (
                6.0 * s_rng.choice([-1.0, 1.0]) * blob
                + 3.0 * (mid - mid.mean())
                + 1.0 * (fine - fine.mean())
            )
            self.stamps.append(s / np.abs(s).max() * 120.0)

    def render(self, frame: int):
        H, W = self.cam.height, self.cam.width
        pts, depth, vis = project(self.world, frame, self.tic, self.qic)
        px = (self.K @ pts.T).T[:, :2]
        h = self.half + 2
        inb = (
            vis
            & (px[:, 0] > h)
            & (px[:, 0] < W - h)
            & (px[:, 1] > h)
            & (px[:, 1] < H - h)
        )
        img = self.base.copy()
        rng = np.random.default_rng(123456 + frame)
        img += rng.normal(scale=self.noise_sigma, size=img.shape)
        hh = self.half
        for m in np.where(inb)[0]:
            cx, cy = int(round(px[m, 0])), int(round(px[m, 1]))
            img[cy - hh : cy + hh + 1, cx - hh : cx + hh + 1] += self.stamps[m]
        return np.clip(img, 0, 255), px, inb


def project(world: SynthWorld, frame: int, tic, qic, px_noise: float = 0.0, rng=None):
    """Project all landmarks into camera of `frame`. Returns (pts (M,3)
    normalized [x,y,1], depth (M,), visible (M,))."""
    p_w = world.landmarks
    Pb, Qb = world.P[frame], world.Q[frame]
    # world -> body -> camera
    p_b = np.asarray(quat_rotate(quat_conj(jnp.asarray(Qb)), jnp.asarray(p_w - Pb)))
    p_c = np.asarray(
        quat_rotate(quat_conj(jnp.asarray(qic)), jnp.asarray(p_b - np.asarray(tic)))
    )
    depth = p_c[:, 2]
    visible = depth > 0.3
    d_safe = np.where(np.abs(depth) > 1e-6, depth, 1.0)
    xy = p_c[:, :2] / d_safe[:, None]
    visible &= (np.abs(xy[:, 0]) < 0.81) & (np.abs(xy[:, 1]) < 0.54)  # ~EuRoC FOV
    if px_noise > 0 and rng is not None:
        xy = xy + rng.normal(size=xy.shape) * px_noise
    pts = np.concatenate([xy, np.ones((len(xy), 1))], axis=-1)
    return pts, depth, visible
