"""Measure LK tracking bias against exact renderer geometry: detect corners
in frame k, LK-track to frame k+1, compare with GT flow from ray-casting the
corner onto the wall and reprojecting into frame k+1."""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import isvins_tpu  # noqa: F401
from isvins_tpu.config import CameraConfig
from isvins_tpu.frontend.image_ops import nms_topk, shi_tomasi_response
from isvins_tpu.frontend.lk import pyramidal_lk
from isvins_tpu.geom import mat_to_quat, quat_to_mat
from isvins_tpu.utils.synthetic import RoomRenderer, make_world
from retrieval_bench import ray_wall_depth

H, W = 240, 320
f = 200.0
cam = CameraConfig(width=W, height=H, fx=f, fy=f, cx=W / 2, cy=H / 2,
                   k1=0.0, k2=0.0, p1=0.0, p2=0.0)
R_bc = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
world = make_world(n_frames=20, frame_hz=10.0, imu_hz=200.0, n_landmarks=10,
                   seed=4, traj_r=3.0, traj_w=0.6)
qic = np.asarray(mat_to_quat(jnp.asarray(R_bc)))
renderer = RoomRenderer(world, cam, np.zeros(3), qic, seed=5)
K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
Kinv = np.linalg.inv(K)


def cam_pose(k):
    R_wb = np.asarray(quat_to_mat(jnp.asarray(world.Q[k])))
    return R_wb @ R_bc, world.P[k]


for k in [5, 10, 15]:
    img0, _, _ = renderer.render(k)
    img1, _, _ = renderer.render(k + 1)
    i0 = jnp.asarray(img0, jnp.float32)
    i1 = jnp.asarray(img1, jnp.float32)
    resp = shi_tomasi_response(i0)
    cand, vals, okc = nms_topk(resp, 80, 16, border=20)
    cand = np.array(cand, np.float64)

    R0, C0 = cam_pose(k)
    R1, C1 = cam_pose(k + 1)
    dirs_c = (np.concatenate([cand, np.ones((len(cand), 1))], 1) @ Kinv.T)
    dirs_w = dirs_c @ R0.T
    depth = ray_wall_depth(renderer, C0, dirs_w)
    pw = C0 + depth[:, None] * dirs_w
    pc1 = (pw - C1) @ R1
    gt_px = (pc1 / pc1[:, 2:3]) @ K.T
    gt_px = gt_px[:, :2]

    p1, ok, err = pyramidal_lk(i0, i1, jnp.asarray(cand, jnp.float32),
                               jnp.ones(len(cand), bool), levels=4, half=10,
                               iters=10)
    p1 = np.asarray(p1, np.float64)
    ok = np.asarray(ok)
    inb = (gt_px[:, 0] > 15) & (gt_px[:, 0] < W - 15) & (gt_px[:, 1] > 15) & (gt_px[:, 1] < H - 15)
    m = ok & inb & np.isfinite(depth)
    e = p1[m] - gt_px[m]
    flow = gt_px[m] - cand[m]
    print(f"frame {k}->{k+1}: n={m.sum()} mean flow=({flow[:,0].mean():+.2f},{flow[:,1].mean():+.2f}) px")
    print(f"  LK err mean=({e[:,0].mean():+.4f},{e[:,1].mean():+.4f}) px  "
          f"std=({e[:,0].std():.3f},{e[:,1].std():.3f})  |e| median={np.median(np.linalg.norm(e,axis=1)):.3f}")
