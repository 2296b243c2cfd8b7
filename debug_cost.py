"""At frame ~30 of the diverging run, compare the window cost at the
estimator's state vs a GT-constructed state: tells whether the solver is
failing to descend (cost(GT) < cost(est)) or the factor/prior stack actually
prefers the wrong state (cost(GT) > cost(est))."""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import isvins_tpu  # noqa: F401
from isvins_tpu.config import (
    CameraConfig, NoiseConfig, PoseGraphConfig, TrackerConfig, WindowConfig,
    euroc_config,
)
from isvins_tpu.geom import mat_to_quat, quat_to_mat, quat_conj, quat_rotate
from isvins_tpu.solver import ProjFactors, WindowDims, WindowState, solve_window
from isvins_tpu.solver.window import window_cost
from isvins_tpu.system import System
from isvins_tpu.utils.synthetic import RoomRenderer, make_world

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
world = make_world(n_frames=60, frame_hz=10.0, imu_hz=200.0,
                   n_landmarks=300, seed=4, traj_r=3.0, traj_w=0.6,
                   noise_acc=0.05, noise_gyr=0.005,
                   ba=(0.02, -0.015, 0.01), bg=(0.002, -0.003, 0.004))
qic = np.asarray(mat_to_quat(jnp.asarray(np.array(R_bc))))
renderer = RoomRenderer(world, cam, np.zeros(3), qic, seed=5)

sys_ = System(cfg, dims, enable_loop=False)
est = sys_.estimator
for k in range(31):
    if k > 0:
        n = int(np.sum(world.imu_dts[k - 1] > 0))
        acc_t = world.frame_times[k - 1]
        for s in range(n):
            acc_t += world.imu_dts[k - 1][s]
            sys_.pub_imu(acc_t, world.imu_accs[k - 1][s], world.imu_gyrs[k - 1][s])
    img, _, _ = renderer.render(k)
    sys_.pub_image(world.frame_times[k], img)

# ---- build the exact solver inputs at the current state
fm = est.f_manager
est.f_manager.triangulate(est.Ps, est.Qs, est.tic, est.qic)
state_est = est._window_state()
imu_f = est._imu_factors()
pf = fm.build_proj_factors(dims.N, marg_old=False)
proj = ProjFactors(
    idx_i=jnp.asarray(pf["idx_i"]), idx_j=jnp.asarray(pf["idx_j"]),
    fidx=jnp.asarray(pf["fidx"]), pts_i=jnp.asarray(pf["pts_i"]),
    pts_j=jnp.asarray(pf["pts_j"]), valid=jnp.asarray(pf["valid"]),
)
G = jnp.asarray(est.G)
psi = jnp.asarray(cfg.noise.pixel_sqrt_info)
pr = est.priors

# ---- GT-constructed state for the same window
hdr = est.Headers
wf = [int(np.argmin(np.abs(world.frame_times - t))) for t in hdr]
# gauge: align GT window to the estimator's frame-0 pose (yaw+position)
from isvins_tpu.geom import mat_to_ypr, ypr_to_mat
R_gt0 = np.asarray(quat_to_mat(jnp.asarray(world.Q[wf[0]])))
R_est0 = np.asarray(quat_to_mat(jnp.asarray(est.Qs[0])))
y_gt = np.asarray(mat_to_ypr(jnp.asarray(R_gt0)))[0]
y_est = np.asarray(mat_to_ypr(jnp.asarray(R_est0)))[0]
Rz = np.asarray(ypr_to_mat(jnp.asarray([y_est - y_gt, 0.0, 0.0])))
P_gt = np.einsum("ij,bj->bi", Rz, world.P[wf] - world.P[wf[0]]) + est.Ps[0]
Q_gt = np.asarray(mat_to_quat(jnp.asarray(
    np.einsum("ij,bjk->bik", Rz, np.asarray(quat_to_mat(jnp.asarray(world.Q[wf])))))))
V_gt = np.einsum("ij,bj->bi", Rz, world.V[wf])

# GT depths for the active landmarks: depth of each landmark... landmark ids
# from the tracker do NOT correspond to world.landmarks (tracker tracks wall
# texture). Instead triangulate depths AT the GT poses (exact geometry).
fm2_depth_backup = fm.depth.copy()
fm.depth[:] = -1.0
fm.triangulate(P_gt, Q_gt, est.tic, est.qic)
dep_gt = fm.depth_vector()
fm.depth[:] = fm2_depth_backup

state_gt = WindowState(
    P=jnp.asarray(P_gt), Q=jnp.asarray(Q_gt), V=jnp.asarray(V_gt),
    Ba=jnp.asarray(np.tile(world.ba, (dims.B, 1))),
    Bg=jnp.asarray(np.tile(world.bg, (dims.B, 1))),
    tic=jnp.asarray(est.tic), qic=jnp.asarray(est.qic),
    dep=jnp.asarray(dep_gt),
)

c_est = float(window_cost(state_est, imu_f, proj, pr, G, psi, dims))
c_gt = float(window_cost(state_gt, imu_f, proj, pr, G, psi, dims))
print(f"cost(estimate) = {c_est:.2f}")
print(f"cost(GT state) = {c_gt:.2f}")

# also: cost(GT) with priors zeroed -> how much do priors prefer the estimate?
from isvins_tpu.solver import PriorState
pr0 = PriorState.empty(dims.Vo)
print(f"no-prior cost(estimate) = {float(window_cost(state_est, imu_f, proj, pr0, G, psi, dims)):.2f}")
print(f"no-prior cost(GT state) = {float(window_cost(state_gt, imu_f, proj, pr0, G, psi, dims)):.2f}")

# and: solve from the GT state with the real priors -- does it stay near GT?
st2, c2 = solve_window(state_gt, imu_f, proj, pr, G, psi, dims, iters=10)
print(f"solve from GT: cost {float(c2):.2f}, |V| mean {float(jnp.linalg.norm(st2.V, axis=1).mean()):.2f} (gt {np.linalg.norm(V_gt,axis=1).mean():.2f}, est {np.linalg.norm(est.Vs,axis=1).mean():.2f})")
st3, c3 = solve_window(state_est, imu_f, proj, pr, G, psi, dims, iters=50)
print(f"solve from est (50 iters): cost {float(c3):.2f}, |V| mean {float(jnp.linalg.norm(st3.V, axis=1).mean()):.2f}")
