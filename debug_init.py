"""Dissect the visual-inertial initialization on the loop-e2e world: run the
pipeline to the first init attempt, then compare every init stage (SfM
rotations, gyro bias, alignment scale/gravity) against ground truth."""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import isvins_tpu  # noqa: F401
from isvins_tpu.config import (
    CameraConfig, NoiseConfig, PoseGraphConfig, TrackerConfig, WindowConfig,
    euroc_config,
)
from isvins_tpu.geom import mat_to_quat, quat_to_mat, quat_conj, quat_mul
from isvins_tpu.solver import WindowDims
from isvins_tpu.system import System
from isvins_tpu.utils.synthetic import RoomRenderer, make_world
from isvins_tpu.estimator import vi_init
from isvins_tpu.initial import linear_alignment, solve_gyroscope_bias


def ang_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


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
n_frames = 12
world = make_world(n_frames=130, frame_hz=10.0, imu_hz=200.0,
                   n_landmarks=300, seed=4, traj_r=3.0, traj_w=0.6,
                   noise_acc=0.05, noise_gyr=0.005,
                   ba=(0.02, -0.015, 0.01), bg=(0.002, -0.003, 0.004))
qic = np.asarray(mat_to_quat(jnp.asarray(np.array(R_bc))))
renderer = RoomRenderer(world, cam, np.zeros(3), qic, seed=5)

sys_ = System(cfg, dims, enable_loop=False)
est = sys_.estimator


def dissect(self):
    """Runs INSIDE the init attempt (pre-slide window state)."""
    B = self.dims.B
    hdr = self.Headers.copy()
    wf = [int(np.argmin(np.abs(world.frame_times - t))) for t in hdr]
    print("window world-frames:", wf, flush=True)
    R_bc_np = np.array(R_bc)
    R_wb = np.asarray(quat_to_mat(jnp.asarray(world.Q[wf])))
    R_wc_gt = np.einsum("bij,jk->bik", R_wb, R_bc_np)
    t_wc_gt = world.P[wf]
    print("excitation ok:", vi_init.check_imu_excitation(self))
    l, R_rel, T_rel = vi_init.find_seed_pair(self)
    print("seed l =", l)
    if l is None:
        fm = self.f_manager
        for i in range(B - 2):
            a, b = fm.get_corresponding(i, B - 1)
            par = np.linalg.norm(a[:, :2] - b[:, :2], axis=1).mean() if len(a) else 0
            print(f"  i={i} ncorr={len(a)} par460={par*460:.1f}")
        return False
    R_gt_rel = R_wc_gt[l].T @ R_wc_gt[B - 1]
    t_gt_rel = R_wc_gt[l].T @ (t_wc_gt[B - 1] - t_wc_gt[l])
    print("  R_rel err (deg):", ang_deg(np.asarray(R_rel), R_gt_rel))
    tr = np.asarray(T_rel)
    print("  T dir est:", tr / np.linalg.norm(tr), " gt dir:",
          t_gt_rel / max(np.linalg.norm(t_gt_rel), 1e-9),
          " gt |t|:", np.linalg.norm(t_gt_rel))
    ok, q_wc, t_wc, inv_dep = vi_init.global_sfm(self, l, R_rel, T_rel)
    print("sfm ok:", ok)
    if not ok:
        return False
    R_wc = np.asarray(quat_to_mat(jnp.asarray(q_wc)))
    Rg = R_wc_gt[l] @ R_wc[l].T
    for i in range(B):
        e = ang_deg(Rg @ R_wc[i], R_wc_gt[i])
        print(f"  sfm frame {i}: rot err {e:6.3f} deg  "
              f"|t_sfm|={np.linalg.norm(t_wc[i]-t_wc[l]):.3f} "
              f"|t_gt|={np.linalg.norm(t_wc_gt[i]-t_wc_gt[l]):.3f}")
    RIC = R_bc_np
    R_body = np.einsum("bij,kj->bik", R_wc, RIC)
    pre_raw = self._imu_factors().pre
    pres = [jax.tree_util.tree_map(lambda a: a[k], pre_raw) for k in range(B - 1)]
    dbg = solve_gyroscope_bias(R_body, pres)
    print("gyro bias est:", np.round(np.asarray(dbg), 4), " true:", world.bg)
    dbg_gt = solve_gyroscope_bias(R_wb, pres)
    print("gyro bias with GT rotations:", np.round(np.asarray(dbg_gt), 4))
    self.Bgs[:] = self.Bgs + np.asarray(dbg)
    pre_new = self._imu_factors().pre
    pres2 = [jax.tree_util.tree_map(lambda a: a[k], pre_new) for k in range(B - 1)]
    ok2, g_c0, x = linear_alignment(R_body, t_wc, pres2, np.zeros(3), 9.81007)
    print("alignment ok:", ok2)
    if ok2:
        s = float(x[-1])
        num = [np.linalg.norm(t_wc_gt[i] - t_wc_gt[l]) for i in range(B) if i != l]
        den = [np.linalg.norm(t_wc[i] - t_wc[l]) for i in range(B) if i != l]
        print("scale s:", s, " gt per-frame ratio:",
              np.round(np.array(num) / np.maximum(den, 1e-9), 3))
        g_caml = R_wc_gt[l].T @ np.array([0, 0, 9.81007])
        print("g_c0:", np.round(np.asarray(g_c0), 3),
              " gt g in cam-l:", np.round(g_caml, 3))
        V = x[: 3 * B].reshape(B, 3)
        print("solved |V|:", np.round(np.linalg.norm(
            np.einsum('bij,bj->bi', R_body, V), axis=1), 3))
        print("gt speed:", np.round(np.linalg.norm(world.V[wf], axis=1), 3))
    self.Bgs[:] = 0.0

    # ------- isolation matrix: {SfM, GT} rotations/translations x bias
    def pres_at(bg):
        self.Bgs[:] = np.asarray(bg)
        pre = self._imu_factors().pre
        out = [jax.tree_util.tree_map(lambda a: a[k], pre) for k in range(B - 1)]
        self.Bgs[:] = 0.0
        return out

    num = np.array([np.linalg.norm(t_wc_gt[i] - t_wc_gt[l]) for i in range(B) if i != l])
    den = np.array([np.linalg.norm(t_wc[i] - t_wc[l]) for i in range(B) if i != l])
    s_true = (num / np.maximum(den, 1e-9)).mean()
    t_gt_sfmscale = (t_wc_gt - t_wc_gt[l]) / s_true
    bg_true = world.bg
    dbg_sfm = np.asarray(dbg)
    R_wb_gt = R_wb
    # perturbation sensitivity: which geometry error channel kills the scale?
    from isvins_tpu.geom import so3_exp_quat
    rng = np.random.default_rng(0)

    def perturb_R(Rb, angles_rad):
        out = np.empty_like(Rb)
        for i in range(B):
            dq = np.asarray(quat_to_mat(so3_exp_quat(jnp.asarray(angles_rad[i]))))
            out[i] = dq @ Rb[i]
        return out

    cases = [
        ("SfM R, SfM T", R_body, t_wc, bg_true),
        ("GT  R, GT T", R_wb_gt, t_gt_sfmscale, bg_true),
        ("GT R+0.2deg rnd, GT T", perturb_R(R_wb_gt, rng.normal(size=(B, 3)) * np.radians(0.2)), t_gt_sfmscale, bg_true),
        ("GT R+0.5deg rnd, GT T", perturb_R(R_wb_gt, rng.normal(size=(B, 3)) * np.radians(0.5)), t_gt_sfmscale, bg_true),
        ("GT R+yaw ramp 0.1d/f, GT T", perturb_R(R_wb_gt, np.outer(np.arange(B) - l, np.array([0, 0, np.radians(0.1)]))), t_gt_sfmscale, bg_true),
        ("GT R, GT T + 1% rnd", R_wb_gt, t_gt_sfmscale + rng.normal(size=(B, 3)) * 0.01 * np.abs(t_gt_sfmscale).max(), bg_true),
        ("GT R, GT T + 3% rnd", R_wb_gt, t_gt_sfmscale + rng.normal(size=(B, 3)) * 0.03 * np.abs(t_gt_sfmscale).max(), bg_true),
    ]
    print(f"--- sensitivity (want s={s_true:.3f}) ---")
    for name, Rb, Tc, bg in cases:
        okk, g, x = linear_alignment(Rb, Tc, pres_at(bg), np.zeros(3), 9.81007)
        s = float(x[-1])
        print(f"{name:30s} ok={okk} s={s:8.4f}")
    raise SystemExit(0)


type(est).initial_structure = dissect
for k in range(13):
    if k > 0:
        n = int(np.sum(world.imu_dts[k - 1] > 0))
        acc_t = world.frame_times[k - 1]
        for s in range(n):
            acc_t += world.imu_dts[k - 1][s]
            sys_.pub_imu(acc_t, world.imu_accs[k - 1][s], world.imu_gyrs[k - 1][s])
    img, _, _ = renderer.render(k)
    sys_.pub_image(world.frame_times[k], img)
