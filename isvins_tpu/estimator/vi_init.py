"""Visual-inertial initialization orchestration (initialStructure /
visualInitialAlign, estimator.cpp:239–429).

Pipeline: IMU excitation check -> seed-pair relative pose (batched E-RANSAC)
-> chained PnP + two-view triangulation across the window -> projection-only
bundle adjustment (reusing the window LM solver with IMU factors masked out —
the same batched device kernel; the reference builds a separate ceres
autodiff SfM problem, initial_sfm.cpp:232–289) -> gyro-bias solve ->
velocity/gravity/scale linear alignment + gravity refinement -> state
application with gravity-aligned, yaw-zeroed world frame.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..geom import (
    g2R,
    mat_to_quat,
    mat_to_ypr,
    quat_conj,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_mat,
    ypr_to_mat,
)
from ..initial import linear_alignment, solve_gyroscope_bias, solve_relative_pose
from ..initial.five_point import solve_translation_with_rotation
from ..initial.five_point import _triangulate_pair
from ..initial.pnp import pnp_gn
from ..solver import PriorState, ProjFactors, WindowState, solve_window


def check_imu_excitation(est) -> bool:
    """estimator.cpp:213–238: stddev of mean specific force across segments."""
    pre = est._imu_factors()
    dv = np.asarray(pre.pre.delta_v)
    dt = np.asarray(pre.pre.sum_dt)
    ok = dt > 1e-6
    if ok.sum() < 2:
        return False
    g_seg = dv[ok] / dt[ok][:, None]
    var = np.sqrt(((g_seg - g_seg.mean(0)) ** 2).sum(1).mean())
    return var >= est.cfg.solver.excitation_threshold


def _gyro_rotation_prior(est, i):
    """Relative CAMERA rotation frame i -> B-1 from the gyro preintegration
    chain at the current bias estimate: R_ci_c(B-1) = RIC^T (prod dq) RIC.
    Pre-init the gyro bias error is a few mrad/s, far below what 8-point E
    estimation delivers on few clustered (wall-planar) correspondences."""
    B = est.dims.B
    imu_f = est._imu_factors()
    dq = np.asarray(imu_f.pre.delta_q)  # (B-1, 4); segment j: frame j -> j+1
    valid = np.asarray(imu_f.valid)
    if not valid[i : B - 1].all():
        return None
    q = jnp.asarray([1.0, 0, 0, 0])
    for j in range(i, B - 1):
        q = quat_normalize(quat_mul(q, jnp.asarray(dq[j])))
    R_body = np.asarray(quat_to_mat(q))
    # live extrinsic (est.qic), not cfg: online calibration (mode 2) may have
    # installed a better rotation than the config guess (estimator.cpp:146)
    RIC = np.asarray(quat_to_mat(jnp.asarray(est.qic)))
    return RIC.T @ R_body @ RIC


def find_seed_pair(est):
    """relativePose (estimator.cpp:431–459): earliest frame with >20
    correspondences to the newest frame and mean parallax*460 > 30.

    Deviation from the reference's pure-vision findFundamentalMat seed: the
    rotation is transported from the gyro preintegration chain and only the
    translation direction is solved from the correspondences
    (solve_translation_with_rotation) — wall-dominated views make the
    8-point problem planar-degenerate, which poisons the SfM seed, the
    gyro-bias solve, and through it the whole alignment. Falls back to
    8-point E-RANSAC when the IMU chain is unavailable."""
    B = est.dims.B
    fm = est.f_manager
    # epipolar threshold ~1 px of tracking noise in normalized units
    # (the reference's 0.3/460 assumed its sub-pixel tracker at f=460)
    thresh = 1.0 / float(est.cfg.camera.fx)
    for i in range(B - 2):
        a, b = fm.get_corresponding(i, B - 1)
        if len(a) > 20:
            par = np.linalg.norm(a[:, :2] - b[:, :2], axis=1).mean()
            if par * 460.0 > 30.0:
                R_prior = _gyro_rotation_prior(est, i)
                if R_prior is not None:
                    ok, R, T, inl = solve_translation_with_rotation(
                        a[:, :2], b[:, :2], R_prior, thresh=thresh
                    )
                else:
                    ok, R, T, inl = solve_relative_pose(a[:, :2], b[:, :2], thresh=thresh)
                if ok:
                    return i, R, T
    return None, None, None


def global_sfm(est, l, R_rel, T_rel):
    """Camera poses (cam-to-c0) for every window frame + landmark depths via
    chained PnP + triangulation + projection-only BA (initial_sfm.cpp
    construct, :58–289). Returns (ok, q_cw (B,4) world-to-cam, t_cw (B,3),
    inv_depth (F,) in host frames)."""
    B = est.dims.B
    fm = est.f_manager
    F = est.dims.F

    # world-to-cam poses; seed l = identity, last = inverse of (R_rel, T_rel)
    q_wc = np.tile(np.array([1.0, 0, 0, 0]), (B, 1))  # cam-to-world
    t_wc = np.zeros((B, 3))
    q_wc[B - 1] = np.asarray(mat_to_quat(jnp.asarray(R_rel)))
    t_wc[B - 1] = T_rel
    have_pose = np.zeros(B, bool)
    have_pose[l] = True
    have_pose[B - 1] = True

    pts3d = np.full((F, 3), np.nan)

    def w2c(i):
        q = np.asarray(quat_conj(jnp.asarray(q_wc[i])))
        t = -np.asarray(quat_rotate(jnp.asarray(q), jnp.asarray(t_wc[i])))
        return q, t

    def triangulate_pair_frames(i, j):
        """Triangulate untriangulated tracks seen in frames i and j."""
        qi, ti = w2c(i)
        qj, tj = w2c(j)
        # relative: cam_j = T_j^w2c ∘ (T_i^w2c)^-1 applied to cam_i coords
        # x_j = R_ji x_i + t_ji
        R_i = np.asarray(quat_to_mat(jnp.asarray(qi)))
        R_j = np.asarray(quat_to_mat(jnp.asarray(qj)))
        R_ji = R_j @ R_i.T
        t_ji = tj - R_ji @ ti
        sel = (
            fm.active()
            & fm.has_obs[:, i]
            & fm.has_obs[:, j]
            & np.isnan(pts3d[:, 0])
        )
        rows = np.where(sel)[0]
        if len(rows) == 0:
            return
        p1 = fm.obs[rows, i][:, :2]
        p2 = fm.obs[rows, j][:, :2]
        d1, d2 = _triangulate_pair(
            jnp.asarray(R_ji), jnp.asarray(t_ji), jnp.asarray(p1), jnp.asarray(p2)
        )
        d1 = np.asarray(d1)
        good = (d1 > 0.05) & np.asarray(d2 > 0.05)
        # cam_i point -> world
        pc = np.concatenate([p1, np.ones((len(rows), 1))], axis=1) * d1[:, None]
        pw = (R_i.T @ (pc - ti).T).T
        pts3d[rows[good]] = pw[good]

    def pnp_frame(i, guess_from):
        sel = fm.active() & fm.has_obs[:, i] & ~np.isnan(pts3d[:, 0])
        rows = np.where(sel)[0]
        if len(rows) < 6:
            return False
        q0, t0 = w2c(guess_from)
        q, t, _ = pnp_gn(pts3d[rows], fm.obs[rows, i][:, :2], q0, t0, iters=10)
        q = np.asarray(q)
        t = np.asarray(t)
        # store cam-to-world
        qi = np.asarray(quat_conj(jnp.asarray(q)))
        q_wc[i] = qi
        t_wc[i] = -np.asarray(quat_rotate(jnp.asarray(qi), jnp.asarray(t)))
        have_pose[i] = True
        return True

    triangulate_pair_frames(l, B - 1)
    for i in range(l + 1, B - 1):
        if not pnp_frame(i, i - 1 if have_pose[i - 1] else l):
            return False, None, None, None
        triangulate_pair_frames(i, B - 1)
    for i in range(l - 1, -1, -1):
        if not pnp_frame(i, i + 1):
            return False, None, None, None
        triangulate_pair_frames(i, l)
    # triangulate leftovers from first/last observation
    for r in np.where(fm.active() & np.isnan(pts3d[:, 0]))[0]:
        frames = np.where(fm.has_obs[r])[0]
        if len(frames) >= 2:
            triangulate_pair_frames(frames[0], frames[-1])

    # ---- projection-only BA on the window solver
    tracked = fm.active() & ~np.isnan(pts3d[:, 0])
    inv_dep = np.zeros(F)
    for r in np.where(tracked)[0]:
        host = int(fm.start[r])
        q, t = w2c(host)
        pc = np.asarray(quat_rotate(jnp.asarray(q), jnp.asarray(pts3d[r]))) + t
        if pc[2] < 0.05:
            tracked[r] = False
            continue
        inv_dep[r] = 1.0 / pc[2]

    idx_i, idx_j, fidx, pi_l, pj_l = [], [], [], [], []
    for r in np.where(tracked)[0]:
        host = int(fm.start[r])
        for f in np.where(fm.has_obs[r])[0]:
            if f == host:
                continue
            idx_i.append(host)
            idx_j.append(f)
            fidx.append(r)
            pi_l.append(fm.obs[r, host])
            pj_l.append(fm.obs[r, f])
    n = len(idx_i)
    if n < 30:
        return False, None, None, None
    N = est.dims.N
    n = min(n, N)
    pad = N - n
    proj = ProjFactors(
        idx_i=jnp.asarray(np.concatenate([idx_i[:n], np.zeros(pad)]).astype(np.int32)),
        idx_j=jnp.asarray(np.concatenate([idx_j[:n], np.ones(pad)]).astype(np.int32)),
        fidx=jnp.asarray(np.concatenate([fidx[:n], np.zeros(pad)]).astype(np.int32)),
        pts_i=jnp.asarray(np.concatenate([np.asarray(pi_l[:n]).reshape(-1, 3), np.tile([[0, 0, 1.0]], (pad, 1))])),
        pts_j=jnp.asarray(np.concatenate([np.asarray(pj_l[:n]).reshape(-1, 3), np.tile([[0, 0, 1.0]], (pad, 1))])),
        valid=jnp.asarray(np.concatenate([np.ones(n), np.zeros(pad)]).astype(bool)),
    )
    state = WindowState(
        P=jnp.asarray(t_wc),
        Q=jnp.asarray(q_wc),
        V=jnp.zeros((B, 3)),
        Ba=jnp.zeros((B, 3)),
        Bg=jnp.zeros((B, 3)),
        tic=jnp.zeros(3),
        qic=jnp.asarray([1.0, 0, 0, 0]),
        dep=jnp.asarray(inv_dep),
    )
    imu_f = est._imu_factors()
    imu_off = imu_f._replace(valid=jnp.zeros_like(imu_f.valid))
    priors = PriorState.empty(est.dims.Vo)
    # gauge: anchor seed-frame... pose 0 (any anchor works; damping holds scale)
    priors = priors._replace(
        se3_t=state.P[0], se3_q=state.Q[0],
        se3_sqrt=jnp.eye(6) * 100.0, se3_valid=jnp.asarray(True),
    )
    G = jnp.asarray(est.G)
    psi = jnp.asarray(est.cfg.noise.pixel_sqrt_info)
    state2, cost = solve_window(
        state, imu_off, proj, priors, G, psi, est.dims,
        iters=est.cfg.solver.init_max_iterations,
    )
    if not np.isfinite(float(cost)):
        return False, None, None, None
    q_wc = np.array(state2.Q)
    t_wc = np.array(state2.P)
    return True, q_wc, t_wc, np.array(state2.dep)


def refine_gyro_bias(est) -> float:
    """Re-estimate the gyro bias against the CURRENT window rotations
    (post-BA) and apply the correction. Returns |dbg|.

    The one-shot solve_gyroscope_bias in run_visual_inertial_init uses the
    chained-SfM rotations, whose drift grows with the window length — at the
    product window (B=18) the accumulated ~0.8 deg/frame PnP-chain rotation
    drift aliases into a 0.14 rad/s bias estimate (measured on the noiseless
    synthetic bench world), which the init BA then cannot fully undo (the
    bias direction is stiff; 30 LM iterations recover only 20%) and the
    marginalization prior freezes thereafter, drifting the whole run. The
    alternation loop (estimator.solve_odometry first=True) therefore
    re-solves the same linear problem against the window's own
    vision-dominated rotations each round: as the BA rotations converge, so
    does the bias (reference analogue: solveGyroscopeBias,
    initial_aligment.cpp:3-37, run once — the reference's 10-frame-SfM
    rotation drift is small enough for one shot; an 18-frame chain's is
    not)."""
    B = est.dims.B
    pre_all = est._imu_factors()
    valid = np.asarray(pre_all.valid)
    if not valid.all():
        # segment pairing (R[k], R[k+1]) <-> pres[k] breaks with holes;
        # init windows normally have every segment valid
        return 0.0
    R_body = np.asarray(quat_to_mat(jnp.asarray(est.Qs)))
    pres = [jax.tree_util.tree_map(lambda a: a[k], pre_all.pre)
            for k in range(B - 1)]
    dbg = solve_gyroscope_bias(R_body, pres)
    est.Bgs[:] = est.Bgs + dbg
    return float(np.linalg.norm(dbg))


def realign_window(est, status: dict = None) -> bool:
    """Closed-form velocity/gravity/scale re-alignment at the CURRENT window
    states (post-BA). LM converges the stiff global scale/gravity directions
    only logarithmically (measured on a hard init: 30 iterations leave the
    window path at 0.35 of its true length, 120 at 0.74), while the linear
    alignment (initial_aligment.cpp:125–198) jumps to the optimum given the
    current rotations — alternating BA and re-alignment contracts the scale
    error geometrically (each round's BA re-solves the window shape with IMU
    factors at the better scale, which conditions the next alignment).
    Gauge is free during initialization, so re-zeroing yaw and re-anchoring
    the first position is safe (double2vector re-anchors anyway).
    Returns False (leaving states untouched) if alignment rejects OR if the
    correction is negligible (|s-1| < 2%, attitude < 1 deg) — a converged
    init must not be perturbed: the realignment is exact only up to the IMU
    noise in the preintegrations, so applying a near-identity correction to
    an already-converged window trades BA-optimal states for alignment noise
    (measured: +35% ATE on the noisy e2e sequence without this gate).

    `status`, when given, receives {"why": "rejected"|"converged"|"applied",
    "s": scale} so the caller can gate init acceptance on convergence (a
    weakly-excited window can leave an arbitrarily wrong scale; measured on
    the loop-closure e2e world the raw SfM alignment was 8x off and two
    alternation rounds left 3x — an initialization that must be refused,
    estimator.cpp retries initialStructure on the next keyframe)."""
    if status is None:
        status = {}
    B = est.dims.B
    RIC = np.asarray(quat_to_mat(jnp.asarray(est.qic)))
    TIC = np.asarray(est.tic)
    R_body = np.asarray(quat_to_mat(jnp.asarray(est.Qs)))  # (B,3,3)
    T_cam = est.Ps + np.einsum("bij,j->bi", R_body, TIC)
    pre_all = est._imu_factors().pre
    pres = [jax.tree_util.tree_map(lambda a: a[k], pre_all) for k in range(B - 1)]
    ok, g_w, x = linear_alignment(
        R_body, T_cam, pres, TIC, float(np.linalg.norm(est.G))
    )
    status["why"] = "rejected"
    status["s"] = float(x[-1]) if ok else None
    if not ok:
        return False
    s = float(x[-1])
    if not (0.05 < s < 20.0):
        return False

    Ps = s * T_cam - np.einsum("bij,j->bi", R_body, TIC)
    anchor = est.Ps[0].copy()
    Vs = np.einsum("bij,bj->bi", R_body, x[: 3 * B].reshape(B, 3))

    R0 = np.asarray(g2R(jnp.asarray(g_w)))
    yaw = float(np.asarray(mat_to_ypr(jnp.asarray(R0 @ R_body[0])))[0])
    R0 = np.asarray(ypr_to_mat(jnp.asarray([-yaw, 0.0, 0.0]))) @ R0

    ang = np.degrees(np.arccos(np.clip((np.trace(R0) - 1.0) / 2.0, -1.0, 1.0)))
    if abs(s - 1.0) < 0.02 and ang < 1.0:
        status["why"] = "converged"
        return False  # converged — see docstring
    status["why"] = "applied"

    Ps = np.einsum("ij,bj->bi", R0, Ps)
    est.Ps[:] = Ps - Ps[0] + anchor
    est.Vs[:] = np.einsum("ij,bj->bi", R0, Vs)
    R_w = np.einsum("ij,bjk->bik", R0, R_body)
    est.Qs[:] = np.asarray(mat_to_quat(jnp.asarray(R_w)))
    # the world similarity (R0, s) leaves each landmark's anchor-camera ray
    # unchanged and scales its depth by s — rescale instead of invalidating
    # (a reset discards converged triangulations and re-seeds them from
    # noisy two-view DLT)
    dep = est.f_manager.depth
    dep[dep > 0] *= s
    return True


def run_visual_inertial_init(est) -> bool:
    if not check_imu_excitation(est):
        return False
    l, R_rel, T_rel = find_seed_pair(est)
    if l is None:
        return False
    ok, q_wc, t_wc, inv_dep = global_sfm(est, l, R_rel, T_rel)
    if not ok:
        est.marginalization_flag = 0  # MARGIN_OLD (estimator.cpp:277)
        return False

    B = est.dims.B
    # live extrinsic, possibly just produced by the online hand-eye
    # calibrator this very frame (reference visualInitialAlign reads the
    # RIC global that CalibrationExRotation updates, estimator.cpp:146)
    RIC = np.asarray(quat_to_mat(jnp.asarray(est.qic)))
    TIC = np.asarray(est.tic)
    R_cam = np.asarray(quat_to_mat(jnp.asarray(q_wc)))  # cam-to-c0
    R_body = np.einsum("bij,kj->bik", R_cam, RIC)  # R_cam @ RIC^T
    T_cam = t_wc

    # ---- gyro bias + re-integration (initial_aligment.cpp:3–37)
    # NOTE: est.Bgs is mutated for the re-integration, but restored on any
    # later failure — a failed attempt must not leak a (possibly garbage)
    # bias into the next attempt's preintegrations
    Bgs_backup = est.Bgs.copy()
    pre_list_raw = est._imu_factors().pre
    pres = [jax.tree_util.tree_map(lambda a: a[k], pre_list_raw) for k in range(B - 1)]
    dbg = solve_gyroscope_bias(R_body, pres)
    est.Bgs[:] = est.Bgs + dbg
    pre_new = est._imu_factors().pre
    pres = [jax.tree_util.tree_map(lambda a: a[k], pre_new) for k in range(B - 1)]

    # ---- linear alignment (+ gravity refinement)
    ok, g_c0, x = linear_alignment(R_body, T_cam, pres, TIC, float(np.linalg.norm(est.G)))
    if not ok:
        est.Bgs[:] = Bgs_backup
        return False
    s = x[-1]

    # ---- apply (visualInitialAlign, estimator.cpp:368–427)
    Ps = np.zeros((B, 3))
    for i in range(B):
        Ps[i] = s * T_cam[i] - R_body[i] @ TIC
    Ps = Ps - Ps[0]
    Vs = np.einsum("bij,bj->bi", R_body, x[: 3 * B].reshape(B, 3))

    R0 = np.asarray(g2R(jnp.asarray(g_c0)))
    yaw = float(np.asarray(mat_to_ypr(jnp.asarray(R0 @ R_body[0])))[0])
    R0 = np.asarray(ypr_to_mat(jnp.asarray([-yaw, 0.0, 0.0]))) @ R0

    est.Ps[:] = np.einsum("ij,bj->bi", R0, Ps)
    est.Vs[:] = np.einsum("ij,bj->bi", R0, Vs)
    R_w = np.einsum("ij,bjk->bik", R0, R_body)
    est.Qs[:] = np.asarray(mat_to_quat(jnp.asarray(R_w)))
    est.Bas[:] = 0.0

    # depths: reset and let the estimator re-triangulate at metric poses
    est.f_manager.depth[:] = -1.0
    return True
