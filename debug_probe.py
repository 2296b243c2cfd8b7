"""Probe one loop pair (kf 66 vs 0) from the dumped DB: match quality with
plain vs clean matcher, PnP behavior, drift magnitude."""
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import isvins_tpu  # noqa: F401
from isvins_tpu.geom import mat_to_quat, quat_to_mat
from isvins_tpu.initial.pnp import pnp_ransac_gn, pnp_gn
from isvins_tpu.posegraph.brief import match_descriptors, match_descriptors_clean
from debug_replay import load_db, make_cfg

db = load_db()
cfg = make_cfg()
w = np.load("debug_loop_world.npz")
gt = np.array([w["P"][np.argmin(np.abs(w["frame_times"] - t))] for t in db.ts[: db.n]])

cur, old = 66, 0
print("gt dist:", np.linalg.norm(gt[cur] - gt[old]))
print("vio dist:", np.linalg.norm(db.vio_t[cur] - db.vio_t[old]))
print("vio_t[cur]:", db.vio_t[cur], "gt[cur]:", gt[cur])
print("vio_t[old]:", db.vio_t[old], "gt[old]:", gt[old])
wv = db.win_valid[cur]
print("win pts:", int(wv.sum()), " old kp:", int(db.kp_valid[old].sum()))

best, dist = match_descriptors(
    jnp.asarray(db.win_desc[cur]), jnp.asarray(wv),
    jnp.asarray(db.kp_desc[old]), jnp.asarray(db.kp_valid[old]))
best, dist = np.asarray(best), np.asarray(dist)
m = wv & (dist < cfg.posegraph.hamming_thresh)
print("plain matches:", int(m.sum()), "dists:", np.sort(dist[m]))

bc, keep = match_descriptors_clean(
    jnp.asarray(db.win_desc[cur]), jnp.asarray(wv),
    jnp.asarray(db.kp_desc[old]), jnp.asarray(db.kp_valid[old]))
bc, keep = np.asarray(bc), np.asarray(keep)
print("clean matches:", int(keep.sum()))

# ground-truth check of the matches: project cur's 3D points into OLD's
# camera using old's VIO pose (old is early -> VIO ~ GT). pts3d are in cur's
# drifted frame though; estimate the drift SE3 from gt vs vio at cur... for a
# rough check just look at reprojection consistency with a best-fit pose:
RIC = np.asarray(cfg.ric_np); TIC = np.asarray(cfg.tic_np)
R_w_b_old = np.asarray(quat_to_mat(jnp.asarray(db.vio_q[old])))
R_w_c_old = R_w_b_old @ RIC
T_w_c_old = db.vio_t[old] + R_w_b_old @ TIC
q_cw_true = np.asarray(mat_to_quat(jnp.asarray(R_w_c_old.T)))
t_cw_true = -R_w_c_old.T @ T_w_c_old

for name, mask, idxs in [("plain", m, best), ("clean", keep, bc)]:
    if mask.sum() == 0:
        continue
    pts3d = db.win_pts3d[cur][mask]
    pts2d = db.kp_norm[old][idxs[mask]]
    # residuals at OLD's own pose (ignoring drift of the 3D points)
    q, t, errs = pnp_gn(pts3d, pts2d, q_cw_true, t_cw_true, weights=np.ones(len(pts3d)), iters=0)
    e = np.sqrt(np.asarray(errs))
    print(f"{name}: n={len(pts3d)} reproj err at old-vio pose (norm units): "
          f"median={np.median(e):.4f} (thresh {cfg.posegraph.pnp_inlier_thresh:.4f}) "
          f"frac<thresh={np.mean(e < cfg.posegraph.pnp_inlier_thresh):.2f}")
    # full GN from old pose
    q, t, _ = pnp_gn(pts3d, pts2d, q_cw_true, t_cw_true, iters=10)
    _, _, errs = pnp_gn(pts3d, pts2d, q, t, weights=np.ones(len(pts3d)), iters=0)
    e = np.sqrt(np.asarray(errs))
    print(f"{name}: after GN from old pose: frac<thresh="
          f"{np.mean(e < cfg.posegraph.pnp_inlier_thresh):.2f} median={np.median(e):.4f}")
    # the product path: RANSAC from CUR pose
    R_w_b = np.asarray(quat_to_mat(jnp.asarray(db.vio_q[cur])))
    R_w_c = R_w_b @ RIC
    T_w_c = db.vio_t[cur] + R_w_b @ TIC
    q0 = np.asarray(mat_to_quat(jnp.asarray(R_w_c.T)))
    t0 = -R_w_c.T @ T_w_c
    ok, qf, tf, inl = pnp_ransac_gn(pts3d, pts2d, q0, t0, thresh=cfg.posegraph.pnp_inlier_thresh)
    print(f"{name}: ransac from cur pose: ok={ok} inliers={int(inl.sum())}")
