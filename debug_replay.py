"""Offline replay of loop retrieval + verification from debug_loop_db.npz.

Loads the keyframe DB dumped by debug_loop.py (the exact failing
test_system_loop_closure_reduces_drift run) and replays db.query +
PoseGraphBuilder._find_connection per keyframe with reject-reason printing,
so retrieval/verification tuning iterates in seconds instead of 9 minutes.
"""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import isvins_tpu  # noqa: F401
from isvins_tpu.config import CameraConfig, PoseGraphConfig, euroc_config
from isvins_tpu.geom import mat_to_quat, mat_to_ypr, quat_to_mat
from isvins_tpu.initial.pnp import pnp_ransac_gn
from isvins_tpu.posegraph.brief import match_descriptors
from isvins_tpu.posegraph.keyframe_db import KeyframeDB


def load_db(path="debug_loop_db.npz"):
    z = np.load(path)
    db = KeyframeDB(256, 256, 256)
    for k in z.files:
        if k == "n":
            db.n = int(z[k])
        elif hasattr(db, k) and isinstance(getattr(db, k), np.ndarray):
            arr = z[k]
            getattr(db, k)[: arr.shape[0]] = arr
    return db


def make_cfg():
    H, W = 240, 320
    f = 200.0
    cam = CameraConfig(width=W, height=H, fx=f, fy=f, cx=W / 2, cy=H / 2,
                       k1=0.0, k2=0.0, p1=0.0, p2=0.0)
    R_bc = ((0.0, 0.0, 1.0), (-1.0, 0.0, 0.0), (0.0, -1.0, 0.0))
    return euroc_config().replace(
        camera=cam,
        posegraph=PoseGraphConfig(skip_recent=25, min_loop_matches=15,
                                  keyframe_min_dist=0.3,
                                  max_keyframes=256, max_kp_per_kf=256),
        tic=(0.0, 0.0, 0.0),
        ric=R_bc,
    )


def find_connection_verbose(cfg, db, cur, old):
    pg = cfg.posegraph
    wv = db.win_valid[cur]
    if wv.sum() < pg.min_loop_matches:
        return False, f"win_pts {int(wv.sum())} < {pg.min_loop_matches}"
    best, dist = match_descriptors(
        jnp.asarray(db.win_desc[cur]), jnp.asarray(wv),
        jnp.asarray(db.kp_desc[old]), jnp.asarray(db.kp_valid[old]),
    )
    best = np.asarray(best)
    dist = np.asarray(dist)
    m = wv & (dist < pg.hamming_thresh)
    if m.sum() <= pg.min_loop_matches:
        return False, f"ham_matches {int(m.sum())} <= {pg.min_loop_matches}"

    pts3d = db.win_pts3d[cur][m]
    pts2d_old = db.kp_norm[old][best[m]]
    RIC = np.asarray(cfg.ric_np)
    TIC = np.asarray(cfg.tic_np)
    R_w_b = np.asarray(quat_to_mat(jnp.asarray(db.vio_q[cur])))
    R_w_c = R_w_b @ RIC
    T_w_c = db.vio_t[cur] + R_w_b @ TIC
    q_cw0 = np.asarray(mat_to_quat(jnp.asarray(R_w_c.T)))
    t_cw0 = -R_w_c.T @ T_w_c

    ok, q_cw, t_cw, inl = pnp_ransac_gn(
        pts3d, pts2d_old, q_cw0, t_cw0, thresh=pg.pnp_inlier_thresh
    )
    n_in = int(inl.sum())
    if not ok or n_in <= 0.6 * pg.min_loop_matches:
        return False, f"pnp ok={ok} inliers={n_in} (matches={int(m.sum())})"

    R_cw = np.asarray(quat_to_mat(jnp.asarray(q_cw)))
    R_w_c_old = R_cw.T
    T_w_c_old = -R_w_c_old @ np.asarray(t_cw)
    R_old = R_w_c_old @ RIC.T
    T_old = T_w_c_old - R_old @ TIC
    rel_t = R_old.T @ (db.vio_t[cur] - T_old)
    rel_R = R_old.T @ np.asarray(quat_to_mat(jnp.asarray(db.vio_q[cur])))
    yaw_cur = np.asarray(mat_to_ypr(jnp.asarray(quat_to_mat(jnp.asarray(db.vio_q[cur])))))[0]
    yaw_old = np.asarray(mat_to_ypr(jnp.asarray(R_old)))[0]
    rel_yaw = (yaw_cur - yaw_old + 180.0) % 360.0 - 180.0
    if abs(rel_yaw) >= pg.max_yaw_deg or np.linalg.norm(rel_t) >= pg.max_dist:
        return False, (f"gates rel_yaw={rel_yaw:.1f} "
                       f"rel_t={np.linalg.norm(rel_t):.2f} inliers={n_in}")
    return True, f"LOOP inliers={n_in} rel_t={np.linalg.norm(rel_t):.2f}"


def main():
    db = load_db()
    w = np.load("debug_loop_world.npz")
    cfg = make_cfg()
    pg = cfg.posegraph
    gt = np.array([w["P"][np.argmin(np.abs(w["frame_times"] - t))]
                   for t in db.ts[: db.n]])
    print(f"db.n={db.n}  win_valid counts: "
          f"{[int(db.win_valid[i].sum()) for i in range(db.n)]}")
    n_loops = 0
    for idx in range(db.n):
        hi = idx - pg.skip_recent
        if hi <= 0:
            continue
        d = np.linalg.norm(gt[:hi] - gt[idx], axis=1)
        near = [int(x) for x in np.where(d < 1.0)[0]]
        cands = db.query(idx, pg.skip_recent, pg.top_k,
                         match_thresh=pg.retrieval_match_thresh,
                         abs_frac=pg.retrieval_abs_frac)
        msgs = []
        fired = False
        for c in cands:
            ok, why = find_connection_verbose(cfg, db, idx, c)
            msgs.append(f"{c}:{why}")
            if ok:
                fired = True
                break
        if fired:
            n_loops += 1
        print(f"kf {idx:3d} near={near} cands={cands}  " + " | ".join(msgs))
    print(f"\ntotal loops fired: {n_loops}")


if __name__ == "__main__":
    main()
