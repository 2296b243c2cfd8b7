"""Loop-closure retrieval recall/precision harness.

Sweeps a many-keyframe textured synthetic world (RoomRenderer, multiple laps
of the room so every lap revisits every view) through the keyframe DB's
retrieval path and reports, against renderer ground truth:

  - retrieval recall@k: fraction of queries with a true revisit (< dist_gate
    of GT position AND < yaw_gate of GT yaw) that return at least one true
    candidate in the top-k,
  - retrieval precision@k: fraction of returned candidates that are true,
  - verification recall/precision: after PnP-RANSAC geometric verification
    (PoseGraphBuilder._find_connection gates) on GT-3D window points.

This is the quality instrumentation the DBoW2 replacement needs
(/root/reference/thirdparty/DBoW/TemplatedDatabase.h has 20 years of
published recall numbers behind it; a behavioral replacement must measure
its own). Usage:

    python retrieval_bench.py [--keyframes 500] [--json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import isvins_tpu  # noqa: F401
from isvins_tpu.config import CameraConfig, PoseGraphConfig, euroc_config
from isvins_tpu.frontend.image_ops import nms_topk, shi_tomasi_response
from isvins_tpu.geom.hostmath import mat_to_quat_np, mat_to_ypr_np, quat_to_mat_np
from isvins_tpu.posegraph.brief import brief_descriptors, make_brief_pattern
from isvins_tpu.posegraph.builder import PoseGraphBuilder
from isvins_tpu.posegraph.keyframe_db import KeyframeDB
from isvins_tpu.utils.synthetic import RoomRenderer, make_world


def ray_wall_depth(renderer, C_w, dirs_w):
    """Depth along each ray (n,3) from camera center C_w to the nearest wall
    (exact renderer geometry — GT 3D for detected keypoints)."""
    n_walls = len(renderer.centers)
    t_best = np.full(len(dirs_w), np.inf)
    for m in range(n_walls):
        nrm = renderer.normals[m]
        denom = dirs_w @ nrm
        num = (renderer.centers[m] - C_w) @ nrm
        with np.errstate(divide="ignore", invalid="ignore"):
            t = num / denom
        rel = C_w + t[:, None] * dirs_w - renderer.centers[m]
        a = rel @ renderer.u_axes[m]
        b = rel @ renderer.v_axes[m]
        hit = (
            (denom < -1e-9) & (t > 1e-6) & (t < t_best)
            & (np.abs(a) <= renderer.half_u) & (np.abs(b) <= renderer.half_v)
        )
        t_best = np.where(hit, t, t_best)
    return t_best


def build_db(n_kf: int, seed: int = 4):
    H, W = 240, 320
    f = 200.0
    cam = CameraConfig(width=W, height=H, fx=f, fy=f, cx=W / 2, cy=H / 2,
                       k1=0.0, k2=0.0, p1=0.0, p2=0.0)
    R_bc = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    # keyframes ~0.3 m apart on a r=3 circle -> ~63 kf/lap; n_kf covers
    # n_kf/63 laps, every keyframe past the first lap is a true revisit
    frame_hz = 6.0  # 1.8 m/s / 0.3 m
    world = make_world(n_frames=n_kf, frame_hz=frame_hz, imu_hz=60.0,
                       n_landmarks=10, seed=seed, traj_r=3.0, traj_w=0.6)
    qic = mat_to_quat_np(np.asarray(R_bc))
    renderer = RoomRenderer(world, cam, np.zeros(3), qic, seed=seed + 1)

    pg = PoseGraphConfig()
    db = KeyframeDB(max(n_kf, 128), pg.max_kp_per_kf, 256)
    pattern = jnp.asarray(make_brief_pattern(pg.brief_bits))
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    Kinv = np.linalg.inv(K)

    gt_t = np.zeros((n_kf, 3))
    gt_yaw = np.zeros(n_kf)
    t0 = time.time()
    for k in range(n_kf):
        img, _, _ = renderer.render(k)
        imgj = jnp.asarray(img, jnp.float32)
        resp = shi_tomasi_response(imgj)
        cand, vals, okc = nms_topk(resp, db.D, 10, border=14)
        cand = np.array(cand)
        desc = np.asarray(brief_descriptors(imgj, jnp.asarray(cand),
                                            jnp.ones(len(cand), bool), pattern))
        kp_norm = (np.concatenate([cand, np.ones((len(cand), 1))], 1) @ Kinv.T)[:, :2]

        # GT world pose of the camera
        R_wb = quat_to_mat_np(np.asarray(world.Q[k]))
        R_wc = R_wb @ R_bc
        C_w = world.P[k]
        gt_t[k] = C_w
        gt_yaw[k] = mat_to_ypr_np(R_wb)[0]

        # window points: GT 3D of the strongest detections (ray-cast depth)
        P = db.P
        n_w = min(len(cand), P)
        dirs_c = np.concatenate([kp_norm[:n_w], np.ones((n_w, 1))], axis=1)
        dirs_w = dirs_c @ R_wc.T
        depth = ray_wall_depth(renderer, C_w, dirs_w)
        okd = np.isfinite(depth)
        pts_w = C_w + depth[:, None] * dirs_w

        kp_desc = np.zeros((db.D, 8), np.uint32)
        kp_normf = np.zeros((db.D, 2))
        kp_valid = np.zeros(db.D, bool)
        kp_desc[: len(cand)] = desc
        kp_normf[: len(cand)] = kp_norm
        kp_valid[: len(cand)] = True

        win_desc = np.zeros((P, 8), np.uint32)
        win_valid = np.zeros(P, bool)
        win_pts3d = np.zeros((P, 3))
        win_norm = np.zeros((P, 2))
        win_desc[:n_w] = desc[:n_w]
        win_valid[:n_w] = okd[:n_w]
        win_pts3d[:n_w] = np.where(okd[:n_w, None], pts_w[:n_w], 0.0)
        win_norm[:n_w] = kp_norm[:n_w]

        db.add(
            ts=float(world.frame_times[k]), seq=1,
            vio_t=world.P[k], vio_q=world.Q[k],
            opt_t=world.P[k], opt_q=world.Q[k],
            kp_desc=kp_desc, kp_norm=kp_normf, kp_valid=kp_valid,
            win_desc=win_desc, win_valid=win_valid, win_pts3d=win_pts3d,
        )
        if (k + 1) % 100 == 0:
            print(f"  built {k+1}/{n_kf} keyframes ({time.time()-t0:.0f}s)")
    return db, gt_t, gt_yaw, world, R_bc


def evaluate(db, gt_t, gt_yaw, cfg_pg, dist_gate=1.0, yaw_gate=30.0,
             gt_q=None, rel_t_gate=0.3, rel_yaw_gate=5.0):
    """Retrieval truth: an older keyframe within (dist_gate, yaw_gate) of the
    query's GT pose. Verified-loop truth: the MEASURED loop relative pose
    (loop_dt/loop_dq, what the pose graph consumes) matches the GT relative
    pose within (rel_t_gate, rel_yaw_gate) — a loop against a 1.5 m-away
    keyframe with an accurate relative pose is a GOOD loop."""
    from isvins_tpu.geom import quat_to_mat, mat_to_ypr

    n = db.n
    skip = cfg_pg.skip_recent
    stats = dict(q_with_truth=0, q_recall_hits=0, cand_total=0, cand_true=0,
                 ver_fired=0, ver_true=0, q_ver_hits=0, rel_errs=[])

    # builder shell for _find_connection (no camera: norm coords stored)
    cfg = euroc_config().replace(posegraph=cfg_pg, tic=(0.0, 0.0, 0.0),
                                 ric=((0, 0, 1.0), (-1.0, 0, 0), (0, -1.0, 0)))
    shell = PoseGraphBuilder.__new__(PoseGraphBuilder)
    shell.cfg = cfg
    shell.pg = cfg_pg
    shell.db = db

    for idx in range(skip + 1, n):
        hi = idx - skip
        d = np.linalg.norm(gt_t[:hi] - gt_t[idx], axis=1)
        dy = np.abs((gt_yaw[:hi] - gt_yaw[idx] + 180) % 360 - 180)
        truth = (d < dist_gate) & (dy < yaw_gate)
        cands = db.query(idx, skip, cfg_pg.top_k,
                         match_thresh=cfg_pg.retrieval_match_thresh,
                         abs_frac=cfg_pg.retrieval_abs_frac)
        if truth.any():
            stats["q_with_truth"] += 1
            if any(truth[c] for c in cands):
                stats["q_recall_hits"] += 1
        stats["cand_total"] += len(cands)
        stats["cand_true"] += int(sum(bool(truth[c]) for c in cands))
        # geometric verification pass
        fired = -1
        for c in cands:
            if shell._find_connection(idx, c):
                fired = c
                break
        if fired >= 0:
            stats["ver_fired"] += 1
            # correctness of the MEASURED relative pose vs GT
            R_old = np.asarray(quat_to_mat(jnp.asarray(db.vio_q[fired])))
            rel_t_gt = R_old.T @ (gt_t[idx] - gt_t[fired])
            e_t = np.linalg.norm(db.loop_dt[idx] - rel_t_gt)
            dy = abs((gt_yaw[idx] - gt_yaw[fired]) % 360.0)
            R_meas = np.asarray(quat_to_mat(jnp.asarray(db.loop_dq[idx])))
            yaw_meas = np.asarray(mat_to_ypr(jnp.asarray(R_meas)))[0]
            e_y = abs((yaw_meas - (gt_yaw[idx] - gt_yaw[fired]) + 180.0) % 360.0 - 180.0)
            stats["rel_errs"].append((e_t, e_y))
            good_loop = e_t < rel_t_gate and e_y < rel_yaw_gate
            if good_loop:
                stats["ver_true"] += 1
            if truth.any() and good_loop:
                stats["q_ver_hits"] += 1
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keyframes", type=int, default=500)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    pg = PoseGraphConfig(skip_recent=50, min_loop_matches=15)
    db, gt_t, gt_yaw, world, R_bc = build_db(args.keyframes)
    st = evaluate(db, gt_t, gt_yaw, pg)

    recall = st["q_recall_hits"] / max(st["q_with_truth"], 1)
    precision = st["cand_true"] / max(st["cand_total"], 1)
    ver_recall = st["q_ver_hits"] / max(st["q_with_truth"], 1)
    ver_precision = st["ver_true"] / max(st["ver_fired"], 1)
    errs = np.array(st["rel_errs"]) if st["rel_errs"] else np.zeros((0, 2))
    out = {
        "keyframes": int(db.n),
        "queries_with_truth": st["q_with_truth"],
        "retrieval_recall_at_4": round(recall, 3),
        "retrieval_precision": round(precision, 3),
        "verified_loop_recall": round(ver_recall, 3),
        "verified_loop_precision": round(ver_precision, 3),
        "loops_fired": st["ver_fired"],
        "loop_rel_t_err_median_m": round(float(np.median(errs[:, 0])), 4) if len(errs) else None,
        "loop_rel_yaw_err_median_deg": round(float(np.median(errs[:, 1])), 3) if len(errs) else None,
    }
    print(json.dumps(out) if args.json else out)
    with open("RETRIEVAL_r05.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
