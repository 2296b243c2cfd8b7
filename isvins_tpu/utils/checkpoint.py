"""Checkpoint / resume for the pose graph and the estimator.

The reference exposes `pose_graph_save_path` / `load_previous_pose_graph`
knobs but ships no save/load code (SURVEY.md §5: verified dead). This module
implements both properly: flat npz snapshots of the keyframe database (all
SoA arrays + loop edges + descriptors) and of the estimator's window state +
IS prior set, so a session can resume or relocalize against a prior map.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ------------------------------------------------------------- pose graph
_DB_FIELDS = [
    "ts", "seq", "vio_t", "vio_q", "opt_t", "opt_q", "cov",
    "edge_dt", "edge_dq", "edge_sqrt", "edge_valid",
    "rp_q", "rp_sqrt", "rp_valid",
    "loop_idx", "loop_dt", "loop_dq", "loop_weight",
    "kp_desc", "kp_norm", "kp_valid",
    "win_pts3d", "win_desc", "win_valid",
    "ret_desc", "ret_valid",
]


def save_pose_graph(db, path: str):
    db.flush_bow()  # quiesce: amortized tf backfill is not serialized
    arrays = {f: getattr(db, f)[: db.n] for f in _DB_FIELDS}
    np.savez_compressed(
        path, n=db.n, K=db.K, D=db.D, P=db.P,
        tf=db.tf[: db.n], df=db.df, vocab=db.vocab,
        vocab_frozen=db.vocab_frozen, **arrays,
    )


def load_pose_graph(path: str, capacity: int = 0):
    from ..posegraph.keyframe_db import KeyframeDB

    z = np.load(path, allow_pickle=False)
    n = int(z["n"])
    K = max(int(z["K"]), capacity)
    db = KeyframeDB(K, int(z["D"]), int(z["P"]))
    for f in _DB_FIELDS:
        getattr(db, f)[:n] = z[f]
    # BoW vocabulary/tf state (older snapshots lack it: the vocabulary then
    # re-freezes from the loaded keyframes on the next adds). The snapshot's
    # vocabulary width wins — a database written at W=1024 keeps scoring
    # with its own vocabulary after a load into a W=4096 build.
    if "vocab" in z.files:
        db.vocab = np.array(z["vocab"])
        db.W = db.vocab.shape[0]
        db.vocab_frozen = bool(z["vocab_frozen"])
        db.df = np.array(z["df"])
        db.tf = np.zeros((db.K, db.W), np.float32)
        db.tf[:n] = z["tf"]
        db._wg_centers = None  # hierarchical index rebuilds lazily
    db.n = n
    return db


# ------------------------------------------------------------- estimator
def save_estimator(est, path: str):
    # quiesce: collect any in-flight async marginalization so the snapshot
    # holds the post-slide priors (a pending future is not serializable and
    # dropping it silently would fork the resumed trajectory)
    est.collect_marg()
    pr = est.priors
    prior_arrays = {}
    if pr is not None:
        prior_arrays = {
            "pr_se3_t": np.asarray(pr.se3_t), "pr_se3_q": np.asarray(pr.se3_q),
            "pr_se3_sqrt": np.asarray(pr.se3_sqrt), "pr_se3_valid": np.asarray(pr.se3_valid),
            "pr_vb": np.asarray(pr.vb), "pr_vb_sqrt": np.asarray(pr.vb_sqrt),
            "pr_vb_valid": np.asarray(pr.vb_valid),
            "pr_rel_dt": np.asarray(pr.rel_dt), "pr_rel_dq": np.asarray(pr.rel_dq),
            "pr_rel_sqrt": np.asarray(pr.rel_sqrt), "pr_rel_valid": np.asarray(pr.rel_valid),
            "pr_rp_q": np.asarray(pr.rp.q_meas), "pr_rp_sqrt": np.asarray(pr.rp.sqrt_info),
            "pr_rp_idx": np.asarray(pr.rp.idx), "pr_rp_valid": np.asarray(pr.rp.valid),
        }
    fm = est.f_manager
    np.savez_compressed(
        path,
        Ps=est.Ps, Qs=est.Qs, Vs=est.Vs, Bas=est.Bas, Bgs=est.Bgs,
        Headers=est.Headers, tic=est.tic, qic=est.qic,
        imu_dt=est.imu_dt, imu_acc=est.imu_acc, imu_gyr=est.imu_gyr,
        imu_acc0=est.imu_acc0, imu_gyr0=est.imu_gyr0, imu_cnt=est.imu_cnt,
        imu_overflow=est.imu_overflow,
        frame_count=est.frame_count, solver_flag=est.solver_flag,
        acc_0=est.acc_0, gyr_0=est.gyr_0, first_imu=est.first_imu,
        marginalization_flag=est.marginalization_flag,
        has_priors=pr is not None,
        fm_ids=fm.ids, fm_start=fm.start, fm_obs=fm.obs, fm_vel=fm.vel,
        fm_has_obs=fm.has_obs, fm_depth=fm.depth, fm_solve_flag=fm.solve_flag,
        fm_outlier=fm.outlier,
        **prior_arrays,
    )


def load_estimator(est, path: str):
    """Restore a snapshot into an Estimator constructed with the same config."""
    from ..solver import PriorState, RollPitchFactors

    z = np.load(path, allow_pickle=False)
    for name in ["Ps", "Qs", "Vs", "Bas", "Bgs", "Headers", "tic", "qic",
                 "imu_dt", "imu_acc", "imu_gyr", "imu_acc0", "imu_gyr0", "imu_cnt"]:
        setattr(est, name, np.array(z[name]))  # fresh writable arrays
    if "imu_overflow" in z.files:
        est.imu_overflow = np.array(z["imu_overflow"])
    est.frame_count = int(z["frame_count"])
    est.solver_flag = int(z["solver_flag"])
    # IMU stream continuity: without these, the first post-resume sample is
    # treated as the stream start and its interval mis-integrated
    est.acc_0 = np.array(z["acc_0"])
    est.gyr_0 = np.array(z["gyr_0"])
    est.first_imu = bool(z["first_imu"])
    est.marginalization_flag = int(z["marginalization_flag"])
    fm = est.f_manager
    for src, dst in [("fm_ids", "ids"), ("fm_start", "start"), ("fm_obs", "obs"),
                     ("fm_vel", "vel"), ("fm_has_obs", "has_obs"),
                     ("fm_depth", "depth"), ("fm_solve_flag", "solve_flag"),
                     ("fm_outlier", "outlier")]:
        getattr(fm, dst)[:] = z[src]
    if bool(z["has_priors"]):
        est.priors = PriorState(
            se3_t=jnp.asarray(z["pr_se3_t"]), se3_q=jnp.asarray(z["pr_se3_q"]),
            se3_sqrt=jnp.asarray(z["pr_se3_sqrt"]),
            se3_valid=jnp.asarray(bool(z["pr_se3_valid"])),
            vb=jnp.asarray(z["pr_vb"]), vb_sqrt=jnp.asarray(z["pr_vb_sqrt"]),
            vb_valid=jnp.asarray(bool(z["pr_vb_valid"])),
            rel_dt=jnp.asarray(z["pr_rel_dt"]), rel_dq=jnp.asarray(z["pr_rel_dq"]),
            rel_sqrt=jnp.asarray(z["pr_rel_sqrt"]),
            rel_valid=jnp.asarray(z["pr_rel_valid"]),
            rp=RollPitchFactors(
                q_meas=jnp.asarray(z["pr_rp_q"]),
                sqrt_info=jnp.asarray(z["pr_rp_sqrt"]),
                idx=jnp.asarray(z["pr_rp_idx"]),
                valid=jnp.asarray(z["pr_rp_valid"]),
            ),
        )
    return est
