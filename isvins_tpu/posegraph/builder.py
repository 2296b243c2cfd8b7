"""Pose-graph builder orchestration.

Replaces the PoseGraphBuilder thread + KeyFrame construction + PoseGraph
bookkeeping (src/pose_graph/pose_graph_builder.cpp, keyframe.cpp,
pose_graph.cpp): consumes the estimator's per-marginalization
PoseGraphPacket + keyframe point exports + camera images, accumulates VIO
edges with adjoint covariance transport until the 0.1 m keyframe gate
(pose_graph_factors.h operator+, builder :157–216), extracts BRIEF
descriptors, detects loops via global-descriptor retrieval + Hamming
matching + PnP-RANSAC verification (detectLoop + findConnection), runs the
dense pose-graph optimization when loops close, and applies drift to the
incoming stream.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..estimator.marginalization import PoseGraphPacket
from ..factors.priors import relpose_update_anchor
from ..geom import (
    mat_to_quat,
    mat_to_ypr,
    quat_conj,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_mat,
    se3_adjoint,
    se3_compose,
)
from ..initial.pnp import pnp_ransac_gn
from .brief import brief_descriptors, make_brief_pattern, match_descriptors_clean
from .keyframe_db import KeyframeDB
from .optimize import optimize_pose_graph
from ..frontend.image_ops import nms_topk, shi_tomasi_response
from ..utils import perf


@dataclass
class _Accum:
    dt: np.ndarray
    dq: np.ndarray
    cov: np.ndarray
    anchor_t: Optional[np.ndarray] = None
    anchor_q: Optional[np.ndarray] = None
    ts: float = 0.0
    rp_q: Optional[np.ndarray] = None
    rp_cov: Optional[np.ndarray] = None
    has_rp: bool = False

    @staticmethod
    def identity():
        return _Accum(np.zeros(3), np.array([1.0, 0, 0, 0]), np.zeros((6, 6)))


class PoseGraphBuilder:
    def __init__(self, cfg, camera=None, kf_step_on_cpu: bool = False):
        """kf_step_on_cpu routes the fused per-keyframe program (projection
        + BRIEF + Shi-Tomasi/NMS + undistort) to the host CPU backend. Used
        when the builder runs on a worker thread against a REMOTE
        accelerator: each remote call costs ~24 ms of tunnel latency and the
        worker's calls serialize with the frame path's solve/tracker
        dispatches on the tunnel — measured +100 ms/frame of tracker-collect
        blocking when both threads stream through it. On CPU the program is
        a few ms at 320x240 and the worker never touches the tunnel for
        keyframes (loop optimization still dispatches to the accelerator —
        rare enough to ride out)."""
        pg = cfg.posegraph
        self.cfg = cfg
        self.pg = pg
        self.kf_step_on_cpu = bool(kf_step_on_cpu)
        self.db = KeyframeDB(pg.max_keyframes, pg.max_kp_per_kf, 256)
        # numpy, not a device array: a jit that closes over a committed
        # device constant re-uploads it per trace on the remote runtime
        self.pattern = np.asarray(make_brief_pattern(pg.brief_bits))
        self._kf_prog = None  # fused keyframe device program (lazy jit)
        self.camera = camera  # camera model (make_camera) for norm->pixel projection
        self.accum = _Accum.identity()
        self.last_kf: Optional[int] = None
        self.earliest_loop = -1
        self.r_drift = np.eye(3)
        self.t_drift = np.zeros(3)
        self.pending_optimize = []
        self.n_loops = 0
        self._pending_opt = None  # in-flight async optimization
        self._opt_dirty = None  # newest loop idx that fired while in flight
        self._opt_align_epoch = 0
        self.n_async_collects = 0

        # multi-sequence state (pose_graph_builder.h:70, pose_graph.cpp:33–48,
        # 84–105): live sequences start at 1 (0 is reserved for a loaded map);
        # each sequence's VIO poses are shifted into the common world by
        # (w_r_vio, w_t_vio), which is identity until the sequence's first
        # inter-sequence loop closure fixes the alignment (once per sequence)
        self.sequence = 1
        self.sequence_loop = {0: True, 1: False}
        self.w_r_vio = np.eye(3)
        self.w_t_vio = np.zeros(3)
        self._db_seq_cnt = 1  # sequence of the last added keyframe
        self.n_sequence_aligns = 0

    def prewarm(self):
        """Compile the builder's device programs before streaming (run on
        the worker thread at startup): the fused keyframe program, the
        descriptor matcher, and the FIRST pose-graph-optimize capacity rung
        (K=64/L=64). On a cold compile cache these otherwise land
        mid-stream — the optimize core alone is a multi-second compile that
        used to appear as a 2-4.8 s frame-time spike the first time a loop
        closed."""
        import contextlib
        cc = self.cfg.camera
        try:
            img = np.zeros((cc.height, cc.width), np.float32)
            self._kf_device_step(img, np.zeros((self.db.P, 2)),
                                 np.zeros(self.db.P, bool))
        except Exception:  # pragma: no cover - prewarm is best-effort
            logging.getLogger(__name__).exception("kf-program prewarm failed")
        ctx = (contextlib.nullcontext() if jax.default_backend() == "cpu"
               else jax.default_device(jax.devices("cpu")[0]))
        try:
            with ctx:
                match_descriptors_clean(
                    jnp.zeros((self.db.P, 8), jnp.uint32),
                    jnp.zeros(self.db.P, bool),
                    jnp.zeros((self.db.D, 8), jnp.uint32),
                    jnp.zeros(self.db.D, bool),
                    ham_thresh=self.pg.hamming_thresh,
                )
        except Exception:  # pragma: no cover
            logging.getLogger(__name__).exception("matcher prewarm failed")
        try:
            # PnP verification shape buckets (CPU-routed in find_connection;
            # each bucket's trace+compile at the first loop closure holds
            # the GIL for O(seconds) and starves the streaming thread)
            from ..initial.pnp import pnp_ransac_gn

            with ctx:
                q0 = np.array([1.0, 0.0, 0.0, 0.0])
                rngp = np.random.default_rng(0)
                for n in (16, 64, 128, 256):
                    if n > self.db.P:
                        break
                    pnp_ransac_gn(
                        rngp.normal(size=(n, 3)) + np.array([0, 0, 5.0]),
                        rngp.normal(size=(n, 2)) * 0.1, q0, np.zeros(3),
                        thresh=self.pg.pnp_inlier_thresh,
                    )
        except Exception:  # pragma: no cover
            logging.getLogger(__name__).exception("pnp prewarm failed")
        try:
            from .optimize import _optimize_core

            K = L = 64
            sdtype = (np.float64 if jax.default_backend() == "cpu"
                      else np.float32)
            q0 = np.tile(np.array([1.0, 0, 0, 0], sdtype), (K, 1))
            _optimize_core(
                jnp.zeros((K, 3), sdtype), jnp.asarray(q0),
                jnp.zeros(K, bool),
                jnp.zeros((K, 3), sdtype), jnp.asarray(q0),
                jnp.zeros((K, 6, 6), sdtype), jnp.zeros(K, bool),
                jnp.asarray(q0), jnp.zeros((K, 2, 2), sdtype),
                jnp.zeros(K, bool),
                jnp.zeros(L, jnp.int32), jnp.zeros(L, jnp.int32),
                jnp.zeros((L, 3), sdtype), jnp.asarray(q0[:L]),
                jnp.zeros(L, sdtype), jnp.zeros(L, bool),
                jnp.zeros(K, bool), K=K, L=L, iters=10,
            )
        except Exception:  # pragma: no cover
            logging.getLogger(__name__).exception("optimize prewarm failed")

    def new_sequence(self):
        """Stream discontinuity: start a new pose-graph sequence
        (pose_graph_builder.cpp:3–19). The partially accumulated edge is
        discarded (the reference clears its factor queues); the sequence
        counter is unbounded (the reference warns above 5)."""
        self.sequence += 1
        self.sequence_loop[self.sequence] = False
        self.accum = _Accum.identity()
        logging.getLogger(__name__).info(
            "pose graph: new sequence %d", self.sequence
        )

    # ----------------------------------------------------------- accumulate
    def push(self, packet: PoseGraphPacket, kf_points, image=None) -> Optional[int]:
        """Feed one marginalization packet (+ the keyframe's exported points
        and grayscale image). Returns the new keyframe index if the 0.1 m
        gate fired, else None."""
        from ..geom import hostmath as hm

        a = self.accum
        # T = T0 * T1; cov += Adj(T0) cov1 Adj(T0)^T  (pose_graph_factors.h:27–51)
        Adj0 = hm.se3_adjoint_np(a.dt, a.dq)
        cov1 = np.asarray(packet.cov_rel)
        a.cov = a.cov + Adj0 @ cov1 @ Adj0.T
        dq_rel = np.asarray(packet.rel_dq)
        a.dt = hm.quat_to_mat_np(a.dq) @ np.asarray(packet.rel_dt) + a.dt
        a.dq = hm.quat_normalize_np(hm.quat_mul_np(a.dq, dq_rel))
        a.rp_q = np.asarray(packet.rp_q)
        a.rp_cov = np.asarray(packet.cov_abs)
        a.has_rp = bool(packet.has_rollpitch)
        if a.anchor_t is None:
            a.anchor_t = np.asarray(packet.anchor_t)
            a.anchor_q = np.asarray(packet.anchor_q)
            a.ts = float(packet.ts)
            a.kf_points = kf_points
            a.image = image

        if np.linalg.norm(a.dt) <= self.pg.keyframe_min_dist:
            return None
        return self._make_keyframe()

    # ------------------------------------------------------------- keyframe
    def _make_keyframe(self) -> int:
        # collect a finished in-flight loop optimization first: its writes
        # (opt poses / drift) must land before this keyframe reads r_drift
        self._poll_optimize()
        a = self.accum
        db = self.db
        i = db.n

        # first keyframe of a new sequence: reset the world alignment and the
        # drift — the new sequence starts in its own VIO frame until an
        # inter-sequence loop closure aligns it (pose_graph.cpp:33–43)
        if self.sequence != self._db_seq_cnt:
            self._db_seq_cnt = self.sequence
            self.w_r_vio = np.eye(3)
            self.w_t_vio = np.zeros(3)
            self.r_drift = np.eye(3)
            self.t_drift = np.zeros(3)

        # shift the incoming VIO anchor into the common world
        # (pose_graph.cpp:45–48: vio = w_r_vio * vio + w_t_vio)
        from ..geom import hostmath as hm

        anchor_t = self.w_r_vio @ np.asarray(a.anchor_t) + self.w_t_vio
        anchor_q = hm.quat_normalize_np(
            hm.quat_mul_np(hm.mat_to_quat_np(self.w_r_vio), np.asarray(a.anchor_q))
        )

        # retro-update previous keyframe's edge to the actual new anchor
        # (pose_graph_builder.cpp:192–199), then install it
        if self.last_kf is not None:
            from ..factors.priors import relpose_update_anchor_np

            j = self.last_kf
            tj_pred = hm.quat_to_mat_np(db.vio_q[j]) @ db.edge_dt[j] + db.vio_t[j]
            qj_pred = hm.quat_normalize_np(hm.quat_mul_np(db.vio_q[j], db.edge_dq[j]))
            dt_new, dq_new = relpose_update_anchor_np(
                db.edge_dt[j], db.edge_dq[j],
                db.vio_t[j], db.vio_q[j],
                tj_pred, qj_pred,
                anchor_t, anchor_q,
            )
            db.edge_dt[j] = dt_new
            db.edge_dq[j] = dq_new

        # descriptors
        kf_pts = a.kf_points
        P = db.P
        win_desc = np.zeros((P, 8), np.uint32)
        win_valid = np.zeros(P, bool)
        win_pts3d = np.zeros((P, 3))
        win_norm = np.zeros((P, 2))
        kp_desc = np.zeros((db.D, 8), np.uint32)
        kp_norm = np.zeros((db.D, 2))
        kp_valid = np.zeros(db.D, bool)
        if a.image is not None:
            # ONE fused device call per keyframe: window-point projection +
            # bounds gate + BRIEF on window points + Shi-Tomasi/NMS detection
            # + BRIEF on detections + undistortion. The previous 5 separate
            # calls cost ~150 ms of pure round-trip latency per keyframe on
            # the remote runtime (~30 ms each), dominating the loops-enabled
            # e2e frame time (keyframe.cpp:43-69 runs these on the decoupled
            # pose-graph thread; our single host thread must keep the device
            # traffic per keyframe minimal instead).
            norm = np.zeros((P, 2))
            normv = np.zeros(P, bool)
            pts_w_pad = np.zeros((P, 3))
            if kf_pts is not None and len(kf_pts.points_w) > 0:
                m = len(kf_pts.points_w)
                if m > P:
                    logging.getLogger(__name__).warning(
                        "keyframe window-point cap: %d points > P=%d; "
                        "dropping %d", m, P, m - P,
                    )
                    m = P
                norm[:m] = kf_pts.pts_norm[:m]
                pts_w_pad[:m] = kf_pts.points_w[:m]
                normv[:m] = True
            with perf.phase("pg.kf_device_step"):
                px, inb, wd, cand, okc, kd, un = self._kf_device_step(
                    a.image, norm, normv)

            rows = np.where(inb)[0]
            n_w = len(rows)
            win_desc[:n_w] = wd[rows]
            win_valid[:n_w] = True
            win_pts3d[:n_w] = pts_w_pad[rows]
            win_norm[:n_w] = norm[rows]
            # window descriptors are also matchable (reference adds both)
            kp_desc[:n_w] = wd[rows]
            kp_norm[:n_w] = norm[rows]
            kp_valid[:n_w] = True

            # extra detected keypoints over the full frame (keyframe.cpp:55–69)
            n_det = int(min(db.D - n_w, okc.sum()))
            kp_desc[n_w : n_w + n_det] = kd[:n_det]
            kp_valid[n_w : n_w + n_det] = True
            kp_norm[n_w : n_w + n_det] = un[:n_det]

        idx = db.add(
            ts=a.ts,
            seq=self.sequence,
            vio_t=anchor_t,
            vio_q=anchor_q,
            opt_t=self.r_drift @ anchor_t + self.t_drift,
            opt_q=hm.quat_normalize_np(
                hm.quat_mul_np(hm.mat_to_quat_np(self.r_drift), anchor_q)
            ),
            rp_q=a.rp_q if a.has_rp else np.array([1.0, 0, 0, 0]),
            rp_sqrt=(
                np.linalg.cholesky(np.linalg.inv(a.rp_cov + 1e-12 * np.eye(2))).T
                if a.has_rp
                else np.zeros((2, 2))
            ),
            rp_valid=a.has_rp,
            win_pts3d=win_pts3d,
            win_desc=win_desc,
            win_valid=win_valid,
            kp_desc=kp_desc,
            kp_norm=kp_norm,
            kp_valid=kp_valid,
        )
        # Install the accumulated chain as the NEW keyframe's own outgoing
        # edge (the reference builds the KeyFrame *from* accumFactor, so the
        # keyframe at the chain's anchor carries the chain as its edge toward
        # the next keyframe; pose_graph_builder.cpp:200–204). It is dragged
        # to the next keyframe's exact anchor by the retro-update above when
        # that keyframe arrives.
        self.db.edge_dt[idx] = np.asarray(self.accum.dt)
        self.db.edge_dq[idx] = np.asarray(self.accum.dq)
        info = np.linalg.inv(self.accum.cov + 1e-10 * np.eye(6))
        info = 0.5 * (info + info.T)
        w, V = np.linalg.eigh(info)
        w = np.clip(w, 0.0, None)
        self.db.edge_sqrt[idx] = (V * np.sqrt(w)[None, :]) @ V.T
        self.db.edge_valid[idx] = True

        self.last_kf = idx
        self._win_pts3d_count = int(win_valid.sum())

        # loop closure: geometric verification arbitrates among the retrieval
        # candidates (best-first); the reference verifies only DBoW's single
        # pick (pose_graph.cpp:106), but its k10L6 vocabulary is a far
        # stronger ranker than brute-force match counting — trying the top-k
        # restores the same loop recall at equal precision (PnP + yaw/dist
        # gates reject wrong candidates)
        if self.pg.enabled:
            with perf.phase("pg.query"):
                cands = self.db.query(
                    idx, self.pg.skip_recent, self.pg.top_k,
                    match_thresh=self.pg.retrieval_match_thresh,
                    abs_frac=self.pg.retrieval_abs_frac,
                    bow_abs=self.pg.bow_abs_score,
                )
            with perf.phase("pg.find_connection"):
                old = next((c for c in cands if self._find_connection(idx, c)), -1)
            if old >= 0:
                self.n_loops += 1
                # inter-sequence loop: align the current sequence's VIO frame
                # onto the old world, once per sequence (pose_graph.cpp:84–105)
                seq_cur = int(db.seq[idx])
                if int(db.seq[old]) != seq_cur and not self.sequence_loop.get(
                    seq_cur, False
                ):
                    self._align_sequence(idx, old)
                    self.sequence_loop[seq_cur] = True
                    self.n_sequence_aligns += 1
                if self.earliest_loop < 0 or self.db.loop_idx[idx] < self.earliest_loop:
                    self.earliest_loop = int(self.db.loop_idx[idx])
                self._request_optimize(idx)

        self.accum = _Accum.identity()
        return idx

    def _kf_device_step(self, image, norm, normv):
        """Fused per-keyframe device program (lazy-jitted once): project the
        exported window points through the camera, gate to the image bounds,
        extract BRIEF at the projections, detect up to D Shi-Tomasi corners
        (NMS), extract BRIEF at the detections, and undistort them — one
        dispatch instead of five."""
        if self._kf_prog is None:
            cam = self.camera
            cc = self.cfg.camera
            pattern = self.pattern
            D = self.db.D

            P = self.db.P

            @jax.jit
            def prog(img, norm, normv):
                img = img.astype(jnp.float32)
                norm = norm.astype(jnp.float32)
                if cam is not None:
                    pts3 = jnp.concatenate(
                        [norm, jnp.ones((norm.shape[0], 1), norm.dtype)], axis=1)
                    px = cam.space_to_plane(pts3)
                    inb = (
                        normv
                        & (px[:, 0] >= 14) & (px[:, 0] <= cc.width - 15)
                        & (px[:, 1] >= 14) & (px[:, 1] <= cc.height - 15)
                    )
                else:
                    px = norm  # tests may pass pixel coords directly
                    inb = normv
                wd = brief_descriptors(img, px, inb, pattern)
                resp = shi_tomasi_response(img)
                # border >= the BRIEF patch half-size (14): _brief_inner
                # clips the 28x28 patch origin to the image, so a keypoint
                # closer than 14 px to an edge would get a silently shifted
                # descriptor (ADVICE r04)
                cand, vals, okc = nms_topk(resp, D, 10, border=14)
                kd = brief_descriptors(img, cand, okc, pattern)
                if cam is not None:
                    un = cam.lift_projective(cand)[:, :2]
                else:
                    un = cand
                # pack into TWO transfer buffers: pulling 7 outputs one
                # np.asarray at a time cost 7 blocking round trips (~190 ms
                # per keyframe on the remote runtime); two async-copied
                # buffers cost ~one
                fbuf = jnp.concatenate(
                    [px.astype(jnp.float32),
                     inb[:, None].astype(jnp.float32)], axis=1)  # (P, 3)
                fbuf2 = jnp.concatenate(
                    [cand.astype(jnp.float32),
                     okc[:, None].astype(jnp.float32),
                     un.astype(jnp.float32)], axis=1)  # (D, 5)
                return fbuf, fbuf2, wd, kd

            self._kf_prog = prog
        import contextlib
        ctx = (jax.default_device(jax.devices("cpu")[0])
               if self.kf_step_on_cpu and jax.default_backend() != "cpu"
               else contextlib.nullcontext())
        with ctx:
            raw = self._kf_prog(jnp.asarray(image), jnp.asarray(norm),
                                jnp.asarray(normv))
        for r in raw:
            if hasattr(r, "copy_to_host_async"):
                r.copy_to_host_async()
        fbuf, fbuf2, wd, kd = (np.asarray(r) for r in raw)
        px = fbuf[:, :2]
        inb = fbuf[:, 2] > 0.5
        cand = fbuf2[:, :2]
        okc = fbuf2[:, 2] > 0.5
        un = fbuf2[:, 3:5]
        return px, inb, wd, cand, okc, kd, un

    # ---------------------------------------------- async loop optimization
    def _request_optimize(self, idx: int):
        """Run (or schedule) the pose-graph optimization for the active
        segment [earliest_loop..idx]. With cfg.posegraph.async_optimize the
        dense solve is DISPATCHED to the device and collected at the next
        keyframe — the VIO stream never blocks on it, mirroring the
        reference's decoupled optimizeCS thread (pose_graph.cpp:425-426)
        with drift applied eventually (:112-120). Synchronous mode keeps the
        round-3 behavior (tests that assert immediately-optimized poses)."""
        if not getattr(self.pg, "async_optimize", False):
            r_d, t_d, _ = optimize_pose_graph(
                self.db, self.earliest_loop, idx,
                dist_min_poses=self.pg.dist_min_poses,
                max_active=self.pg.max_active_poses,
            )
            self.r_drift = r_d
            self.t_drift = t_d
            return
        if self._pending_opt is not None:
            # one solve in flight at a time (the reference's poll thread also
            # runs one optimizeCS at a time); remember that a newer loop
            # wants a re-run with the larger range
            self._opt_dirty = max(self._opt_dirty or idx, idx)
            return
        with perf.phase("pg.opt_dispatch"):
            self._pending_opt = optimize_pose_graph(
                self.db, self.earliest_loop, idx,
                dist_min_poses=self.pg.dist_min_poses,
                max_active=self.pg.max_active_poses,
                async_dispatch=True,
            )
        self._opt_align_epoch = self.n_sequence_aligns

    def _poll_optimize(self):
        """Collect a finished in-flight optimization (called at each new
        keyframe and from the output accessors). Applies opt poses, covs,
        retro-updated edges and the drift; if more loops fired while the
        solve was in flight, immediately re-dispatches with the wider range.
        A sequence alignment (which rewrites vio poses the in-flight solve
        was seeded from) invalidates the pending solve — it is discarded and
        re-dispatched."""
        if self._pending_opt is None:
            return
        pend = self._pending_opt
        self._pending_opt = None
        if self._opt_align_epoch == self.n_sequence_aligns:
            with perf.phase("pg.opt_finalize"):
                r_d, t_d, _ = pend.finalize()
            self.r_drift = r_d
            self.t_drift = t_d
            self.n_async_collects += 1
        # else: stale seed (vio frame was re-aligned mid-flight) — discard
        redo = self._opt_dirty
        self._opt_dirty = None
        if redo is not None or self._opt_align_epoch != self.n_sequence_aligns:
            self._request_optimize(redo if redo is not None else pend.cur_idx)

    def flush_optimize(self):
        """End-of-stream: collect any in-flight optimization (System.flush's
        pose-graph analogue of joining the reference's optimizeCS thread)."""
        while self._pending_opt is not None:
            self._poll_optimize()

    # --------------------------------------------------------------- loops
    def _align_sequence(self, cur: int, old: int):
        """First loop between the current sequence and an earlier one:
        compute the world shift (w_r_vio, w_t_vio) that places the current
        keyframe where the loop measurement says it is in the old world, and
        apply it to the current sequence's keyframes (pose_graph.cpp:84–105;
        the fork shifts every keyframe with index > loop_index, which would
        also displace the tail of OLDER sequences — we keep the loop comment's
        stated intent, "shift vio pose of whole sequence", i.e. VINS-Mono
        upstream's same-sequence filter). Later keyframes of this sequence
        arrive pre-shifted via the push-time alignment."""
        from ..geom import hostmath as hm
        db = self.db
        R_old = hm.quat_to_mat_np(db.vio_q[old])
        # loop measurement: cur pose expressed in old's frame (tlc / Rlc)
        w_P_cur = R_old @ db.loop_dt[cur] + db.vio_t[old]
        w_R_cur = R_old @ hm.quat_to_mat_np(db.loop_dq[cur])
        R_vio_cur = hm.quat_to_mat_np(db.vio_q[cur])
        shift_r = w_R_cur @ R_vio_cur.T
        shift_t = w_P_cur - shift_r @ db.vio_t[cur]
        self.w_r_vio = shift_r
        self.w_t_vio = shift_t
        q_shift = hm.mat_to_quat_np(shift_r)
        seq_cur = int(db.seq[cur])
        for k in range(db.n):
            if int(db.seq[k]) != seq_cur:
                continue
            db.vio_t[k] = shift_r @ db.vio_t[k] + shift_t
            db.vio_q[k] = hm.quat_normalize_np(hm.quat_mul_np(q_shift, db.vio_q[k]))
        logging.getLogger(__name__).info(
            "pose graph: sequence %d aligned onto sequence %d via loop %d->%d",
            int(db.seq[cur]), int(db.seq[old]), cur, old,
        )

    def _find_connection(self, cur: int, old: int) -> bool:
        """keyframe.cpp findConnection (:232–282): Hamming match cur window
        descriptors vs old detected keypoints (ratio + cross-check cleaned —
        raw nearest-neighbor BRIEF on repetitive texture is 50%+ false and
        starves the RANSAC), initialization-free PnP-RANSAC, gates.

        The matching + RANSAC math is routed to the CPU backend on an
        accelerator deployment: the inputs are f64 host state (f64 on TPU is
        software-emulated — a verification attempt measured ~1 s through the
        remote runtime vs ~10 ms on the host CPU backend), and the problem
        is hundreds of points, far below device scale."""
        import contextlib
        ctx = (contextlib.nullcontext() if jax.default_backend() == "cpu"
               else jax.default_device(jax.devices("cpu")[0]))
        with ctx:
            return self._find_connection_impl(cur, old)

    def _find_connection_impl(self, cur: int, old: int) -> bool:
        db = self.db
        wv = db.win_valid[cur]
        if wv.sum() < self.pg.min_loop_matches:
            return False
        best, keep = match_descriptors_clean(
            jnp.asarray(db.win_desc[cur]), jnp.asarray(wv),
            jnp.asarray(db.kp_desc[old]), jnp.asarray(db.kp_valid[old]),
            ham_thresh=self.pg.hamming_thresh,
        )
        best = np.asarray(best)
        m = np.asarray(keep)
        if m.sum() <= self.pg.min_loop_matches:
            return False

        pts3d = db.win_pts3d[cur][m]
        pts2d_old = db.kp_norm[old][best[m]]
        # initial guess: cur keyframe's camera pose (PnPRANSAC, keyframe.cpp:168–175)
        RIC = np.asarray(self.cfg.ric_np)
        TIC = np.asarray(self.cfg.tic_np)
        from ..geom import hostmath as hm
        R_w_b = hm.quat_to_mat_np(db.vio_q[cur])
        R_w_c = R_w_b @ RIC
        T_w_c = db.vio_t[cur] + R_w_b @ TIC
        q_cw0 = hm.mat_to_quat_np(R_w_c.T)
        t_cw0 = -R_w_c.T @ T_w_c

        ok, q_cw, t_cw, inl = pnp_ransac_gn(
            pts3d, pts2d_old, q_cw0, t_cw0, thresh=self.pg.pnp_inlier_thresh
        )
        n_in = int(inl.sum())
        if not ok or n_in <= 0.6 * self.pg.min_loop_matches:
            return False

        # old body pose in cur world
        R_cw = hm.quat_to_mat_np(np.asarray(q_cw))
        R_w_c_old = R_cw.T
        T_w_c_old = -R_w_c_old @ np.asarray(t_cw)
        R_old = R_w_c_old @ RIC.T
        T_old = T_w_c_old - R_old @ TIC

        # loop weight (keyframe.cpp:211–227): (m-6)/res^2 over inliers, with
        # the residual divided by FOCAL_LENGTH=460 once more on top of the
        # normalized coordinates (keyframe.cpp:220) — that second division is
        # what puts loop sqrt-info (~1e4/axis) on the same footing as the
        # marginalization-derived sequential-edge information; without it
        # (round-3 behavior, w ~1e3) loop edges are ~460^2 weaker than the
        # reference's and cannot bend the VIO chain, so a closed loop left
        # meters of drift uncorrected. Floor: a quarter pixel of residual per
        # match keeps a near-exact synthetic fit from an unbounded weight.
        pc = (R_cw @ (pts3d[inl] - T_w_c_old).T).T
        pc = pc / pc[:, 2:3]
        res = np.linalg.norm(pc[:, :2] - pts2d_old[inl], axis=1).sum() / 460.0
        if n_in <= 6:
            return False
        res = max(res, n_in * 0.25 / (460.0 * 460.0))
        # cap: a near-exact synthetic fit otherwise claims ~5e9 (sub-0.1mm
        # certainty) — the f32 pose-graph solve on the accelerator went
        # non-finite at that scale on the 752x480 realism run. 1e9 stays
        # under the observed failure regime while keeping the loop edges
        # stiff enough to snap a drifted chain (a 1e8 cap measurably
        # weakened the drift correction: rmse_opt/rmse_vio 0.63 vs 0.50 on
        # the revisit world); PendingOptimize.finalize additionally rejects
        # any non-finite solve outright.
        loop_weight = min((n_in - 6) / (res * res), 1e9)

        # relative pose cur-in-old + gates (keyframe.cpp:276–282)
        rel_t = R_old.T @ (db.vio_t[cur] - T_old)
        rel_R = R_old.T @ R_w_b
        yaw_cur = hm.mat_to_ypr_np(R_w_b)[0]
        yaw_old = hm.mat_to_ypr_np(R_old)[0]
        rel_yaw = (yaw_cur - yaw_old + 180.0) % 360.0 - 180.0
        if abs(rel_yaw) >= self.pg.max_yaw_deg or np.linalg.norm(rel_t) >= self.pg.max_dist:
            return False

        db.loop_idx[cur] = old
        db.loop_dt[cur] = rel_t
        db.loop_dq[cur] = hm.mat_to_quat_np(rel_R)
        db.loop_weight[cur] = loop_weight
        return True

    # --------------------------------------------------------------- output
    def trajectory(self):
        """(ts, t, q) arrays of optimized keyframe poses (loop_pose_output.txt
        equivalent, pose_graph.cpp:412–423)."""
        self.flush_optimize()
        n = self.db.n
        return self.db.ts[:n].copy(), self.db.opt_t[:n].copy(), self.db.opt_q[:n].copy()

    def covariances(self):
        """(ts, opt_t, cov (n,6,6)) — the per-keyframe 6x6 covariance blocks
        of the latest pose-graph solve (ceres::Covariance parity; the
        reference renders these as live ellipses, pose_graph_builder.cpp:
        272–301 — surfaced here for the text dump / offline plot in
        utils/visualization.py)."""
        self.flush_optimize()
        n = self.db.n
        return (
            self.db.ts[:n].copy(),
            self.db.opt_t[:n].copy(),
            self.db.cov[:n].copy(),
        )
