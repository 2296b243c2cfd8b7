"""Feature tracker orchestration (replaces FeatureTracker,
src/feature_tracker/feature_tracker_simple.cpp).

Per frame (readImage, :81–151): CLAHE -> pyramidal LK from the previous frame
-> border/err rejection -> epipolar RANSAC outlier rejection on the
normalized plane (rejectWithF, :153–180; the reference's virtual-pinhole
pixel threshold F_THRESHOLD/460 becomes a normalized-plane threshold) ->
min-distance dedup preferring the longest-lived tracks (setMask, :37–69) ->
Shi-Tomasi + NMS refill to max_cnt (:140) -> undistortion + normalized-plane
velocities (:197–244) -> monotonic id assignment (:182–188).

Host object holds fixed-capacity SoA state; all pixel math is jitted device
kernels (one compile per image size).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .camera import make_camera
from .image_ops import clahe, min_dist_mask, nms_topk, shi_tomasi_response
from .lk import pyramidal_lk
from ..initial.five_point import _ransac_core


class FeatureTracker:
    def __init__(self, cam_cfg, tracker_cfg):
        self.cam = make_camera(cam_cfg)
        self.cfg = tracker_cfg
        self.W = cam_cfg.width
        self.H = cam_cfg.height
        M = tracker_cfg.max_cnt
        self.M = M

        self.pts = np.zeros((M, 2))
        self.ids = np.full(M, -1, dtype=np.int64)
        self.track_cnt = np.zeros(M, dtype=np.int32)
        self.valid = np.zeros(M, dtype=bool)
        self.prev_un = np.zeros((M, 3))
        self.prev_img = None
        self.prev_time = None
        self.next_id = 0
        self._ransac_seed = 0

        self._detect = jax.jit(self._detect_impl, static_argnames=("k",))

    def reset(self):
        """Drop all LK state after a stream discontinuity (System.cpp:72–79:
        'image discontinue! reset the feature tracker!'). Track ids keep
        counting up so the estimator never sees a stale id reused."""
        self.pts[:] = 0.0
        self.ids[:] = -1
        self.track_cnt[:] = 0
        self.valid[:] = False
        self.prev_un[:] = 0.0
        self.prev_img = None
        self.prev_time = None

    # ------------------------------------------------------------- pipeline
    def read_image(self, img: np.ndarray, t: float):
        """img: (H,W) uint8/float. Returns dict with ids, normalized points,
        pixel coords, velocities for currently tracked features."""
        imgf = jnp.asarray(img, jnp.float32)
        if self.cfg.equalize:
            imgf = clahe(imgf)

        if self.prev_img is not None and self.valid.any():
            pts1, ok, err = pyramidal_lk(
                self.prev_img, imgf,
                jnp.asarray(self.pts, jnp.float32), jnp.asarray(self.valid),
                levels=self.cfg.lk_levels, half=self.cfg.lk_win // 2,
            )
            pts1 = np.array(pts1)
            ok = np.asarray(ok) & self.valid & self._in_border(pts1)
            if self.cfg.flow_back:
                # forward-backward consistency (VINS-Fusion FLOW_BACK; the
                # fork lacks it): occlusion-boundary corners and slowly
                # drifting tracks fail the round trip long before they fail
                # the epipolar test — measured on the synthetic room, the
                # worst-decile track error vs its own first observation grows
                # to ~8 px within 10 frames without this gate
                pts0b, okb, _ = pyramidal_lk(
                    imgf, self.prev_img,
                    jnp.asarray(pts1, jnp.float32), jnp.asarray(ok),
                    levels=self.cfg.lk_levels, half=self.cfg.lk_win // 2,
                )
                rt = np.linalg.norm(np.array(pts0b) - self.pts, axis=1)
                ok &= np.asarray(okb) & (rt < self.cfg.flow_back_thresh)
            self.pts = pts1
            self.valid = ok
            self.track_cnt = np.where(ok, self.track_cnt + 1, 0)

            # epipolar outlier rejection (rejectWithF)
            self._reject_with_f()

        # min-distance dedup, longest tracks win (setMask)
        self._dedup_min_dist()

        # refill with new detections
        n_cur = int(self.valid.sum())
        if n_cur < self.M:
            self._refill(imgf, self.M - n_cur)

        # undistort + velocities
        un = np.array(self.cam.lift_projective(jnp.asarray(self.pts)))
        vel = np.zeros((self.M, 2))
        if self.prev_time is not None:
            dt = max(t - self.prev_time, 1e-6)
            had_prev = self.valid & (self.track_cnt > 1)
            vel[had_prev] = (un[had_prev, :2] - self.prev_un[had_prev, :2]) / dt
        self.prev_un = un.copy()
        self.prev_img = imgf
        self.prev_time = t

        sel = self.valid
        return {
            "ids": self.ids[sel].copy(),
            "pts_norm": un[sel].copy(),
            "pts_px": self.pts[sel].copy(),
            "vel": vel[sel].copy(),
            "track_cnt": self.track_cnt[sel].copy(),
        }

    # -------------------------------------------------------------- helpers
    def _in_border(self, pts):
        b = self.cfg.border
        return (
            (pts[:, 0] >= b)
            & (pts[:, 0] < self.W - b)
            & (pts[:, 1] >= b)
            & (pts[:, 1] < self.H - b)
        )

    def _reject_with_f(self):
        rows = np.where(self.valid & (self.track_cnt > 1))[0]
        if len(rows) < 15:
            return
        un_prev = self.prev_un[rows, :2]
        un_cur = np.asarray(self.cam.lift_projective(jnp.asarray(self.pts[rows])))[:, :2]
        # pixel threshold -> normalized-plane units via the actual focal
        # (the reference's /460 virtual focal assumed the EuRoC camera)
        thresh = self.cfg.f_threshold / float(self.cam.focal)
        n = len(rows)
        # fresh sample pattern each frame: a fixed seed correlates the
        # rejection across frames (same-sample failure modes recur)
        rng = np.random.default_rng(self._ransac_seed)
        self._ransac_seed += 1
        samples = np.stack([rng.choice(n, size=8, replace=False) for _ in range(128)])
        _, _, inl, n_inl, _ = _ransac_core(
            jnp.asarray(un_prev), jnp.asarray(un_cur), jnp.ones(n, bool),
            jnp.asarray(samples), thresh * thresh,
        )
        inl = np.asarray(inl)
        # degeneracy guard: a (near-)planar view makes the 8-point problem
        # rank-deficient and the "best" model arbitrary — if the winner
        # explains less than half the candidates, do not trust its verdict
        # (cv::findFundamentalMat in the reference degrades the same way;
        # keeping the tracks is strictly safer than a coin-flip cull)
        if int(n_inl) < 0.5 * n:
            return
        kill = rows[~inl]
        self.valid[kill] = False

    def _dedup_min_dist(self):
        """Greedy min-dist keep, longest track first (setMask). Vectorized:
        one pairwise distance matrix, then an O(n) suppression sweep."""
        rows = np.where(self.valid)[0]
        if len(rows) == 0:
            return
        order = rows[np.argsort(-self.track_cnt[rows])]
        P = self.pts[order]
        d2 = ((P[:, None, :] - P[None, :, :]) ** 2).sum(-1)
        r2 = self.cfg.min_dist**2
        n = len(order)
        keep = np.ones(n, bool)
        idx = np.arange(n)
        for i in range(n):
            if keep[i]:
                keep[(d2[i] < r2) & (idx > i)] = False
        self.valid[order[~keep]] = False

    def _detect_impl(self, imgf, pts, valid, k):
        resp = shi_tomasi_response(imgf)
        forbid = min_dist_mask(
            self.H, self.W, pts.astype(jnp.float32), valid, self.cfg.min_dist
        )
        return nms_topk(resp, k, self.cfg.min_dist, border=self.cfg.border + 2,
                        forbid_mask=forbid)

    def _refill(self, imgf, n_new: int):
        cand, vals, ok = self._detect(
            imgf, jnp.asarray(self.pts), jnp.asarray(self.valid), self.M
        )
        cand = np.array(cand)
        vals = np.array(vals)
        # GFTT-style quality floor relative to the strongest response
        # (feature_tracker_simple.cpp:140 uses cv::goodFeaturesToTrack with
        # qualityLevel 0.01); weak texture tracks drift and churn
        ok = np.asarray(ok) & (vals > 0.01 * max(float(vals[0]), 1e-9))
        free = np.where(~self.valid)[0]
        take = min(n_new, int(ok.sum()), len(free))
        sel = np.where(ok)[0][:take]
        rows = free[:take]
        self.pts[rows] = cand[sel]
        self.ids[rows] = np.arange(self.next_id, self.next_id + take)
        self.next_id += take
        self.track_cnt[rows] = 1
        self.valid[rows] = True
