"""Perspective-n-Point via damped Gauss-Newton on SE(3), batched-friendly.

Replaces cv::solvePnP(iterative, useExtrinsicGuess) used by the SfM chain
(estimator.cpp:333) and initial_sfm.cpp:73, and cv::solvePnPRansac used by
loop verification (keyframe.cpp:201). The GN variant needs an initial guess
(always available in both call sites: the neighboring frame / the old
keyframe pose); the RANSAC variant wraps it with minimal-subset restarts and
inlier refit for robustness to outliers.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..geom import quat_mul, quat_normalize, quat_rotate, quat_conj, so3_exp_quat, skew, quat_to_mat


@jax.jit
def _pnp_gn_core(pts3d, pts2d, w, q_cw, t_cw, iters: int = 10):
    """Minimize sum w_i |proj(R_cw X_i + t_cw) - uv_i|^2 over (q_cw, t_cw)
    (world-to-camera). Damped GN, fixed iterations, branchless."""

    def residual_jac(q, t):
        def one(X, uv):
            pc = quat_rotate(q, X) + t
            z = jnp.where(jnp.abs(pc[2]) > 1e-6, pc[2], 1e-6)
            r = pc[:2] / z - uv
            # d(proj)/d(pc)
            red = jnp.array(
                [[1.0 / z, 0.0, -pc[0] / (z * z)], [0.0, 1.0 / z, -pc[1] / (z * z)]],
                pc.dtype,
            )
            # pc = R X + t; right-perturbation on R: d(pc)/dtheta = -R [X]x
            J_t = red
            J_r = red @ (quat_to_mat(q) @ (-skew(X)))
            return r, jnp.concatenate([J_t, J_r], axis=1)  # (2,), (2,6)

        r, J = jax.vmap(one)(pts3d, pts2d)
        return r * w[:, None], J * w[:, None, None]

    def body(_, carry):
        q, t = carry
        r, J = residual_jac(q, t)
        Jf = J.reshape(-1, 6)
        rf = r.reshape(-1)
        H = Jf.T @ Jf + 1e-8 * jnp.eye(6, dtype=Jf.dtype)
        g = -(Jf.T @ rf)
        # Cholesky instead of LU: H is SPD, and TPU XLA has no f64 LU
        # expander ("Only F32 and C64 types are implemented in LuDecomposition")
        dx = jax.scipy.linalg.cho_solve((jnp.linalg.cholesky(H), True), g)
        t_new = t + dx[:3]
        q_new = quat_normalize(quat_mul(q, so3_exp_quat(dx[3:])))
        return q_new, t_new

    q, t = jax.lax.fori_loop(0, iters, body, (q_cw, t_cw))
    r, _ = residual_jac(q, t)
    return q, t, jnp.sum(r * r, axis=-1)


def pnp_gn(pts3d, pts2d, q_cw0, t_cw0, weights=None, iters: int = 10):
    """pts3d (n,3) world, pts2d (n,2) normalized-plane. Initial guess
    (q_cw0, t_cw0) world-to-camera. Returns (q_cw, t_cw, per-point sq err)."""
    pts3d = jnp.asarray(pts3d)
    pts2d = jnp.asarray(pts2d)
    n = pts3d.shape[0]
    w = jnp.ones(n, pts3d.dtype) if weights is None else jnp.asarray(weights)
    return _pnp_gn_core(pts3d, pts2d, w, jnp.asarray(q_cw0), jnp.asarray(t_cw0), iters)


def pnp_ransac_gn(
    pts3d,
    pts2d,
    q_cw0,
    t_cw0,
    thresh: float = 10.0 / 460.0,
    n_rounds: int = 32,
    min_set: int = 6,
    iters: int = 10,
    seed: int = 0,
):
    """Robust PnP: GN restarts from the initial guess on random minimal
    subsets, score by inlier count, refit on the best inlier set.
    Returns (ok, q_cw, t_cw, inlier_mask)."""
    pts3d = np.asarray(pts3d)
    pts2d = np.asarray(pts2d)[:, :2]
    n = len(pts3d)
    if n < min_set:
        return False, np.asarray(q_cw0), np.asarray(t_cw0), np.zeros(n, bool)
    rng = np.random.default_rng(seed)
    t2 = thresh * thresh

    best_inl = None
    best_cnt = -1
    for r_i in range(n_rounds):
        if r_i == 0:
            w = np.ones(n)
        else:
            w = np.zeros(n)
            w[rng.choice(n, size=min(min_set, n), replace=False)] = 1.0
        q, t, errs = pnp_gn(pts3d, pts2d, q_cw0, t_cw0, weights=w, iters=iters)
        errs_all = np.asarray(
            pnp_gn(pts3d, pts2d, q, t, weights=np.ones(n), iters=0)[2]
        )
        inl = errs_all < t2
        if inl.sum() > best_cnt:
            best_cnt = int(inl.sum())
            best_inl = inl
    if best_cnt < min_set:
        return False, np.asarray(q_cw0), np.asarray(t_cw0), np.zeros(n, bool)
    q, t, errs = pnp_gn(
        pts3d, pts2d, q_cw0, t_cw0, weights=best_inl.astype(float), iters=iters
    )
    errs_all = np.asarray(pnp_gn(pts3d, pts2d, q, t, weights=np.ones(n), iters=0)[2])
    inl = errs_all < t2
    return True, np.asarray(q), np.asarray(t), inl
