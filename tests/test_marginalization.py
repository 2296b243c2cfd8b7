"""Two-stage marginalization + sparsification consistency (SURVEY.md §4 (d):
the KLD the reference computes-and-discards becomes an assertion here)."""

import numpy as np
import jax
import jax.numpy as jnp

import isvins_tpu  # noqa: F401
from isvins_tpu.config import euroc_config
from isvins_tpu.estimator import init_sparsify, marg_backward, marg_forward
from isvins_tpu.solver import WindowDims

from test_solver import build_problem, anchored_priors


def setup():
    cfg, world, gt, imu_f, proj_f, dims, nf = build_problem(B=10, seed=2)
    G = jnp.asarray(world.gravity)
    return cfg, world, gt, imu_f, proj_f, dims, G


def test_init_sparsify_consistency():
    cfg, world, gt, imu_f, proj_f, dims, G = setup()
    Vo = 4
    pre_vo = jax.tree_util.tree_map(lambda a: a[: Vo - 1], imu_f.pre)
    priors, kld = init_sparsify(gt, pre_vo, G, Vo, alpha=cfg.solver.alpha)

    # The closed-form recovery (info_i = inv(J_i Sigma J_i^T)) is exact per
    # factor but overcounts jointly (the reference's dead-code factor_descent
    # is the iterative fix) — KLD is O(10) nats over 33 dims by design.
    assert np.isfinite(float(kld)), float(kld)
    # golden: 83.2 nats on this fixed problem (joint KLD of the
    # closed-form sparsified recovery; per-factor marginals are exact,
    # asserted below) — ~2x headroom so a regression that doubles the
    # information loss fails loudly
    assert float(kld) < 170.0, float(kld)
    # all recovered sqrt-infos finite; edges 1..Vo-1 valid
    assert bool(jnp.all(jnp.isfinite(priors.rel_sqrt)))
    assert bool(jnp.all(jnp.isfinite(priors.se3_sqrt)))
    assert bool(jnp.all(jnp.isfinite(priors.vb_sqrt)))
    assert np.array_equal(np.asarray(priors.rel_valid), [False, True, True, True])
    # measurements consistent: residuals at current state are zero
    from isvins_tpu.factors import relpose_residual, se3_prior_residual
    r = relpose_residual(priors.rel_dt[1], priors.rel_dq[1], gt.P[0], gt.Q[0], gt.P[1], gt.Q[1])
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-10)
    r = se3_prior_residual(priors.se3_t, priors.se3_q, gt.P[0], gt.Q[0])
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)
    # info matrices PSD
    for k in range(1, 4):
        info = np.asarray(priors.rel_sqrt[k].T @ priors.rel_sqrt[k])
        w = np.linalg.eigvalsh(info)
        assert w.min() > -1e-6

    # per-factor marginal exactness: info_i (J_i Sigma_trunc J_i^T) = I
    from isvins_tpu.estimator.marginalization import (
        _accum, _hessian_blocks, _schur_keep_head,
    )
    from isvins_tpu.factors.preintegration import imu_residual_jacobians, sqrt_info_from_cov
    from isvins_tpu.factors.priors import relpose_residual_jacobians
    Vo = 4
    asize = 6 * Vo + 9
    state = gt

    def vb_off(i):
        return asize + 9 * i if i < Vo - 1 else 6 * Vo

    Lam = jnp.zeros((15 * Vo, 15 * Vo))
    S = sqrt_info_from_cov(imu_f.pre.cov[: Vo - 1], rel_jitter=1e-12)
    for k in range(Vo - 1):
        pre_k = jax.tree_util.tree_map(lambda a: a[k], imu_f.pre)
        _, J_pi, J_vbi, J_pj, J_vbj = imu_residual_jacobians(
            pre_k, G, state.P[k], state.Q[k], state.V[k], state.Ba[k], state.Bg[k],
            state.P[k + 1], state.Q[k + 1], state.V[k + 1], state.Ba[k + 1], state.Bg[k + 1],
        )
        W = S[k].T @ S[k]
        Lam = _accum(Lam, _hessian_blocks(
            [(6 * k, J_pi), (vb_off(k), J_vbi), (6 * (k + 1), J_pj), (vb_off(k + 1), J_vbj)], W
        ))
    Lp = np.asarray(_schur_keep_head(Lam, asize))
    w, V = np.linalg.eigh(Lp)
    keep = w > cfg.solver.alpha
    cov_trunc = V[:, keep] @ np.diag(1 / w[keep]) @ V[:, keep].T
    for k in range(1, Vo):
        i = k - 1
        _, Ji, Jj = relpose_residual_jacobians(
            priors.rel_dt[k], priors.rel_dq[k],
            state.P[i], state.Q[i], state.P[k], state.Q[k],
        )
        Jrow = np.zeros((6, asize))
        Jrow[:, 6 * i : 6 * i + 6] = np.asarray(Ji)
        Jrow[:, 6 * k : 6 * k + 6] = np.asarray(Jj)
        info = np.asarray(priors.rel_sqrt[k].T @ priors.rel_sqrt[k])
        np.testing.assert_allclose(
            info @ (Jrow @ cov_trunc @ Jrow.T), np.eye(6), atol=2e-4
        )


def test_marg_forward():
    cfg, world, gt, imu_f, proj_f, dims, G = setup()
    Vo = 4
    pre_vo = jax.tree_util.tree_map(lambda a: a[: Vo - 1], imu_f.pre)
    priors, _ = init_sparsify(gt, pre_vo, G, Vo, alpha=cfg.solver.alpha)

    # landmarks hosted at frame 0 observed at frame 1
    ii = np.asarray(proj_f.idx_i)
    jj = np.asarray(proj_f.idx_j)
    vv = np.asarray(proj_f.valid)
    sel = (ii == 0) & (jj == 1) & vv
    L = 64
    pts_i = np.tile([[0, 0, 1.0]], (L, 1))
    pts_j = np.tile([[0, 0, 1.0]], (L, 1))
    fidx = np.zeros(L, np.int32)
    valid = np.zeros(L, bool)
    n = min(int(sel.sum()), L)
    assert n > 5
    pts_i[:n] = np.asarray(proj_f.pts_i)[sel][:n]
    pts_j[:n] = np.asarray(proj_f.pts_j)[sel][:n]
    fidx[:n] = np.asarray(proj_f.fidx)[sel][:n]
    valid[:n] = True

    t1, q1, sq1, packet, kld = marg_forward(
        gt, priors, jnp.asarray(pts_i), jnp.asarray(pts_j), jnp.asarray(fidx),
        jnp.asarray(valid), jnp.asarray(cfg.noise.pixel_sqrt_info),
        cfg.solver.alpha, world.frame_times[0],
    )
    assert bool(jnp.all(jnp.isfinite(sq1)))
    # golden: 0.0 nats (forward marginalization is exact here); any
    # nonzero joint KLD above 1 nat is a regression
    assert np.isfinite(float(kld)) and float(kld) < 1.0, float(kld)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(gt.P[1]))
    # packet sanity: cov PSD, distance = |rel_dt|
    w = np.linalg.eigvalsh(np.asarray(packet.cov_rel))
    assert w.min() > 0, w
    np.testing.assert_allclose(
        float(packet.distance), np.linalg.norm(np.asarray(packet.rel_dt))
    )
    # the exported edge reproduces the current relative pose
    from isvins_tpu.factors import relpose_residual
    r = relpose_residual(packet.rel_dt, packet.rel_dq, gt.P[0], gt.Q[0], gt.P[1], gt.Q[1])
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-10)


def test_marg_forward_parallax_cap_penalty():
    """The estimator caps marg_forward at L=192 frame-0 observations, keeping
    the top-L by parallax (estimator.py _marginalize; the reference
    marginalizes all, estimator.cpp:1164–1238). Bound the information loss:
    the KLD between the capped and uncapped SE3 priors on pose 1 must stay
    small when the cap keeps the high-parallax factors (they carry the
    constraint mass — a landmark's position information scales with observed
    parallax)."""
    cfg, world, gt, imu_f, proj_f, dims, nf = build_problem(
        B=10, F=4096, N=8192, n_landmarks=3500, seed=5
    )
    G = jnp.asarray(world.gravity)
    Vo = 4
    pre_vo = jax.tree_util.tree_map(lambda a: a[: Vo - 1], imu_f.pre)
    priors, _ = init_sparsify(gt, pre_vo, G, Vo, alpha=cfg.solver.alpha)

    ii = np.asarray(proj_f.idx_i)
    jj = np.asarray(proj_f.idx_j)
    vv = np.asarray(proj_f.valid)
    sel = (ii == 0) & (jj == 1) & vv
    pts_i_all = np.asarray(proj_f.pts_i)[sel]
    pts_j_all = np.asarray(proj_f.pts_j)[sel]
    fidx_all = np.asarray(proj_f.fidx)[sel]
    n_all = len(fidx_all)
    assert n_all > 220, f"need the cap to bind; got {n_all} frame-0 factors"

    def run(pts_i, pts_j, fidx, L):
        pi = np.tile([[0, 0, 1.0]], (L, 1))
        pj = np.tile([[0, 0, 1.0]], (L, 1))
        fi = np.zeros(L, np.int32)
        va = np.zeros(L, bool)
        n = min(len(fidx), L)
        pi[:n], pj[:n], fi[:n], va[:n] = pts_i[:n], pts_j[:n], fidx[:n], True
        t1, q1, sq1, packet, kld = marg_forward(
            gt, priors, jnp.asarray(pi), jnp.asarray(pj), jnp.asarray(fi),
            jnp.asarray(va), jnp.asarray(cfg.noise.pixel_sqrt_info),
            cfg.solver.alpha, world.frame_times[0],
        )
        return np.asarray(sq1)

    # uncapped: every frame-0 factor
    Lfull = 1 << (n_all - 1).bit_length()
    sq_full = run(pts_i_all, pts_j_all, fidx_all, Lfull)

    # capped at 192, top-parallax ranking (the estimator's rule)
    score = np.linalg.norm(pts_i_all[:, :2] - pts_j_all[:, :2], axis=1)
    keep = np.argsort(-score)[:192]
    keep.sort()
    sq_cap = run(pts_i_all[keep], pts_j_all[keep], fidx_all[keep], 192)

    # KLD between the zero-mean SE3 prior Gaussians N(0, info_full^-1) vs
    # N(0, info_cap^-1) (same mean: both anchored at the same pose)
    info_f = sq_full.T @ sq_full
    info_c = sq_cap.T @ sq_cap
    cov_f = np.linalg.inv(info_f + 1e-12 * np.eye(6))
    M = info_c @ cov_f
    kld = 0.5 * (np.trace(M) - 6 - np.log(max(np.linalg.det(M), 1e-300)))
    # the cap must cost only a modest fraction of the prior's information
    assert np.isfinite(kld) and kld < 3.0, kld
    # and the capped prior must never OVERSTATE information (conservative):
    # its total information should not exceed the uncapped prior's
    assert np.trace(info_c) <= np.trace(info_f) * 1.001


def test_marg_backward():
    cfg, world, gt, imu_f, proj_f, dims, G = setup()
    Vo = 4
    pre_vo_chain = jax.tree_util.tree_map(lambda a: a[: Vo - 1], imu_f.pre)
    priors, _ = init_sparsify(gt, pre_vo_chain, G, Vo, alpha=cfg.solver.alpha)

    pre_ij = jax.tree_util.tree_map(lambda a: a[Vo - 1], imu_f.pre)
    dt_m, dq_m, rel_sqrt, vb_m, vb_sqrt, rp_q, rp_sqrt, kld = marg_backward(
        gt, pre_ij, priors, G, Vo, cfg.solver.alpha
    )
    # golden: 27.8 nats on this fixed problem; ~2x headroom
    assert np.isfinite(float(kld)) and float(kld) < 60.0, float(kld)
    for M in (rel_sqrt, vb_sqrt, rp_sqrt):
        assert bool(jnp.all(jnp.isfinite(M)))
        info = np.asarray(M.T @ M)
        assert np.linalg.eigvalsh(info).min() > -1e-6
    # measurement consistent at current state
    from isvins_tpu.factors import relpose_residual
    r = relpose_residual(dt_m, dq_m, gt.P[Vo - 1], gt.Q[Vo - 1], gt.P[Vo], gt.Q[Vo])
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(vb_m), np.concatenate([gt.V[Vo], np.zeros(6)]), atol=1e-12
    )
