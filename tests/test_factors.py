"""Factor residual/Jacobian validation vs autodiff through the retraction
(SURVEY.md §4 implication (a)): every analytic tangent-space Jacobian must
match jax.jacfwd of residual(retract(state, d)) at d=0."""

import numpy as np
import jax
import jax.numpy as jnp

import isvins_tpu  # noqa: F401
from isvins_tpu.geom import quat_mul, quat_normalize, so3_exp_quat, quat_rotate, quat_conj
from isvins_tpu.factors import (
    projection_residual,
    projection_residual_jacobians,
    relpose_residual,
    relpose_residual_jacobians,
    relpose_update,
    rollpitch_residual,
    rollpitch_residual_jacobians,
    rollpitch_update,
    se3_prior_residual,
    se3_prior_residual_jacobians,
    se3_prior_update,
    linear9_residual_jacobians,
    yaw_residual_jacobians,
)

from conftest import random_quat


def retract_pose(P, Q, d):
    """Reference manifold plus (pose_local_parameterization.cpp): p + dp,
    q * Exp(dtheta)."""
    return P + d[:3], quat_normalize(quat_mul(Q, so3_exp_quat(d[3:])))


def num_jac(f, dim, eps=1e-7):
    """Central-difference Jacobian of f: R^dim -> R^m at 0."""
    cols = []
    for i in range(dim):
        d = np.zeros(dim)
        d[i] = eps
        cols.append((np.asarray(f(jnp.asarray(d))) - np.asarray(f(jnp.asarray(-d)))) / (2 * eps))
    return np.stack(cols, axis=-1)


def test_relpose_jacobians(rng):
    Pi, Qi = jnp.asarray(rng.normal(size=3)), jnp.asarray(random_quat(rng))
    Pj, Qj = jnp.asarray(rng.normal(size=3)), jnp.asarray(random_quat(rng))
    dt_m = jnp.asarray(rng.normal(size=3))
    dq_m = jnp.asarray(random_quat(rng))
    r, Ji, Jj = relpose_residual_jacobians(dt_m, dq_m, Pi, Qi, Pj, Qj)

    Ji_num = num_jac(lambda d: relpose_residual(dt_m, dq_m, *retract_pose(Pi, Qi, d), Pj, Qj), 6)
    Jj_num = num_jac(lambda d: relpose_residual(dt_m, dq_m, Pi, Qi, *retract_pose(Pj, Qj, d)), 6)
    np.testing.assert_allclose(np.asarray(Ji), Ji_num, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Jj), Jj_num, atol=1e-6)


def test_relpose_update_keeps_residual(rng):
    """After update(), the residual evaluated at the new states matches the
    old residual to first order — the pseudo-measurement semantics."""
    Pi, Qi = jnp.asarray(rng.normal(size=3)), jnp.asarray(random_quat(rng))
    Pj, Qj = jnp.asarray(rng.normal(size=3)), jnp.asarray(random_quat(rng))
    # a perfect measurement at the old states
    dt_m = quat_rotate(quat_conj(Qi), Pj - Pi)
    dq_m = quat_normalize(quat_mul(quat_conj(Qj), Qi))
    dq_m = quat_conj(dq_m)  # delta_R = measured Ri->Rj relation: Log(dR Rj^T Ri)=0
    r0 = relpose_residual(dt_m, dq_m, Pi, Qi, Pj, Qj)
    np.testing.assert_allclose(np.asarray(r0), 0.0, atol=1e-12)

    # shift both states by a solve delta — drag is exact, any size works
    di = rng.normal(size=6) * 0.1
    dj = rng.normal(size=6) * 0.1
    Pi2, Qi2 = retract_pose(Pi, Qi, jnp.asarray(di))
    Pj2, Qj2 = retract_pose(Pj, Qj, jnp.asarray(dj))
    dt2, dq2 = relpose_update(dt_m, dq_m, Pi, Qi, Pj, Qj, Pi2, Qi2, Pj2, Qj2)
    r2 = relpose_residual(dt2, dq2, Pi2, Qi2, Pj2, Qj2)
    np.testing.assert_allclose(np.asarray(r2), 0.0, atol=1e-10)
    # and with a non-perfect measurement the residual value is preserved
    dt_m2 = dt_m + 0.05
    r0b = relpose_residual(dt_m2, dq_m, Pi, Qi, Pj, Qj)
    dt3, dq3 = relpose_update(dt_m2, dq_m, Pi, Qi, Pj, Qj, Pi2, Qi2, Pj2, Qj2)
    r3 = relpose_residual(dt3, dq3, Pi2, Qi2, Pj2, Qj2)
    np.testing.assert_allclose(np.asarray(r3), np.asarray(r0b), atol=1e-10)


def test_se3_prior_jacobians(rng):
    Pi, Qi = jnp.asarray(rng.normal(size=3)), jnp.asarray(random_quat(rng))
    t_m, q_m = jnp.asarray(rng.normal(size=3)), jnp.asarray(random_quat(rng))
    r, J = se3_prior_residual_jacobians(t_m, q_m, Pi, Qi)
    J_num = num_jac(lambda d: se3_prior_residual(t_m, q_m, *retract_pose(Pi, Qi, d)), 6)
    np.testing.assert_allclose(np.asarray(J), J_num, atol=1e-6)

    # update semantics: drag anchor with state, residual invariant (exact)
    d = jnp.asarray(rng.normal(size=6) * 0.1)
    Pi2, Qi2 = retract_pose(Pi, Qi, d)
    t2, q2 = se3_prior_update(t_m, q_m, Pi, Qi, Pi2, Qi2)
    r2 = se3_prior_residual(t2, q2, Pi2, Qi2)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r), atol=1e-10)


def test_rollpitch_jacobians(rng):
    Qi = jnp.asarray(random_quat(rng))
    q_m = jnp.asarray(random_quat(rng))
    r, J = rollpitch_residual_jacobians(q_m, Qi)
    J_num = num_jac(
        lambda d: rollpitch_residual(q_m, retract_pose(jnp.zeros(3), Qi, d)[1]), 6
    )
    np.testing.assert_allclose(np.asarray(J), J_num, atol=1e-6)

    d = jnp.asarray(rng.normal(size=6) * 0.1)
    Qi2 = retract_pose(jnp.zeros(3), Qi, d)[1]
    q2 = rollpitch_update(q_m, Qi, Qi2)
    r2 = rollpitch_residual(q2, Qi2)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r), atol=1e-10)


def test_yaw_jacobians(rng):
    Qi = jnp.asarray(random_quat(rng))
    q_m = jnp.asarray(random_quat(rng))
    r, J = yaw_residual_jacobians(q_m, Qi)
    ex = jnp.array([1.0, 0.0, 0.0])
    yaw_meas = quat_rotate(quat_conj(q_m), ex)

    def f(d):
        Qi2 = retract_pose(jnp.zeros(3), Qi, d)[1]
        return quat_rotate(Qi2, yaw_meas)[1:2]

    J_num = num_jac(f, 6)
    np.testing.assert_allclose(np.asarray(J), J_num, atol=1e-6)


def test_linear9(rng):
    V, Ba, Bg = [jnp.asarray(rng.normal(size=3)) for _ in range(3)]
    meas = jnp.asarray(rng.normal(size=9))
    r, J = linear9_residual_jacobians(meas, V, Ba, Bg)
    np.testing.assert_allclose(np.asarray(r), np.concatenate([V, Ba, Bg]) - np.asarray(meas))
    np.testing.assert_allclose(np.asarray(J), np.eye(9))


def test_projection_jacobians(rng):
    Pi, Qi = jnp.asarray(rng.normal(size=3) * 0.5), jnp.asarray(random_quat(rng))
    Pj, Qj = jnp.asarray(rng.normal(size=3) * 0.5), jnp.asarray(random_quat(rng))
    tic = jnp.asarray(rng.normal(size=3) * 0.05)
    qic = jnp.asarray(random_quat(rng))
    # construct a consistent observation: a world point in front of both cams
    X = jnp.asarray(rng.normal(size=3) + np.array([0.0, 0.0, 8.0]))
    def cam_pt(P, Q):
        pi = quat_rotate(quat_conj(Q), X - P)
        return quat_rotate(quat_conj(qic), pi - tic)
    ci, cj = cam_pt(Pi, Qi), cam_pt(Pj, Qj)
    pts_i = ci / ci[2]
    pts_j = cj / cj[2]
    inv_dep = 1.0 / ci[2]

    r, J_pi, J_pj, J_ex, J_dep = projection_residual_jacobians(
        pts_i, pts_j, Pi, Qi, Pj, Qj, tic, qic, inv_dep
    )
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-10)

    f = lambda d: projection_residual(pts_i, pts_j, *retract_pose(Pi, Qi, d), Pj, Qj, tic, qic, inv_dep)
    np.testing.assert_allclose(np.asarray(J_pi), num_jac(f, 6), atol=1e-6)
    f = lambda d: projection_residual(pts_i, pts_j, Pi, Qi, *retract_pose(Pj, Qj, d), tic, qic, inv_dep)
    np.testing.assert_allclose(np.asarray(J_pj), num_jac(f, 6), atol=1e-6)
    f = lambda d: projection_residual(pts_i, pts_j, Pi, Qi, Pj, Qj, *retract_pose(tic, qic, d), inv_dep)
    np.testing.assert_allclose(np.asarray(J_ex), num_jac(f, 6), atol=1e-6)
    f = lambda d: projection_residual(pts_i, pts_j, Pi, Qi, Pj, Qj, tic, qic, inv_dep + d[0])
    np.testing.assert_allclose(np.asarray(J_dep), num_jac(f, 1)[:, 0], atol=1e-6)


def test_projection_vmap(rng):
    n = 32
    Pi = jnp.asarray(rng.normal(size=(n, 3)))
    Qi = jnp.asarray(random_quat(rng, n))
    pts = jnp.concatenate([jnp.asarray(rng.normal(size=(n, 2)) * 0.3), jnp.ones((n, 1))], axis=1)
    out = jax.vmap(
        lambda pi, qi, pt: projection_residual(
            pt, pt, pi, qi, pi + 1.0, qi, jnp.zeros(3), jnp.array([1.0, 0, 0, 0]), 0.2
        )
    )(Pi, Qi, pts)
    assert out.shape == (n, 2)
