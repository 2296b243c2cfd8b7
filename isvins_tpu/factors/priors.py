"""Sparse nonlinear prior (pseudo-measurement) factors — the heart of the IS
scheme. Residual + minimal Jacobians + post-solve `update()` semantics for:

- relative pose      (relative_pose_factor.h) — workhorse of the sparsified
  VIO prior and of the pose graph
- SE3 absolute prior (se3_prior_factor.h)
- speed/bias prior   (linear9_factor.h)
- roll-pitch gravity (rollpitch_factor.h)
- yaw                (yaw_factor.h) — built only for information accounting
  during backward sparsification, never optimized (gauge direction dropped)

All unweighted; sqrt-info matrices live with the estimator's prior state. The
`*_update` functions implement the nonlinear pseudo-measurement shift applied
after every solve (e.g. relative_pose_factor.h:103–124): the measurement is
dragged along with the post-solve state delta so the factor stays consistent
with the moving linearization point.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geom import (
    quat_conj,
    quat_log,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_mat,
    right_jacobian_inv_so3,
    skew,
    so3_exp_quat,
)


# ---------------------------------------------------------------- relative pose
def relpose_residual(delta_t, delta_q, Pi, Qi, Pj, Qj):
    """(6,) residual [delta_t - Ri^T (Pj - Pi); Log(delta_R Rj^T Ri)]
    (relative_pose_factor.h:39–42). delta_q is the measured q_ij (i <- j sense
    matching the reference's delta_R)."""
    res_t = delta_t - quat_rotate(quat_conj(Qi), Pj - Pi)
    res_q = quat_log(quat_mul(delta_q, quat_mul(quat_conj(Qj), Qi)))
    return jnp.concatenate([res_t, res_q])


def relpose_residual_jacobians(delta_t, delta_q, Pi, Qi, Pj, Qj):
    """Residual + (6,6) Jacobians wrt pose_i, pose_j
    (relative_pose_factor.h:46–66)."""
    dtype = Pi.dtype
    res_t = delta_t - quat_rotate(quat_conj(Qi), Pj - Pi)
    phi = quat_log(quat_mul(delta_q, quat_mul(quat_conj(Qj), Qi)))
    r = jnp.concatenate([res_t, phi])

    Ri = quat_to_mat(Qi)
    Rj = quat_to_mat(Qj)
    Jinv = right_jacobian_inv_so3(phi)

    Z = jnp.zeros((3, 3), dtype)
    J_i = jnp.block([[Ri.T, -skew(quat_rotate(quat_conj(Qi), Pj - Pi))], [Z, Jinv]])
    J_j = jnp.block([[-Ri.T, Z], [Z, -Jinv @ Ri.T @ Rj]])
    return r, J_i, J_j


def relpose_update(delta_t, delta_q, ti, Ri_q, tj, Rj_q, Pi_new, Qi_new, Pj_new, Qj_new):
    """Pseudo-measurement shift after a solve (relative_pose_factor.h:103–117
    semantics): re-anchor (delta_t, delta_q) from the old states (ti, Ri_q),
    (tj, Rj_q) to the post-solve states so the residual value is preserved.

    Deviation from the reference: we use the *exact* closed-form drag
    (residual-preserving for any shift size) instead of the reference's
    first-order expression, whose d_R terms carry an inverted sign (its
    rollpitch analogue doubles the state delta rather than cancelling it —
    an apparent sign slip in the research code; the intent, preserving the
    pseudo-measurement residual across relinearization, is unambiguous)."""
    # current residual at the old states
    r_t = delta_t - quat_rotate(quat_conj(Ri_q), tj - ti)
    r_q = quat_mul(delta_q, quat_mul(quat_conj(Rj_q), Ri_q))
    # measurement that reproduces the same residual at the new states
    delta_t_new = r_t + quat_rotate(quat_conj(Qi_new), Pj_new - Pi_new)
    delta_q_new = quat_normalize(quat_mul(r_q, quat_mul(quat_conj(Qi_new), Qj_new)))
    return delta_t_new, delta_q_new


def relpose_update_anchor(delta_t, delta_q, ti, Ri_q, tj, Rj_q, Pj_new, Qj_new):
    """Variant updating only the j side (relative_pose_factor.h:119–124),
    used when retro-updating a pose-graph edge against an optimized anchor:
    frame i stays at (ti, Ri_q); frame j moves to (Pj_new, Qj_new)."""
    return relpose_update(delta_t, delta_q, ti, Ri_q, tj, Rj_q, ti, Ri_q, Pj_new, Qj_new)


# ---------------------------------------------------------------- SE3 prior
def se3_prior_residual(t_meas, q_meas, Pi, Qi):
    """(6,) [Pi - t; Log(R_meas^{-1} Ri)] (se3_prior_factor.h:26–33; note the
    reference stacks translation rows first after the block writes)."""
    res_r = quat_log(quat_mul(quat_conj(q_meas), Qi))
    return jnp.concatenate([Pi - t_meas, res_r])


def se3_prior_residual_jacobians(t_meas, q_meas, Pi, Qi):
    dtype = Pi.dtype
    phi = quat_log(quat_mul(quat_conj(q_meas), Qi))
    r = jnp.concatenate([Pi - t_meas, phi])
    Z = jnp.zeros((3, 3), dtype)
    J = jnp.block([[jnp.eye(3, dtype=dtype), Z], [Z, right_jacobian_inv_so3(phi)]])
    return r, J


def se3_prior_update(t_meas, q_meas, Pi_old, Qi_old, Pi_new, Qi_new):
    """se3_prior_factor.h:73–81 semantics (exact residual-preserving drag —
    see relpose_update docstring for the deviation rationale)."""
    r_t = Pi_old - t_meas
    r_q = quat_mul(quat_conj(q_meas), Qi_old)  # Exp(r_phi)
    t_new = Pi_new - r_t
    q_new = quat_normalize(quat_mul(Qi_new, quat_conj(r_q)))
    return t_new, q_new


# ---------------------------------------------------------------- speed/bias
def linear9_residual_jacobians(vb_meas, V, Ba, Bg):
    """(9,) residual [V;Ba;Bg] - meas, identity Jacobian (linear9_factor.h)."""
    r = jnp.concatenate([V, Ba, Bg]) - vb_meas
    return r, jnp.eye(9, dtype=V.dtype)


# ---------------------------------------------------------------- roll-pitch
def rollpitch_residual(q_meas, Qi):
    """(2,) first two rows of R_meas Ri^T (-e_z) (rollpitch_factor.h:33–37)."""
    nZ = jnp.array([0.0, 0.0, -1.0], dtype=Qi.dtype)
    res = quat_rotate(q_meas, quat_rotate(quat_conj(Qi), nZ))
    return res[:2]


def rollpitch_residual_jacobians(q_meas, Qi):
    dtype = Qi.dtype
    nZ = jnp.array([0.0, 0.0, -1.0], dtype=dtype)
    res3 = quat_rotate(q_meas, quat_rotate(quat_conj(Qi), nZ))
    r = res3[:2]
    J_rot = skew(res3) @ quat_to_mat(q_meas)  # (3,3), wrt right-perturbed Qi
    J = jnp.concatenate([jnp.zeros((2, 3), dtype), J_rot[:2, :]], axis=1)  # (2,6)
    return r, J


def rollpitch_update(q_meas, Qi_old, Qi_new):
    """rollpitch_factor.h:78–83 semantics (exact drag: R' = R_meas · (Ri_old^{-1}
    Ri_new) preserves all three components of R_meas Ri^{-1} nZ; the
    reference's sign doubles the delta instead)."""
    d = quat_mul(quat_conj(Qi_old), Qi_new)
    return quat_normalize(quat_mul(q_meas, d))


# ---------------------------------------------------------------- yaw
def yaw_residual_jacobians(q_meas, Qi):
    """(1,) y-component of Ri (R_meas^{-1} e_x) (yaw_factor.h:24–49). Used only
    to account for the yaw information row during backward sparsification."""
    dtype = Qi.dtype
    ex = jnp.array([1.0, 0.0, 0.0], dtype=dtype)
    yaw_meas = quat_rotate(quat_conj(q_meas), ex)
    res3 = quat_rotate(Qi, yaw_meas)
    r = res3[1:2]
    J_rot = -quat_to_mat(Qi) @ skew(yaw_meas)
    J = jnp.concatenate([jnp.zeros((1, 3), dtype), J_rot[1:2, :]], axis=1)  # (1,6)
    return r, J


# -------------------------------------------------- numpy host-path twins
# (geom/hostmath rationale: the drags run per frame on the host state
# machine; each jitted call is a device dispatch)
def relpose_update_np(delta_t, delta_q, ti, Ri_q, tj, Rj_q,
                      Pi_new, Qi_new, Pj_new, Qj_new):
    import numpy as np
    from ..geom.hostmath import (quat_conj_np, quat_mul_np, quat_normalize_np,
                                 quat_to_mat_np)
    Ri = quat_to_mat_np(Ri_q)
    r_t = np.asarray(delta_t) - Ri.T @ (np.asarray(tj) - np.asarray(ti))
    r_q = quat_mul_np(delta_q, quat_mul_np(quat_conj_np(np.asarray(Rj_q)), Ri_q))
    Qi_new = np.asarray(Qi_new)
    delta_t_new = r_t + quat_to_mat_np(Qi_new).T @ (np.asarray(Pj_new) - np.asarray(Pi_new))
    delta_q_new = quat_normalize_np(
        quat_mul_np(r_q, quat_mul_np(quat_conj_np(Qi_new), np.asarray(Qj_new)))
    )
    return delta_t_new, delta_q_new


def relpose_update_anchor_np(delta_t, delta_q, ti, Ri_q, tj, Rj_q, Pj_new, Qj_new):
    return relpose_update_np(delta_t, delta_q, ti, Ri_q, tj, Rj_q,
                             ti, Ri_q, Pj_new, Qj_new)


def se3_prior_update_np(t_meas, q_meas, Pi_old, Qi_old, Pi_new, Qi_new):
    import numpy as np
    from ..geom.hostmath import quat_conj_np, quat_mul_np, quat_normalize_np
    r_t = np.asarray(Pi_old) - np.asarray(t_meas)
    r_q = quat_mul_np(quat_conj_np(np.asarray(q_meas)), np.asarray(Qi_old))
    t_new = np.asarray(Pi_new) - r_t
    q_new = quat_normalize_np(quat_mul_np(np.asarray(Qi_new), quat_conj_np(r_q)))
    return t_new, q_new


def rollpitch_update_np(q_meas, Qi_old, Qi_new):
    import numpy as np
    from ..geom.hostmath import quat_conj_np, quat_mul_np, quat_normalize_np
    d = quat_mul_np(quat_conj_np(np.asarray(Qi_old)), np.asarray(Qi_new))
    return quat_normalize_np(quat_mul_np(np.asarray(q_meas), d))
