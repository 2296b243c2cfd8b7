"""Preintegration vs brute-force integration on synthetic IMU (SURVEY.md §4
implication (b)), plus residual-Jacobian validation vs autodiff."""

import numpy as np
import jax.numpy as jnp

import isvins_tpu  # noqa: F401
from isvins_tpu.config import euroc_config
from isvins_tpu.factors import ImuNoise, integrate_segment, imu_residual, imu_residual_jacobians
from isvins_tpu.factors.preintegration import sqrt_info_from_cov
from isvins_tpu.geom import quat_mul, quat_normalize, so3_exp_quat, quat_rotate

from conftest import random_quat
from test_factors import retract_pose, num_jac

G = np.array([0.0, 0.0, 9.81007])


def simulate_imu(T=1.0, hz=200, seed=0):
    """Ground-truth trajectory with sinusoidal body rates and accelerations;
    returns per-sample (t, acc_body, gyr_body) plus GT states at both ends."""
    rng = np.random.default_rng(seed)
    n = int(T * hz) + 1
    ts = np.linspace(0, T, n)
    dt = ts[1] - ts[0]

    # integrate GT with very fine steps
    q = np.array([1.0, 0, 0, 0])
    p = np.zeros(3)
    v = np.array([0.3, -0.2, 0.1])
    gyr_f = lambda t: np.array([0.4 * np.sin(2 * t), 0.3 * np.cos(3 * t), -0.2 * np.sin(t)])
    acc_w_f = lambda t: np.array([0.5 * np.sin(t), -0.4 * np.cos(2 * t), 0.2 * np.sin(3 * t)])

    states = [(p.copy(), q.copy(), v.copy())]
    accs, gyrs = [], []
    sub = 20  # substeps per sample for GT
    for i in range(n):
        t = ts[i]
        # body-frame measurements at sample time (no noise, no bias)
        R = np.asarray(isvins_tpu.geom.quat_to_mat(jnp.asarray(q)))
        accs.append(R.T @ (acc_w_f(t) + G))
        gyrs.append(gyr_f(t))
        if i < n - 1:
            h = dt / sub
            for k in range(sub):
                tk = t + k * h
                Rk = np.asarray(isvins_tpu.geom.quat_to_mat(jnp.asarray(q)))
                a_w = acc_w_f(tk)
                p = p + v * h + 0.5 * a_w * h * h
                v = v + a_w * h
                q = np.asarray(
                    quat_normalize(quat_mul(jnp.asarray(q), so3_exp_quat(jnp.asarray(gyr_f(tk) * h))))
                )
            states.append((p.copy(), q.copy(), v.copy()))
    return ts, np.array(accs), np.array(gyrs), states


def test_preintegration_consistency():
    """Residual at ground-truth states must be ~0 for noiseless IMU."""
    cfg = euroc_config()
    ts, accs, gyrs, states = simulate_imu(T=0.5, hz=200)
    n = len(ts)
    dts = np.diff(ts)
    M = 128  # capacity > n-1
    dts_p = np.zeros(M)
    accs_p = np.zeros((M, 3))
    gyrs_p = np.zeros((M, 3))
    dts_p[: n - 1] = dts
    accs_p[: n - 1] = accs[1:]
    gyrs_p[: n - 1] = gyrs[1:]

    noise = ImuNoise.from_config(cfg.noise)
    pre = integrate_segment(
        jnp.asarray(dts_p), jnp.asarray(accs_p), jnp.asarray(gyrs_p),
        jnp.asarray(accs[0]), jnp.asarray(gyrs[0]),
        jnp.zeros(3), jnp.zeros(3), noise,
    )
    p0, q0, v0 = states[0]
    p1, q1, v1 = states[-1]
    r = imu_residual(
        pre, jnp.asarray(G),
        jnp.asarray(p0), jnp.asarray(q0), jnp.asarray(v0), jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(p1), jnp.asarray(q1), jnp.asarray(v1), jnp.zeros(3), jnp.zeros(3),
    )
    assert float(jnp.max(jnp.abs(r))) < 2e-4, np.asarray(r)
    # covariance: PSD, grows with time, invertible
    cov = np.asarray(pre.cov)
    w = np.linalg.eigvalsh(cov)
    assert w.min() > 0
    # whitening consistency: S cov S^T = I (the property the solver relies on;
    # S^T S cov ~ I only to ~cond(cov)*eps, cov is very ill-conditioned)
    S = np.asarray(sqrt_info_from_cov(pre.cov))
    np.testing.assert_allclose(S @ cov @ S.T, np.eye(15), atol=1e-9)


def test_bias_jacobian_vs_reintegration():
    """First-order bias correction must match re-integration at shifted bias."""
    cfg = euroc_config()
    ts, accs, gyrs, _ = simulate_imu(T=0.3, hz=200, seed=3)
    n = len(ts)
    M = 128
    dts_p = np.zeros(M); accs_p = np.zeros((M, 3)); gyrs_p = np.zeros((M, 3))
    dts_p[: n - 1] = np.diff(ts); accs_p[: n - 1] = accs[1:]; gyrs_p[: n - 1] = gyrs[1:]
    noise = ImuNoise.from_config(cfg.noise)
    args = (jnp.asarray(dts_p), jnp.asarray(accs_p), jnp.asarray(gyrs_p),
            jnp.asarray(accs[0]), jnp.asarray(gyrs[0]))

    pre0 = integrate_segment(*args, jnp.zeros(3), jnp.zeros(3), noise)
    dba = np.array([3e-3, -2e-3, 1e-3])
    dbg = np.array([-1e-3, 2e-3, 3e-3])
    pre1 = integrate_segment(*args, jnp.asarray(dba), jnp.asarray(dbg), noise)

    from isvins_tpu.factors.preintegration import bias_corrected_delta
    dp, dq, dv = bias_corrected_delta(pre0, jnp.asarray(dba), jnp.asarray(dbg))
    np.testing.assert_allclose(np.asarray(dp), np.asarray(pre1.delta_p), atol=5e-6)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(pre1.delta_v), atol=5e-6)
    assert abs(float(jnp.abs(jnp.sum(dq * pre1.delta_q))) - 1.0) < 1e-8


def test_imu_residual_jacobians(rng):
    cfg = euroc_config()
    ts, accs, gyrs, _ = simulate_imu(T=0.2, hz=200, seed=7)
    n = len(ts)
    M = 64
    dts_p = np.zeros(M); accs_p = np.zeros((M, 3)); gyrs_p = np.zeros((M, 3))
    dts_p[: n - 1] = np.diff(ts); accs_p[: n - 1] = accs[1:]; gyrs_p[: n - 1] = gyrs[1:]
    noise = ImuNoise.from_config(cfg.noise)
    ba = jnp.asarray([0.01, -0.02, 0.005]); bg = jnp.asarray([0.002, 0.001, -0.003])
    pre = integrate_segment(jnp.asarray(dts_p), jnp.asarray(accs_p), jnp.asarray(gyrs_p),
                            jnp.asarray(accs[0]), jnp.asarray(gyrs[0]), ba, bg, noise)

    Pi, Qi = jnp.asarray(rng.normal(size=3)), jnp.asarray(random_quat(rng))
    Pj, Qj = jnp.asarray(rng.normal(size=3)), jnp.asarray(random_quat(rng))
    Vi, Vj = jnp.asarray(rng.normal(size=3)), jnp.asarray(rng.normal(size=3))
    Bai, Bgi = ba + 0.01, bg - 0.005
    Baj, Bgj = Bai + 0.001, Bgi + 0.001
    Gj = jnp.asarray(G)

    r, J_pi, J_vbi, J_pj, J_vbj = imu_residual_jacobians(
        pre, Gj, Pi, Qi, Vi, Bai, Bgi, Pj, Qj, Vj, Baj, Bgj
    )

    f = lambda d: imu_residual(pre, Gj, *retract_pose(Pi, Qi, d), Vi, Bai, Bgi, Pj, Qj, Vj, Baj, Bgj)
    np.testing.assert_allclose(np.asarray(J_pi), num_jac(f, 6), atol=2e-5)
    f = lambda d: imu_residual(pre, Gj, Pi, Qi, Vi + d[:3], Bai + d[3:6], Bgi + d[6:9],
                               Pj, Qj, Vj, Baj, Bgj)
    np.testing.assert_allclose(np.asarray(J_vbi), num_jac(f, 9), atol=2e-5)
    f = lambda d: imu_residual(pre, Gj, Pi, Qi, Vi, Bai, Bgi, *retract_pose(Pj, Qj, d), Vj, Baj, Bgj)
    np.testing.assert_allclose(np.asarray(J_pj), num_jac(f, 6), atol=2e-5)
    f = lambda d: imu_residual(pre, Gj, Pi, Qi, Vi, Bai, Bgi, Pj, Qj, Vj + d[:3], Baj + d[3:6],
                               Bgj + d[6:9])
    np.testing.assert_allclose(np.asarray(J_vbj), num_jac(f, 9), atol=2e-5)
