"""Pallas TPU kernel: fused IMU factor evaluation.

Computes the unweighted 15-residual and the four compact Jacobian blocks of
every inter-frame IMU factor (factors/preintegration.py
imu_residual_jacobians, mirroring imu_factor.h:161-265) as ONE VMEM-resident
program. Profiled on v5e, the vmapped XLA evaluation of the 17 window
factors lowers to ~100 small kernels (quaternion algebra, 3x3 products,
block concatenation) whose inter-kernel gaps cost ~100 us per LM iteration
— far more than the arithmetic itself.

Data layout (same scheme as ops/proj_pallas.py): lanes = factors (n of
128), every per-factor scalar component is one (1, 128) plane; input X
stacks the 97 input planes, output Y the 465 result planes (15 residual
rows + the (15, 30) Jacobian block row-major, columns ordered
[pose_i(6) | vb_i(9) | pose_j(6) | vb_j(9)] exactly like the solver's
concatenated Jcat). Whitening (the per-factor 15x15 sqrt-info product)
stays OUTSIDE the kernel as one block-diagonal MXU matmul — it is the only
genuinely matmul-shaped stage, and XLA hoists the loop-invariant
block-diagonal assembly out of the LM while-loop.

The vmapped XLA path (solver/window.py _eval_imu) remains the reference
and the fallback for f64 / non-TPU; equivalence is tested in
tests/test_pallas_ops.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# input plane indices
_PI = 0        # 3
_QI = 3        # 4 (wxyz)
_VI = 7        # 3
_BAI = 10      # 3
_BGI = 13      # 3
_PJ = 16       # 3
_QJ = 19       # 4
_VJ = 23       # 3
_BAJ = 26      # 3
_BGJ = 29      # 3
_DP = 32       # 3  pre.delta_p
_DQ = 35       # 4  pre.delta_q
_DV = 39       # 3  pre.delta_v
_SDT = 42      # 1  pre.sum_dt
_BA0 = 43      # 3  pre.ba
_BG0 = 46      # 3  pre.bg
_JQBG = 49     # 9  pre.jac[3:6,12:15] row-major
_JPBA = 58     # 9  pre.jac[0:3,9:12]
_JPBG = 67     # 9  pre.jac[0:3,12:15]
_JVBA = 76     # 9  pre.jac[6:9,9:12]
_JVBG = 85     # 9  pre.jac[6:9,12:15]
_G = 94        # 3  gravity (broadcast)
N_IN = 97

N_OUT = 15 + 15 * 30  # 465


def _f32(v):
    return jnp.float32(v)


def _qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def _qconj(a):
    return (a[0], -a[1], -a[2], -a[3])


def _qrot(q, v):
    w, x, y, z = q
    vx, vy, vz = v
    tx = 2.0 * (y * vz - z * vy)
    ty = 2.0 * (z * vx - x * vz)
    tz = 2.0 * (x * vy - y * vx)
    return (
        vx + w * tx + (y * tz - z * ty),
        vy + w * ty + (z * tx - x * tz),
        vz + w * tz + (x * ty - y * tx),
    )


def _qmat(q):
    """R(q) as 9 planes, row-major."""
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return (
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    )


def _m33_mul(A, B):
    """(9 planes) @ (9 planes), row-major."""
    a = A
    b = B
    return (
        a[0] * b[0] + a[1] * b[3] + a[2] * b[6],
        a[0] * b[1] + a[1] * b[4] + a[2] * b[7],
        a[0] * b[2] + a[1] * b[5] + a[2] * b[8],
        a[3] * b[0] + a[4] * b[3] + a[5] * b[6],
        a[3] * b[1] + a[4] * b[4] + a[5] * b[7],
        a[3] * b[2] + a[4] * b[5] + a[5] * b[8],
        a[6] * b[0] + a[7] * b[3] + a[8] * b[6],
        a[6] * b[1] + a[7] * b[4] + a[8] * b[7],
        a[6] * b[2] + a[7] * b[5] + a[8] * b[8],
    )


def _m33_vec(M, v):
    return (
        M[0] * v[0] + M[1] * v[1] + M[2] * v[2],
        M[3] * v[0] + M[4] * v[1] + M[5] * v[2],
        M[6] * v[0] + M[7] * v[1] + M[8] * v[2],
    )


def _skew(v):
    x, y, z = v
    zero = jnp.zeros_like(x)
    return (zero, -z, y, z, zero, -x, -y, x, zero)


def _qnorm(q):
    n = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    n = jnp.maximum(n, _f32(1e-12))
    s = jnp.where(q[0] < 0, _f32(-1.0), _f32(1.0)) / n
    return (q[0] * s, q[1] * s, q[2] * s, q[3] * s)


def _so3_exp_quat(phi):
    """(3 planes) -> quaternion planes (matches geom.so3_exp_quat)."""
    t2 = phi[0] * phi[0] + phi[1] * phi[1] + phi[2] * phi[2]
    small = t2 < _f32(1e-8)
    t = jnp.sqrt(jnp.maximum(t2, _f32(1e-24)))
    half = t * 0.5
    k = jnp.where(small, _f32(0.5) - t2 / 48.0, jnp.sin(half) / t)
    w = jnp.where(small, _f32(1.0) - t2 / 8.0, jnp.cos(half))
    return (w, k * phi[0], k * phi[1], k * phi[2])


def _right_jacobian(phi):
    """Jr(phi) as 9 planes (matches geom.right_jacobian_so3)."""
    t2 = phi[0] * phi[0] + phi[1] * phi[1] + phi[2] * phi[2]
    small = t2 < _f32(1e-8)
    t2s = jnp.maximum(t2, _f32(1e-24))
    t = jnp.sqrt(t2s)
    c1 = jnp.where(small, _f32(0.5) - t2 / 24.0, (_f32(1.0) - jnp.cos(t)) / t2s)
    c2 = jnp.where(small, _f32(1.0 / 6.0) - t2 / 120.0,
                   (t - jnp.sin(t)) / (t2s * t))
    W = _skew(phi)
    W2 = _m33_mul(W, W)
    I = (jnp.ones_like(t2), 0 * t2, 0 * t2,
         0 * t2, jnp.ones_like(t2), 0 * t2,
         0 * t2, 0 * t2, jnp.ones_like(t2))
    return tuple(I[k] - c1 * W[k] + c2 * W2[k] for k in range(9))


def _qlqr3(a, b):
    """(Qleft(a) @ Qright(b))[1:4, 1:4] as 9 planes.

    Qleft rows 1..3: [v_i | w I + skew(v)]; Qright cols 1..3 of row 0 are
    -v_b, rows 1..3 give w I - skew(v_b)."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    # QL rows (i in 1..3), k in 0..3
    QL = (
        (ax, aw, -az, ay),
        (ay, az, aw, -ax),
        (az, -ay, ax, aw),
    )
    # QR column j (j in 1..3), k in 0..3: QR[k, j]
    QRc = (
        (-bx, bw, -bz, by),
        (-by, bz, bw, -bx),
        (-bz, -by, bx, bw),
    )
    out = []
    for i in range(3):
        for j in range(3):
            out.append(sum(QL[i][k] * QRc[j][k] for k in range(4)))
    return tuple(out)


def _ql3(q):
    """Qleft(q)[1:4,1:4] = w I + skew(v) as 9 planes."""
    w, x, y, z = q
    return (w, -z, y, z, w, -x, -y, x, w)


def _imu_kernel(X_ref, Y_ref):
    X = lambda k: X_ref[k]
    v3 = lambda k: (X(k), X(k + 1), X(k + 2))
    q4 = lambda k: (X(k), X(k + 1), X(k + 2), X(k + 3))
    m9 = lambda k: tuple(X(k + i) for i in range(9))

    Pi, Qi, Vi, Bai, Bgi = v3(_PI), q4(_QI), v3(_VI), v3(_BAI), v3(_BGI)
    Pj, Qj, Vj, Baj, Bgj = v3(_PJ), q4(_QJ), v3(_VJ), v3(_BAJ), v3(_BGJ)
    dP, dQ, dV = v3(_DP), q4(_DQ), v3(_DV)
    dt = X(_SDT)
    ba0, bg0 = v3(_BA0), v3(_BG0)
    Jqbg, Jpba, Jpbg = m9(_JQBG), m9(_JPBA), m9(_JPBG)
    Jvba, Jvbg = m9(_JVBA), m9(_JVBG)
    G = v3(_G)

    dba = tuple(Bai[k] - ba0[k] for k in range(3))
    dbg = tuple(Bgi[k] - bg0[k] for k in range(3))

    # bias_corrected_delta (integration_base.h:173-178)
    pba = _m33_vec(Jpba, dba)
    pbg = _m33_vec(Jpbg, dbg)
    dp = tuple(dP[k] + pba[k] + pbg[k] for k in range(3))
    vba = _m33_vec(Jvba, dba)
    vbg = _m33_vec(Jvbg, dbg)
    dv = tuple(dV[k] + vba[k] + vbg[k] for k in range(3))
    a_corr = _m33_vec(Jqbg, dbg)
    corr_dq = _qnorm(_qmul(dQ, _so3_exp_quat(a_corr)))

    Qi_inv = _qconj(Qi)
    # r_p / r_v arguments in world frame
    a1w = tuple(0.5 * G[k] * dt * dt + Pj[k] - Pi[k] - Vi[k] * dt
                for k in range(3))
    a2w = tuple(G[k] * dt + Vj[k] - Vi[k] for k in range(3))
    a1 = _qrot(Qi_inv, a1w)  # also the J_pi theta-block argument
    a2 = _qrot(Qi_inv, a2w)
    r_p = tuple(a1[k] - dp[k] for k in range(3))
    rq_full = _qmul(_qconj(corr_dq), _qmul(Qi_inv, Qj))
    r_q = (2.0 * rq_full[1], 2.0 * rq_full[2], 2.0 * rq_full[3])
    r_v = tuple(a2[k] - dv[k] for k in range(3))
    r_ba = tuple(Baj[k] - Bai[k] for k in range(3))
    r_bg = tuple(Bgj[k] - Bgi[k] for k in range(3))
    r = list(r_p) + list(r_q) + list(r_v) + list(r_ba) + list(r_bg)

    Ri_T = _qmat(Qi_inv)
    Qj_inv_Qi = _qmul(_qconj(Qj), Qi)
    M1 = tuple(-m for m in _qlqr3(Qj_inv_Qi, corr_dq))
    S1 = _skew(a1)
    S2 = _skew(a2)
    Jr = _right_jacobian(a_corr)
    QL_jb = _ql3(_qmul(Qj_inv_Qi, corr_dq))
    Jq_bg = _m33_mul(QL_jb, _m33_mul(Jr, Jqbg))
    Jq_bg = tuple(-m for m in Jq_bg)
    M3 = _ql3(_qmul(_qconj(corr_dq), _qmul(Qi_inv, Qj)))

    zero = jnp.zeros_like(dt)
    one = jnp.ones_like(dt)

    # Jcat row-major (15 rows x 30 cols):
    # cols 0:6 J_pi, 6:15 J_vbi, 15:21 J_pj, 21:30 J_vbj
    rows = [[zero] * 30 for _ in range(15)]

    def put33(r0, c0, M, neg=False, scale=None):
        for i in range(3):
            for j in range(3):
                v = M[3 * i + j]
                if scale is not None:
                    v = v * scale
                rows[r0 + i][c0 + j] = -v if neg else v

    # J_pi
    put33(0, 0, Ri_T, neg=True)
    put33(0, 3, S1)
    put33(3, 3, M1)
    put33(6, 3, S2)
    # J_vbi (cols 6:15)
    put33(0, 6, Ri_T, neg=True, scale=dt)
    put33(0, 9, Jpba, neg=True)
    put33(0, 12, Jpbg, neg=True)
    put33(3, 12, Jq_bg)
    put33(6, 6, Ri_T, neg=True)
    put33(6, 9, Jvba, neg=True)
    put33(6, 12, Jvbg, neg=True)
    for k in range(3):
        rows[9 + k][9 + k] = -one
        rows[12 + k][12 + k] = -one
    # J_pj (cols 15:21)
    put33(0, 15, Ri_T)
    put33(3, 18, M3)
    # J_vbj (cols 21:30)
    put33(6, 21, Ri_T)
    for k in range(3):
        rows[9 + k][24 + k] = one
        rows[12 + k][27 + k] = one

    out = list(r)
    for rr in rows:
        out.extend(rr)
    Y_ref[:, :] = jnp.concatenate([p[None, :] for p in out], axis=0)


def _imu_rows_ref(Pi, Qi, Vi, Bai, Bgi, Pj, Qj, Vj, Baj, Bgj,
                  dP, dQ, dV, sum_dt, ba0, bg0, jac, G):
    """XLA reference with the kernel's signature (vmap fallback)."""
    from ..factors.preintegration import Preintegration, imu_residual_jacobians

    def one(k):
        pre = Preintegration(
            dP[k], dQ[k], dV[k], jac[k],
            jnp.zeros((15, 15), dP.dtype), sum_dt[k], ba0[k], bg0[k],
        )
        return imu_residual_jacobians(
            pre, G, Pi[k], Qi[k], Vi[k], Bai[k], Bgi[k],
            Pj[k], Qj[k], Vj[k], Baj[k], Bgj[k],
        )

    r, J_pi, J_vbi, J_pj, J_vbj = jax.vmap(one)(jnp.arange(Pi.shape[0]))
    return r, jnp.concatenate([J_pi, J_vbi, J_pj, J_vbj], axis=2)


@jax.custom_batching.custom_vmap
def imu_rows_pallas(Pi, Qi, Vi, Bai, Bgi, Pj, Qj, Vj, Baj, Bgj,
                    dP, dQ, dV, sum_dt, ba0, bg0, jac, G):
    """Fused IMU factor evaluation for n factors.

    All state args (n,k); jac (n,15,15); G (3,). Returns
    (r (n,15), Jcat (n,15,30)) UNWEIGHTED — the caller applies sqrt-info.
    f32 in/out (the solver's LM dtype)."""
    n = Pi.shape[0]
    f32 = jnp.float32
    L = 128  # factor lanes (window is <= 128 frames by construction)
    assert n <= L

    def planes(a):  # (n, k) -> (k, L)
        return jnp.pad(a.astype(f32).T, ((0, 0), (0, L - n)))

    jb = lambda r0, c0: jac[:, r0:r0 + 3, c0:c0 + 3].reshape(n, 9)
    X = jnp.concatenate([
        planes(Pi), planes(Qi), planes(Vi), planes(Bai), planes(Bgi),
        planes(Pj), planes(Qj), planes(Vj), planes(Baj), planes(Bgj),
        planes(dP), planes(dQ), planes(dV),
        planes(sum_dt.astype(f32)[:, None]),
        planes(ba0), planes(bg0),
        planes(jb(3, 12)), planes(jb(0, 9)), planes(jb(0, 12)),
        planes(jb(6, 9)), planes(jb(6, 12)),
        jnp.broadcast_to(G.astype(f32)[:, None], (3, L)),
    ], axis=0)

    interpret = jax.default_backend() != "tpu"
    Y = pl.pallas_call(
        _imu_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_OUT, L), f32),
        interpret=interpret,
    )(X)
    r = Y[:15, :n].T  # (n, 15)
    Jcat = Y[15:, :n].reshape(15, 30, n).transpose(2, 0, 1)  # (n, 15, 30)
    return r, Jcat


@imu_rows_pallas.def_vmap
def _imu_rows_batch_rule(axis_size, in_batched, *args):
    # Batched solves (sequence parallelism) take the XLA path: vmapping the
    # ungridded kernel would add a Mosaic grid dimension over the lane-packed
    # layout, which neither tiles well nor compiles on all toolchains.
    bc = lambda x, b: x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)
    args = [bc(a, b) for a, b in zip(args, in_batched)]
    out = jax.vmap(_imu_rows_ref)(*args)
    return out, (True, True)
