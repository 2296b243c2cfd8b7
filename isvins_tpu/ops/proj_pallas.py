"""Pallas TPU kernel: fused projection-factor evaluation.

The component-planes evaluation (solver/proj_fast.py) is already
lane-efficient, but XLA compiles its ~200-op elementwise chain into dozens
of small kernels whose fixed launch cost dominates the window solve's
per-iteration time (measured: the solve runs ~9x above its HBM roofline —
630 MB / 1.9 GFLOP for 10 iterations vs 6.6 ms on v5e). This kernel computes
the entire chain — gather-free quaternion transport, residuals, and the
compact pose/depth Jacobians — as ONE VMEM-resident program over
(rows, 128)-tiled observation planes.

Data layout: every logical per-observation quantity is one plane of shape
(Nr, 128) with Nr = Npad/128 (Npad = N rounded up to 1024 so Nr is a
multiple of 8 — full sublane utilization). Input X stacks the 28 input
planes along axis 0, output Y the 28 result planes; the host wrapper does
the (N, k) <-> (k, Nr, 128) packing (a handful of transposes, amortized
across the fused chain it replaces).

Semantics match solver/proj_fast.eval_proj_rows exactly (equivalence-tested
in tests/test_pallas_ops.py); that function remains the reference and the
off-TPU / vmap fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# input plane indices
_PTS_I = 0      # 3: pts_i x y z
_PTS_J = 3      # 2: pts_j x y
_PI = 5         # 3
_QI = 8         # 4 (wxyz)
_PJ = 12        # 3
_QJ = 15        # 4
_QC = 19        # 4 (qic broadcast)
_TC = 23        # 3 (tic broadcast)
_DEP = 26       # 1
_VALID = 27     # 1 (0.0 / 1.0)
N_IN = 28

# output plane indices
_R = 0          # 2
_JPI = 2        # 12 (row-major (2, 6))
_JPJ = 14       # 12
_JDEP = 26      # 2
N_OUT = 28


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
    aw, ax, ay, az = a
    return (aw, -ax, -ay, -az)


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
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return (
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    )


def _cross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _proj_kernel(X_ref, Y_ref):
    X = lambda k: X_ref[k]

    pts_i = (X(_PTS_I), X(_PTS_I + 1), X(_PTS_I + 2))
    pts_j = (X(_PTS_J), X(_PTS_J + 1))
    Pi = (X(_PI), X(_PI + 1), X(_PI + 2))
    qi = (X(_QI), X(_QI + 1), X(_QI + 2), X(_QI + 3))
    Pj = (X(_PJ), X(_PJ + 1), X(_PJ + 2))
    qj = (X(_QJ), X(_QJ + 1), X(_QJ + 2), X(_QJ + 3))
    qc = (X(_QC), X(_QC + 1), X(_QC + 2), X(_QC + 3))
    tc = (X(_TC), X(_TC + 1), X(_TC + 2))
    dep = X(_DEP)
    valid = X(_VALID)

    d = jnp.where((valid > 0.5) & (jnp.abs(dep) > 1e-8), dep, 1.0)
    pi = (pts_i[0] / d, pts_i[1] / d, pts_i[2] / d)

    bi = _qrot(qc, pi)
    bi = (bi[0] + tc[0], bi[1] + tc[1], bi[2] + tc[2])
    wpt = _qrot(qi, bi)
    wpt = (wpt[0] + Pi[0], wpt[1] + Pi[1], wpt[2] + Pi[2])
    bj = _qrot(_qconj(qj), (wpt[0] - Pj[0], wpt[1] - Pj[1], wpt[2] - Pj[2]))
    cj = _qrot(_qconj(qc), (bj[0] - tc[0], bj[1] - tc[1], bj[2] - tc[2]))

    z = cj[2]
    # NB both where-branches must be arrays: two python-float branches
    # produce an f64 constant under x64, which Mosaic cannot legalize
    zf = jnp.where(z >= 0, jnp.full_like(z, 1e-6), jnp.full_like(z, -1e-6))
    z = jnp.where(jnp.abs(z) > 1e-6, z, zf)
    inv_z = 1.0 / z
    u = cj[0] * inv_z
    v = cj[1] * inv_z
    Y_ref[_R] = u - pts_j[0]
    Y_ref[_R + 1] = v - pts_j[1]

    q_a = _qconj(_qmul(qj, qc))
    q_b = _qmul(q_a, qi)
    q_c = _qmul(q_b, qc)

    A = _qmat(q_a)
    B = _qmat(q_b)
    Cm = _qmat(q_c)

    def reduce_rows(M):
        m00, m01, m02, m10, m11, m12, m20, m21, m22 = M
        r0 = ((m00 - u * m20) * inv_z, (m01 - u * m21) * inv_z,
              (m02 - u * m22) * inv_z)
        r1 = ((m10 - v * m20) * inv_z, (m11 - v * m21) * inv_z,
              (m12 - v * m22) * inv_z)
        return r0, r1

    RA0, RA1 = reduce_rows(A)
    RB0, RB1 = reduce_rows(B)

    JpiR0 = _cross(bi, RB0)
    JpiR1 = _cross(bi, RB1)
    for k in range(3):
        Y_ref[_JPI + k] = RA0[k]
        Y_ref[_JPI + 3 + k] = JpiR0[k]
        Y_ref[_JPI + 6 + k] = RA1[k]
        Y_ref[_JPI + 9 + k] = JpiR1[k]

    RC = _qmat(_qconj(qc))
    RC0, RC1 = reduce_rows(RC)
    JpjR0 = _cross(bj, RC0)
    JpjR1 = _cross(bj, RC1)
    for k in range(3):
        Y_ref[_JPJ + k] = -RA0[k]
        Y_ref[_JPJ + 3 + k] = -JpjR0[k]
        Y_ref[_JPJ + 6 + k] = -RA1[k]
        Y_ref[_JPJ + 9 + k] = -JpjR1[k]

    c00, c01, c02, c10, c11, c12, c20, c21, c22 = Cm
    px, py, pz = pts_i
    w0 = c00 * px + c01 * py + c02 * pz
    w1 = c10 * px + c11 * py + c12 * pz
    w2 = c20 * px + c21 * py + c22 * pz
    s = -1.0 / (d * d)
    Y_ref[_JDEP] = (w0 - u * w2) * inv_z * s
    Y_ref[_JDEP + 1] = (w1 - v * w2) * inv_z * s


def _pack_planes(N, Nr, dtype, pts_i, pts_j, Pi, Qi, Pj, Qj, tic, qic, dep, valid):
    """Stack the 28 input planes into (N_IN, Nr, 128)."""
    Npad = Nr * 128
    cols = [
        pts_i[:, 0], pts_i[:, 1], pts_i[:, 2],
        pts_j[:, 0], pts_j[:, 1],
        Pi[:, 0], Pi[:, 1], Pi[:, 2],
        Qi[:, 0], Qi[:, 1], Qi[:, 2], Qi[:, 3],
        Pj[:, 0], Pj[:, 1], Pj[:, 2],
        Qj[:, 0], Qj[:, 1], Qj[:, 2], Qj[:, 3],
    ]
    planes = jnp.stack(cols, axis=0).astype(dtype)  # (19, N)
    bcast = jnp.concatenate(
        [qic.astype(dtype), tic.astype(dtype)]
    )[:, None] * jnp.ones((1, N), dtype)  # (7, N)
    tail = jnp.stack([dep.astype(dtype), valid.astype(dtype)], axis=0)  # (2, N)
    X = jnp.concatenate([planes, bcast, tail], axis=0)  # (28, N)
    X = jnp.pad(X, ((0, 0), (0, Npad - N)))
    return X.reshape(N_IN, Nr, 128)


@jax.custom_batching.custom_vmap
def proj_rows_pallas(pts_i, pts_j, Pi, Qi, Pj, Qj, tic, qic, dep, valid):
    """Fused projection evaluation. Same signature/returns as
    solver.proj_fast.eval_proj_rows: (r (N,2), J_pi (N,2,6), J_pj (N,2,6),
    J_dep (N,2)), computed in f32 (the solver's LM dtype)."""
    N = pts_i.shape[0]
    dtype = jnp.float32
    Nr = ((N + 1023) // 1024) * 8  # Npad multiple of 1024 -> Nr multiple of 8

    X = _pack_planes(N, Nr, dtype, pts_i, pts_j, Pi, Qi, Pj, Qj, tic, qic,
                     dep, valid)
    interpret = jax.default_backend() != "tpu"
    Y = pl.pallas_call(
        _proj_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_OUT, Nr, 128), dtype),
        interpret=interpret,
    )(X)
    Y = Y.reshape(N_OUT, Nr * 128)[:, :N]  # (28, N)
    r = Y[_R : _R + 2].T
    J_pi = Y[_JPI : _JPI + 12].T.reshape(N, 2, 6)
    J_pj = Y[_JPJ : _JPJ + 12].T.reshape(N, 2, 6)
    J_dep = Y[_JDEP : _JDEP + 2].T
    return r, J_pi, J_pj, J_dep


@proj_rows_pallas.def_vmap
def _proj_rows_batch_rule(axis_size, in_batched, *args):
    from ..solver.proj_fast import eval_proj_rows

    bc = lambda x, b: x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)
    args = [bc(a, b) for a, b in zip(args, in_batched)]
    out = jax.vmap(eval_proj_rows)(*args)
    return out, (True, True, True, True)
