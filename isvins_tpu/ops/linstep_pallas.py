"""Pallas TPU kernel: the entire LM linear step, fused.

One kernel computes, from the assembled normal equations
(H (D,D), b (D,), W (F,Dr), h (F,), b_l (F,)) and the damping lambda:

    h_d    = h * (1 + lam);  h_safe = max-guarded h_d
    C      = W^T diag(1/h_safe) W,  c_b = W^T (b_l / h_safe)
    H_s    = H - insert(C),  b_s = b - insert(c_b)      (reduced->full blocks)
    H_dd   = H_s + lam * clip(diag H) + trace-jitter     (LM damping)
    L L^T  = H_dd                                        (blocked Cholesky)
    dx     = (L L^T)^{-1} b_s                            (two triangular solves)
    dl     = (b_l - W dx_r) / h_safe                     (landmark back-subst)

Motivation: profiled on v5e, the XLA lowering of this step costs ~200 us
per LM iteration, dominated not by FLOPs (D=276 -> ~7 MFLOP) but by fixed
kernel-gap latency and layout copies: a 73 us row-to-column-major copy
feeding the Cholesky custom-call, 4 triangular-solve custom-calls, the
block-insert dynamic-update-slices and diag/eye fusions — ~40 dispatches
with ~1 us of dead time between each. Fusing the whole step into one
VMEM-resident program removes every one of those boundaries.

Algorithm notes:
- The reduced->full block insertion (projection factors touch only
  [pose | extrinsic] columns) is expressed as P C P^T with a constant
  scatter matrix P (D, Dr) — MXU matmuls instead of dynamic-update-slices.
- Cholesky is right-looking with rank-8 panel updates. Factor rows are
  computed with the "unmasked" sweep: after column j's rank-1 update, row
  and column j of the trailing matrix are exactly zero, so no triangular
  masking is needed (fp32 residue is ~1e-7 of the diagonal and is damped
  by the LM floor).
- Both triangular solves run as 276 sequential scalar steps over (1, Dp)
  rows of L^T — forward substitution right-looking (uses rows of L^T as
  columns of L), back substitution left-looking (uses rows of L^T
  directly) — so neither ever needs a lane-dimension gather.

Equivalence vs the XLA reference is tested in tests/test_pallas_ops.py
(interpret mode on CPU, compiled on TPU). The XLA form remains the
fallback for f64, vmap (batched solves), and non-TPU backends.

Measured in-context (v5e, 10-iteration window solve, D=276/F=1000): the
kernel runs ~175 us vs ~200 us for the XLA chain it replaces — a small
net win (~0.1 ms/solve), bounded by the 276 sequential scalar steps of
the factorization/substitutions (latency-chained reduce+rsqrt per column,
~0.3 us each), not by memory or MXU throughput. Kept as the TPU default;
the bigger solver wins came from de-scattering the factor-evaluation
assembly (factors/preintegration.py jnp.block rewrite).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 8  # Cholesky panel width


def linstep_ref(H, b, W, h, b_l, lam, n_pose, D):
    """jnp reference/fallback (identical math to the solve_window body)."""
    dtype = H.dtype
    Dr = W.shape[1]
    h_d = h * (1.0 + lam)
    h_safe = jnp.where(h_d > 1e-12, h_d, 1.0)
    Wh = W / h_safe[:, None]
    C = jax.lax.dot_general(W, Wh, (((0,), (0,)), ((), ())))
    c_b = jax.lax.dot_general(W, b_l / h_safe, (((0,), (0,)), ((), ())))
    ex0 = D - (Dr - n_pose)  # full-layout start of the extrinsic block
    H_s = H
    H_s = H_s.at[:n_pose, :n_pose].add(-C[:n_pose, :n_pose])
    H_s = H_s.at[:n_pose, ex0:].add(-C[:n_pose, n_pose:])
    H_s = H_s.at[ex0:, :n_pose].add(-C[n_pose:, :n_pose])
    H_s = H_s.at[ex0:, ex0:].add(-C[n_pose:, n_pose:])
    b_s = b.at[:n_pose].add(-c_b[:n_pose])
    b_s = b_s.at[ex0:].add(-c_b[n_pose:])
    diagH = jnp.clip(jnp.diag(H), 1e-8, None)
    H_d = H_s + jnp.diag(lam * diagH)
    # chol+cho_solve, not jnp.linalg.solve: A/B on v5e batched x8 measured
    # the LU lowering at 25.0 ms/solve vs 17.9 ms for the Cholesky chain
    # (the standalone-LU microbench is misleading; in-loop the LU's pivot
    # bookkeeping serializes). Single-stream TPU uses the fused Pallas
    # linstep and never reaches this line.
    L = jnp.linalg.cholesky(
        H_d + 1e-12 * jnp.trace(H_d) / D * jnp.eye(D, dtype=dtype)
    )
    dx = jax.scipy.linalg.cho_solve((L, True), b_s)
    dx_r = jnp.concatenate([dx[:n_pose], dx[ex0:]])
    dl = (b_l - W @ dx_r) / h_safe
    return dx, dl


@functools.lru_cache(maxsize=8)
def _scatter_matrix(n_pose: int, Dr: int, D: int, Dp: int, Drp: int):
    """P (Dp, Drp) with P @ x_reduced = x_full for the [pose | ex] layout."""
    P = np.zeros((Dp, Drp), np.float32)
    for j in range(Dr):
        i = j if j < n_pose else D - (Dr - j)
        P[i, j] = 1.0
    # return numpy, NOT jnp.asarray: a device constant created during one
    # trace and served from the cache into another leaks a tracer
    return P


def _make_kernel(D: int, Dp: int, nblk: int):
    def kernel(H_ref, bP_ref, W_ref, h_ref, G_ref, lam_ref, P_ref,
               dx_ref, dl_ref, A_ref, U_ref):
        f32 = jnp.float32
        # NB selects must produce f32 directly: python-float branch
        # pairs become f64 constants under x64 and Mosaic's f64->f32
        # convert rule recurses infinitely
        sel = lambda c: jnp.where(c, jnp.float32(1.0), jnp.float32(0.0))
        lam = lam_ref[0, 0]

        # --- Schur correction -------------------------------------------
        h_d = h_ref[:] * (1.0 + lam)
        h_safe = jnp.where(h_d > 1e-12, h_d, 1.0)
        hinv = 1.0 / h_safe
        W = W_ref[:]
        G = G_ref[:]  # [W | b_l at column Drp]
        CC = jax.lax.dot_general(
            W * hinv, G, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (Drp, Drp + 128)
        Drp = W.shape[1]
        C = CC[:, :Drp]
        P = P_ref[:]  # (Dp, Drp)
        PC = jax.lax.dot_general(P, C, (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32)  # (Dp, Drp)
        Cfull = jax.lax.dot_general(PC, P, (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)  # (Dp, Dp)

        # c_b as a row vector: (b_l/h)^T W then scatter through P^T
        blh = G[:, Drp:Drp + 1] * hinv[:, :1]  # (F, 1)
        c_red = jax.lax.dot_general(blh, W, (((0,), (0,)), ((), ())),
                                    preferred_element_type=f32)  # (1, Drp)
        c_row = jax.lax.dot_general(c_red, P, (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)  # (1, Dp)

        H = H_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, Dp), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (Dp, Dp), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (Dp, Dp), 1)
        eye = sel(row == col)
        diagH = jnp.sum(H * eye, axis=0, keepdims=True)  # (1, Dp)
        active = sel(lane < D)
        tr = jnp.sum(diagH * active)
        damp = lam * jnp.maximum(diagH, 1e-8) + 1e-12 * tr / D
        # padded diagonal -> 1.0 so the factorization stays finite
        dvec = damp * active + (1.0 - active)  # (1, Dp)
        H_dd = H - Cfull + eye * (dvec * jnp.ones((Dp, 1), f32))
        b_s = bP_ref[0:1, :] - c_row  # (1, Dp)

        # --- blocked right-looking Cholesky ------------------------------
        A_ref[:, :] = H_dd

        def outer(jb, _):
            j0 = jb * _BLK
            Pnl = A_ref[pl.ds(j0, _BLK), :]  # (8, Dp)
            lrows = []
            for i in range(_BLK):
                r = Pnl[i:i + 1, :]
                oh = sel(lane == j0 + i)
                d = jnp.sum(r * oh)
                linv = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
                l = r * linv
                lrows.append(l)
                colv = jax.lax.dot_general(
                    Pnl, oh, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)  # (8, 1)
                Pnl = Pnl - jax.lax.dot_general(
                    colv * linv, l, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
            Lp = jnp.concatenate(lrows, axis=0)  # (8, Dp)
            U_ref[pl.ds(j0, _BLK), :] = Lp
            A_ref[:, :] = A_ref[:, :] - jax.lax.dot_general(
                Lp, Lp, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nblk), outer, jnp.int32(0))

        # --- forward substitution: L y = b_s -----------------------------
        # right-looking; L[:, j] is row j of U
        def fwd(jb, carry):
            res, y = carry
            j0 = jb * _BLK
            Ub = U_ref[pl.ds(j0, _BLK), :]
            for i in range(_BLK):
                u = Ub[i:i + 1, :]
                oh = sel(lane == j0 + i)
                d = jnp.sum(u * oh)
                yj = jnp.sum(res * oh) / d
                res = res - yj * u
                y = y + yj * oh
            return res, y

        y0 = jnp.zeros((1, Dp), f32)
        _, y = jax.lax.fori_loop(jnp.int32(0), jnp.int32(nblk), fwd, (b_s, y0))

        # --- back substitution: L^T x = y --------------------------------
        # left-looking; row j of U is row j of L^T
        def bwd(jbr, x):
            j0 = (nblk - 1 - jbr) * _BLK
            Ub = U_ref[pl.ds(j0, _BLK), :]
            for ir in range(_BLK):
                i = _BLK - 1 - ir
                u = Ub[i:i + 1, :]
                oh = sel(lane == j0 + i)
                d = jnp.sum(u * oh)
                s = jnp.sum(u * x)
                xj = (jnp.sum(y * oh) - s) / d
                x = x + xj * oh
            return x

        x = jax.lax.fori_loop(jnp.int32(0), jnp.int32(nblk), bwd, jnp.zeros((1, Dp), f32))

        # padded lanes may hold garbage from the identity diagonal: zero them
        x = x * active
        dx_ref[:, :] = jnp.broadcast_to(x, (8, Dp))

        # --- landmark back-substitution ----------------------------------
        dx_r = jax.lax.dot_general(x, P, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)  # (1, Drp)
        Wdx = jax.lax.dot_general(W, dx_r, (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)  # (F, 1)
        dl = (G[:, Drp:Drp + 1] - Wdx) * hinv[:, :1]  # (F, 1)
        dl_ref[:, :] = jnp.broadcast_to(dl, dl_ref.shape)

    return kernel


@functools.lru_cache(maxsize=4)
def _linstep_for(n_pose: int):
    """Build (and cache) the custom-vmap'd fused linstep for a static
    n_pose (= 6*B, the pose-column count of the reduced layout)."""

    @jax.custom_batching.custom_vmap
    def f(H, b, W, h, b_l, lam):
        return _linstep_impl(H, b, W, h, b_l, lam, n_pose)

    @f.def_vmap
    def _rule(axis_size, in_batched, H, b, W, h, b_l, lam):
        bc = lambda x, bt: x if bt else jnp.broadcast_to(
            jnp.asarray(x), (axis_size,) + jnp.shape(jnp.asarray(x)))
        Hb, bb, Wb, hb, blb, lamb = (
            bc(a, bt) for a, bt in zip((H, b, W, h, b_l, lam), in_batched))
        D = Hb.shape[-1]
        # Batched TPU path: XLA's batched Cholesky + triangular chain costs
        # ~630 us/LM-iteration at NB=8/D=276 (profiled; it was the largest
        # single item in the batched solve) — the batch-vectorized Pallas
        # factorization replaces it. f64 / non-TPU / VMEM-overflow cases keep
        # the XLA reference.
        NB = int(axis_size)
        Dp = ((D + 127) // 128) * 128
        # VMEM budget: 3 (NBc,Dp,Dp) f32 buffers per kernel launch (aliased
        # A, the U scratch, and the dot_general temporary of the rank-8
        # update). Batches larger than one launch's budget are CHUNKED over
        # sequential launches inside _linstep_batched (lax.map), so only a
        # single chunk of >=8 problems has to fit.
        vmem_mb = 3 * 8 * Dp * Dp * 4 / 1e6
        if (
            Hb.dtype == jnp.float32
            and jax.default_backend() == "tpu"
            and vmem_mb < 15.0
        ):
            out = _linstep_batched(Hb, bb, Wb, hb, blb, lamb, n_pose)
        else:
            out = jax.vmap(lambda H, b, W, h, b_l, lam: linstep_ref(
                H, b, W, h, b_l, lam, n_pose, D))(Hb, bb, Wb, hb, blb, lamb)
        return out, (True, True)

    return f


def _linstep_batched(H, b, W, h, b_l, lam, n_pose: int):
    """Batched LM linear step: Schur correction / block insert / damping /
    landmark back-substitution as XLA batched matmuls (MXU-efficient under
    batching), with only the latency-bound dense factorization + triangular
    solves in the batch-vectorized Pallas kernel below."""
    NB, D, _ = H.shape
    F, Dr = W.shape[1], W.shape[2]
    dtype = H.dtype
    lam = lam.reshape(NB, 1)
    h_d = h * (1.0 + lam)
    h_safe = jnp.where(h_d > 1e-12, h_d, 1.0)
    Wh = W / h_safe[..., None]
    C = jnp.einsum("nfa,nfb->nab", W, Wh)
    c_b = jnp.einsum("nfa,nf->na", W, b_l / h_safe)
    Dp = ((D + 127) // 128) * 128
    Drp = ((Dr + 127) // 128) * 128
    P = _scatter_matrix(n_pose, Dr, D, Dp, Drp)[:D, :Dr]  # (D, Dr)
    # reduced -> full block insertion via the scatter matrix (batched MXU
    # work; at[].add dynamic-update-slices relayout under batching)
    H_s = H - jnp.einsum("ia,nab->nib", P, C) @ P.T
    b_s = b - c_b @ P.T
    diagH = jnp.clip(jnp.diagonal(H, axis1=1, axis2=2), 1e-8, None)
    tr = jnp.sum(diagH, axis=1, keepdims=True)
    dvec = lam * diagH + 1e-12 * tr / D  # (NB, D)
    H_dd = H_s + jax.vmap(jnp.diag)(dvec)
    # chunk the factorization so each kernel launch fits VMEM (3 (NBc,Dp,Dp)
    # f32 buffers <= ~15 MB); the sublane-batched chain advances all NBc
    # problems per step, so chunks of 8+ keep the latency win
    NBc = max(8, int(15e6 // (3 * Dp * Dp * 4)))
    NBc = 1 << (NBc.bit_length() - 1)
    if NB <= NBc:
        dx = chol_solve_batched_pallas(H_dd, b_s)
    else:
        pad = (-NB) % NBc
        if pad:
            H_dd = jnp.concatenate(
                [H_dd, jnp.tile(jnp.eye(D, dtype=dtype)[None], (pad, 1, 1))])
            b_s = jnp.concatenate([b_s, jnp.zeros((pad, D), dtype)])
        G = (NB + pad) // NBc
        dx = jax.lax.map(
            lambda ab: chol_solve_batched_pallas(ab[0], ab[1]),
            (H_dd.reshape(G, NBc, D, D), b_s.reshape(G, NBc, D)),
        ).reshape(G * NBc, D)[:NB]
    dx_r = jnp.concatenate([dx[:, :n_pose], dx[:, D - (Dr - n_pose):]], axis=1)
    dl = (b_l - jnp.einsum("nfa,na->nf", W, dx_r)) / h_safe
    return dx, dl


def _make_chol_kernel(D: int, Dp: int, nblk: int, NB: int):
    """Batch-vectorized dense Cholesky + two triangular solves.

    The batch dimension rides the SUBLANES: every step of the sequential
    column sweep (the latency chain that bounds the single-problem kernel at
    ~90 us) operates on (NB, 1, Dp) / (NB, 8, Dp) tiles, so all NB problems
    advance per step — the chain length is identical to the single-problem
    kernel and the per-step tiles are still far below VPU width."""

    def kernel(A_in_ref, b_ref, dx_ref, A_ref, U_ref):
        # A_in_ref is aliased to the A_ref output buffer (input_output_aliases)
        # so the factorization runs in place without a second (NB,Dp,Dp) copy;
        # A_in_ref is never read — A_ref sees the input values.
        del A_in_ref
        f32 = jnp.float32
        sel = lambda c: jnp.where(c, jnp.float32(1.0), jnp.float32(0.0))
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Dp), 2)

        # --- blocked right-looking Cholesky (in-place in A_ref) -----------
        def outer(jb, _):
            j0 = jb * _BLK
            Pnl = A_ref[:, pl.ds(j0, _BLK), :]  # (NB, 8, Dp)
            lrows = []
            for i in range(_BLK):
                r = Pnl[:, i:i + 1, :]
                oh = sel(lane == j0 + i)
                d = jnp.sum(r * oh, axis=-1, keepdims=True)  # (NB,1,1)
                linv = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
                l = r * linv
                lrows.append(l)
                colv = jnp.sum(Pnl * oh, axis=-1, keepdims=True)  # (NB,8,1)
                Pnl = Pnl - (colv * linv) * l
            Lp = jnp.concatenate(lrows, axis=1)  # (NB, 8, Dp)
            U_ref[:, pl.ds(j0, _BLK), :] = Lp
            upd = jax.lax.dot_general(
                Lp, Lp, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
            )  # (NB, Dp, Dp) batched rank-8 update
            A_ref[:, :, :] = A_ref[:, :, :] - upd
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nblk), outer, jnp.int32(0))

        # --- forward substitution: L y = b_s ------------------------------
        def fwd(jb, carry):
            res, y = carry
            j0 = jb * _BLK
            Ub = U_ref[:, pl.ds(j0, _BLK), :]
            for i in range(_BLK):
                u = Ub[:, i:i + 1, :]
                oh = sel(lane == j0 + i)
                d = jnp.sum(u * oh, axis=-1, keepdims=True)
                yj = jnp.sum(res * oh, axis=-1, keepdims=True) / d
                res = res - yj * u
                y = y + yj * oh
            return res, y

        b_s = b_ref[:, 0:1, :]  # (NB, 1, Dp)
        y0 = jnp.zeros((NB, 1, Dp), f32)
        _, y = jax.lax.fori_loop(jnp.int32(0), jnp.int32(nblk), fwd, (b_s, y0))

        # --- back substitution: L^T x = y ---------------------------------
        def bwd(jbr, x):
            j0 = (nblk - 1 - jbr) * _BLK
            Ub = U_ref[:, pl.ds(j0, _BLK), :]
            for ir in range(_BLK):
                i = _BLK - 1 - ir
                u = Ub[:, i:i + 1, :]
                oh = sel(lane == j0 + i)
                d = jnp.sum(u * oh, axis=-1, keepdims=True)
                s = jnp.sum(u * x, axis=-1, keepdims=True)
                xj = (jnp.sum(y * oh, axis=-1, keepdims=True) - s) / d
                x = x + xj * oh
            return x

        x = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(nblk), bwd, jnp.zeros((NB, 1, Dp), f32)
        )
        active = sel(lane < D)
        dx_ref[:, :, :] = jnp.broadcast_to(x * active, (NB, 8, Dp))

    return kernel


def chol_solve_batched_pallas(H_dd, b_s):
    """Solve H_dd[n] x[n] = b_s[n] for SPD H_dd (NB, D, D), f32. Padded
    diagonal entries are set to 1 so the factorization stays finite."""
    NB, D, _ = H_dd.shape
    f32 = jnp.float32
    Dp = ((D + 127) // 128) * 128
    nblk = (D + _BLK - 1) // _BLK

    Ap = jnp.pad(H_dd.astype(f32), ((0, 0), (0, Dp - D), (0, Dp - D)))
    lane = jnp.arange(Dp) >= D
    Ap = Ap + jnp.diag(lane.astype(f32))[None]
    bP = jnp.pad(b_s.astype(f32)[:, None, :], ((0, 0), (0, 7), (0, Dp - D)))

    interpret = jax.default_backend() != "tpu"
    dx8, _ = pl.pallas_call(
        _make_chol_kernel(D, Dp, nblk, NB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # A (aliased to output 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB, 8, Dp), f32),
            jax.ShapeDtypeStruct((NB, Dp, Dp), f32),  # in-place working A
        ],
        scratch_shapes=[pltpu.VMEM((NB, Dp, Dp), f32)],  # U = L^T
        input_output_aliases={0: 1},
        interpret=interpret,
    )(Ap, bP)
    return dx8[:, 0, :D].astype(H_dd.dtype)


def linstep_pallas(H, b, W, h, b_l, lam, n_pose: int):
    """Fused LM linear step. Returns (dx (D,), dl (F,)); f32 only.

    n_pose is static (6*B); reduced layout is [0, n_pose) pose columns then
    the 6 extrinsic columns, mapped to [0, n_pose) and [D-6, D) of the full
    system (solver/window.py build_normal_equations)."""
    return _linstep_for(int(n_pose))(H, b, W, h, b_l, lam)


def _linstep_impl(H, b, W, h, b_l, lam, n_pose):
    D = H.shape[0]
    F, Dr = W.shape
    f32 = jnp.float32
    Dp = ((max(D, 1) + 127) // 128) * 128
    Drp = ((Dr + 127) // 128) * 128
    Fp = ((F + 7) // 8) * 8
    nblk = (D + _BLK - 1) // _BLK

    # pad via jnp.pad/concatenate, NOT zeros().at[].set: a lane-misaligned
    # dynamic-update-slice on TPU costs ~70 us for the (384,384) H alone
    # (profiled), while pads fuse into cheap copies
    Hp = jnp.pad(H.astype(f32), ((0, Dp - D), (0, Dp - D)))
    bP = jnp.pad(b.astype(f32)[None, :], ((0, 7), (0, Dp - D)))
    Wp = jnp.pad(W.astype(f32), ((0, Fp - F), (0, Drp - Dr)))
    # padded rows: h=1 so hinv is finite; W rows are zero so they are inert
    hp = jnp.pad(h.astype(f32)[:, None], ((0, Fp - F), (0, 0)),
                 constant_values=1.0)
    hp = jnp.broadcast_to(hp, (Fp, Drp))
    G = jnp.pad(
        jnp.concatenate([W.astype(f32), jnp.zeros((F, Drp - Dr), f32),
                         b_l.astype(f32)[:, None]], axis=1),
        ((0, Fp - F), (0, 127)))
    lam2 = jnp.asarray(lam, f32).reshape(1, 1)
    P = _scatter_matrix(n_pose, Dr, D, Dp, Drp)

    interpret = jax.default_backend() != "tpu"
    dx8, dlp = pl.pallas_call(
        _make_kernel(D, Dp, nblk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # H
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h
            pl.BlockSpec(memory_space=pltpu.VMEM),  # G
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lam
            pl.BlockSpec(memory_space=pltpu.VMEM),  # P
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, Dp), f32),
            jax.ShapeDtypeStruct((Fp, 128), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Dp, Dp), f32),  # A (working copy)
            pltpu.VMEM((Dp, Dp), f32),  # U = L^T
        ],
        interpret=interpret,
    )(Hp, bP, Wp, hp, G, lam2, P)
    return dx8[0, :D].astype(H.dtype), dlp[:F, 0].astype(H.dtype)
