"""Pallas TPU kernel: fused landmark Schur reduction.

Computes the reduced camera system in one kernel:

    H_s = H - W^T diag(1/h) W          b_s = b - W^T (b_l / h)

where W (F, D) couples F inverse-depth landmarks to the D-dim pose system
and h (F,) are the per-landmark scalar Hessians (solver/window.py). The
kernel tiles the (D, D) output over the grid; each program streams the two
needed W column-tiles through the MXU with the 1/h scaling fused into the
first operand — no (F, D) scaled intermediate is ever materialized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def schur_reduce_ref(H, b, W, h, b_l):
    """jnp reference: returns (H_s, b_s)."""
    h_safe = jnp.where(h > 1e-12, h, 1.0)
    Wi = W / h_safe[:, None]
    return H - W.T @ Wi, b - W.T @ (b_l / h_safe)


def _kernel(H_ref, W_i_ref, W_j_ref, hinv_ref, out_ref):
    W_i = W_i_ref[:]  # (F, Dp)
    W_j = W_j_ref[:]  # (F, Dp)
    hinv = hinv_ref[:]  # (F, Dp) pre-broadcast (lane-width-legal layout)
    acc = jax.lax.dot_general(
        W_i * hinv, W_j,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = H_ref[:] - acc


@jax.jit
def schur_reduce_pallas(H, b, W, h, b_l):
    """Pallas version (interpret mode off-TPU so tests exercise the kernel)."""
    D = H.shape[0]
    F = W.shape[0]
    TD = 128
    Dp = ((D + TD - 1) // TD) * TD
    Fp = ((F + 7) // 8) * 8
    dtype = H.dtype

    Hp = jnp.zeros((Dp, Dp), dtype).at[:D, :D].set(H)
    Wp = jnp.zeros((Fp, Dp), dtype).at[:F, :D].set(W)
    h_safe = jnp.where(h > 1e-12, h, 1.0)
    hinv = jnp.zeros((Fp, Dp), dtype).at[:F, :].set((1.0 / h_safe)[:, None])

    # Ungridded whole-array invocation: at D=276, F=1000 everything fits VMEM
    # comfortably (~2.5 MB), so grid tiling would only add program overhead.
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Dp, Dp), dtype),
        interpret=interpret,
    )(Hp, Wp, Wp, hinv)
    b_s = b - W.T @ (b_l / h_safe)
    return out[:D, :D], b_s


def schur_corr_ref(W, h_safe, b_l):
    """jnp reference/fallback for the fused LM-iteration Schur correction:
    C = W^T diag(1/h) W  (Dr, Dr)  and  c_b = W^T (b_l / h)  (Dr,)."""
    Wi = W / h_safe[:, None]
    return W.T @ Wi, W.T @ (b_l / h_safe)


def _corr_kernel(W_ref, hinv_ref, G_ref, out_ref):
    """out = (W * hinv)^T @ [W | b_l-block]: one MXU pass produces both the
    Schur coupling block C and the RHS correction c_b."""
    Wh = W_ref[:] * hinv_ref[:]
    out_ref[:] = jax.lax.dot_general(
        Wh, G_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@jax.custom_batching.custom_vmap
def schur_corr_pallas(W, h_safe, b_l):
    """Fused Pallas version of `schur_corr_ref` for the solver's per-iteration
    Schur correction (solver/window.py LM body). W (F, Dr) reduced-layout
    coupling rows, h_safe (F,) damped landmark Hessians (already made safe),
    b_l (F,) landmark RHS. Returns (C (Dr, Dr), c_b (Dr,)).

    In-context A/B on v5e (full 10-iter window solve, D=276/F=1000):
    6.41-6.58 ms for both this kernel and the XLA form — a wash; standalone
    the kernel is ~1.4x faster (26 vs 36 us) but the solver is not
    corr-bound. Kept as the TPU default; under vmap (batched solves) the
    custom batching rule below falls back to the XLA form, which batches
    into one big MXU matmul anyway (ungridded pallas_call has no batch
    rule and fails Mosaic legalization)."""
    F, Dr = W.shape
    dtype = W.dtype
    Fp = ((F + 7) // 8) * 8
    Dp = ((Dr + 127) // 128) * 128

    Wp = jnp.zeros((Fp, Dp), dtype).at[:F, :Dr].set(W)
    # pad h with 1.0 so the padded rows (W=0) contribute nothing
    hinv = jnp.ones((Fp, Dp), dtype).at[:F, :].set((1.0 / h_safe)[:, None])
    # G = [W | b_l in column 0 of a 128-wide block]
    G = jnp.zeros((Fp, Dp + 128), dtype)
    G = G.at[:F, :Dr].set(W)
    G = G.at[:F, Dp].set(b_l)

    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _corr_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Dp, Dp + 128), dtype),
        interpret=interpret,
    )(Wp, hinv, G)
    return out[:Dr, :Dr], out[:Dr, Dp]


@schur_corr_pallas.def_vmap
def _schur_corr_batch_rule(axis_size, in_batched, W, h_safe, b_l):
    bc = lambda x, b: x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)
    W = bc(W, in_batched[0])
    h_safe = bc(h_safe, in_batched[1])
    b_l = bc(b_l, in_batched[2])
    C, cb = jax.vmap(schur_corr_ref)(W, h_safe, b_l)
    return (C, cb), (True, True)
