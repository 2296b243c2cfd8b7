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

    # NB: gridded pallas_call crashes this environment's Mosaic remote-compile
    # toolchain, so the kernel runs ungridded on the whole (padded) system —
    # at D=276, F=1000 everything fits VMEM comfortably (~2.5 MB).
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
