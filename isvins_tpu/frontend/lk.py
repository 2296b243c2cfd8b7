"""Pyramidal Lucas-Kanade optical flow, batched over features.

Replaces cv::calcOpticalFlowPyrLK (21x21 window, 3 levels;
feature_tracker_simple.cpp:114). For each feature the 21x21 patch and its
gradients are gathered with vectorized bilinear sampling (vmapped), the 2x2
normal matrix is inverted in closed form, and the iterative update runs in a
`lax.fori_loop` — one jit per (n_levels, patch, iters) signature, all
features in parallel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .image_ops import bilinear_sample, build_pyramid


def _patch_grid(half: int, dtype):
    r = jnp.arange(-half, half + 1, dtype=dtype)
    gy, gx = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # (P,2)


def _lk_level(img0, img1, pts0, guess, valid, half: int, iters: int, dtype):
    """One pyramid level. pts0/guess: (N,2) in this level's pixel coords."""
    grid = _patch_grid(half, dtype)  # (P,2)
    eps_step = 0.01

    def one(p0, g, v):
        coords0 = p0[None, :] + grid  # (P,2)
        t = bilinear_sample(img0, coords0)  # template
        # spatial gradients of the template (central differences via sampling)
        dx = (
            bilinear_sample(img0, coords0 + jnp.array([0.5, 0.0], dtype))
            - bilinear_sample(img0, coords0 - jnp.array([0.5, 0.0], dtype))
        )
        dy = (
            bilinear_sample(img0, coords0 + jnp.array([0.0, 0.5], dtype))
            - bilinear_sample(img0, coords0 - jnp.array([0.0, 0.5], dtype))
        )
        gxx = jnp.sum(dx * dx)
        gxy = jnp.sum(dx * dy)
        gyy = jnp.sum(dy * dy)
        det = gxx * gyy - gxy * gxy
        ok_g = det > 1e-6
        det_safe = jnp.where(ok_g, det, 1.0)

        def body(_, cur):
            diff = bilinear_sample(img1, cur[None, :] + grid) - t
            bx = jnp.sum(diff * dx)
            by = jnp.sum(diff * dy)
            du = -(gyy * bx - gxy * by) / det_safe
            dv = -(-gxy * bx + gxx * by) / det_safe
            return cur + jnp.stack([du, dv])

        p1 = jax.lax.fori_loop(0, iters, body, g)
        # residual check: mean abs diff after convergence
        diff = bilinear_sample(img1, p1[None, :] + grid) - t
        err = jnp.mean(jnp.abs(diff))
        return p1, v & ok_g, err

    return jax.vmap(one)(pts0, guess, valid)


@functools.partial(jax.jit, static_argnames=("levels", "half", "iters"))
def pyramidal_lk(
    img0, img1, pts0, valid, levels: int = 3, half: int = 10, iters: int = 10
):
    """Track pts0 (N,2) from img0 to img1 (both (H,W) float). Returns
    (pts1 (N,2), ok (N,), err (N,)). 21x21 window = half 10."""
    dtype = img0.dtype
    pyr0 = build_pyramid(img0, levels)
    pyr1 = build_pyramid(img1, levels)
    scale = 2.0 ** (levels - 1)
    guess = pts0 / scale
    ok = valid
    err = jnp.zeros(pts0.shape[0], dtype)
    for lv in range(levels - 1, -1, -1):
        s = 2.0**lv
        p_lv = pts0 / s
        guess, ok, err = _lk_level(pyr0[lv], pyr1[lv], p_lv, guess, ok, half, iters, dtype)
        if lv > 0:
            guess = guess * 2.0
    H, W = img0.shape
    inb = (
        (guess[:, 0] >= 1)
        & (guess[:, 0] < W - 1)
        & (guess[:, 1] >= 1)
        & (guess[:, 1] < H - 1)
    )
    ok = ok & inb & (err < 30.0)
    return guess, ok, err
