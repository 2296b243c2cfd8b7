"""BRIEF descriptors + batched Hamming matching.

Replaces DVision::BRIEF (thirdparty/DVision/BRIEF.{h,cpp}, pattern from
config/brief_pattern.yml) and DBoW2's per-descriptor scoring with TPU-batched
kernels: descriptor extraction is one vmapped gather of 2x256 bilinear
samples per keypoint, bit packing is a (256,)->(8,)uint32 dot with powers of
two, and Hamming distance is XOR + `lax.population_count` broadcast over the
full (n_query, n_db) matrix — the engine's descriptor-matching "MXU-shaped"
workload (BASELINE.json: "DBoW binary vocabulary scoring -> TPU batched
Hamming matching").

The pattern itself is generated (seeded isotropic Gaussian pairs, the classic
BRIEF-32 recipe) rather than loaded from the reference's yml: descriptors
only ever match against our own, so the pattern is a free choice.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..frontend.image_ops import bilinear_sample, gaussian_blur


def make_brief_pattern(n_bits: int = 256, patch: float = 24.0, seed: int = 7):
    """(n_bits, 4) [ax, ay, bx, by] offsets, N(0, patch/5) clipped to patch/2."""
    rng = np.random.default_rng(seed)
    off = rng.normal(scale=patch / 5.0, size=(n_bits, 4))
    return np.clip(off, -patch / 2, patch / 2)


_PS = 28  # patch side: offsets are clipped to +-12, bilinear needs +1, pad 2


@functools.lru_cache(maxsize=4)
def _selection_matrices(pattern_bytes: bytes, n_bits: int):
    """Constant (n_bits, PS*PS) bilinear-weight matrices for the a/b sample
    points of the pattern, evaluated at the patch center. Sampling the fixed
    pattern then becomes patches @ S.T — two small matmuls on the MXU
    instead of 2*n_bits gathers per keypoint (the gather path cost ~180 ms
    per 512-point keyframe on a v5e; this is <1 ms)."""
    pattern = np.frombuffer(pattern_bytes, np.float64).reshape(n_bits, 4)

    def mat(off):
        x = off[:, 0] + _PS // 2
        y = off[:, 1] + _PS // 2
        x0 = np.floor(x).astype(int)
        y0 = np.floor(y).astype(int)
        fx = (x - x0).astype(np.float32)
        fy = (y - y0).astype(np.float32)
        M = np.zeros((n_bits, _PS * _PS), np.float32)
        rows = np.arange(n_bits)
        for dy in (0, 1):
            for dx in (0, 1):
                w = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                np.add.at(M, (rows, (y0 + dy) * _PS + (x0 + dx)), w)
        return M

    return mat(pattern[:, :2]), mat(pattern[:, 2:])


def brief_descriptors(img, pts, valid, pattern):
    """img (H,W) float, pts (N,2) pixel coords, pattern (256,4) NUMPY (the
    constant selection matrices are built from it at trace time).
    Returns (N, 8) uint32 packed descriptors (keyframe.cpp:43–69 equivalent;
    the image is pre-smoothed like classic BRIEF).

    Points are rounded to the pixel grid before patch extraction (BRIEF
    compares blurred intensities; sub-pixel shifts are below its noise
    floor) so every keypoint samples the pattern through the same two
    constant matrices."""
    pattern = np.asarray(pattern, np.float64)
    Sa, Sb = _selection_matrices(pattern.tobytes(), pattern.shape[0])
    return _brief_inner(img, pts, valid, jnp.asarray(Sa), jnp.asarray(Sb))


@jax.jit
def _brief_inner(img, pts, valid, Sa, Sb):
    H, W = img.shape
    sm = gaussian_blur(img.astype(jnp.float32), 2.0, 4)
    c = jnp.round(pts).astype(jnp.int32) - _PS // 2
    cx = jnp.clip(c[:, 0], 0, W - _PS)
    cy = jnp.clip(c[:, 1], 0, H - _PS)

    def patch(x, y):
        return jax.lax.dynamic_slice(sm, (y, x), (_PS, _PS)).reshape(-1)

    P = jax.vmap(patch)(cx, cy)  # (N, PS*PS)
    va = P @ Sa.T  # (N, n_bits)
    vb = P @ Sb.T
    bits = (va < vb).astype(jnp.uint32)
    words = bits.reshape(bits.shape[0], 8, 32)
    pow2 = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    desc = jnp.sum(words * pow2, axis=2, dtype=jnp.uint32)
    return jnp.where(valid[:, None], desc, jnp.uint32(0))


@jax.jit
def hamming_matrix(desc_a, desc_b):
    """(Na,8),(Nb,8) uint32 -> (Na,Nb) int32 Hamming distances."""
    x = jnp.bitwise_xor(desc_a[:, None, :], desc_b[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


@jax.jit
def match_descriptors(desc_a, valid_a, desc_b, valid_b):
    """Best match in b for each a. Returns (best_idx (Na,), best_dist (Na,));
    invalid entries get dist 512 (keyframe.cpp searchInAera semantics)."""
    d = hamming_matrix(desc_a, desc_b)
    d = jnp.where(valid_b[None, :], d, 512)
    best = jnp.argmin(d, axis=1)
    dist = jnp.min(d, axis=1)
    dist = jnp.where(valid_a, dist, 512)
    return best.astype(jnp.int32), dist


@jax.jit
def match_descriptors_clean(desc_a, valid_a, desc_b, valid_b,
                            ham_thresh=64, ratio=0.9):
    """Best match in b for each a, with Lowe ratio test + mutual cross-check
    (the reference's single-threshold searchInAera, keyframe.cpp:92, has no
    match-precision control; with BRIEF on repetitive texture the raw
    nearest-neighbor set is 50%+ false, which starves the PnP RANSAC —
    measured on the loop-closure e2e world the cleaned set is ~90% inliers).
    Returns (best_idx (Na,), keep_mask (Na,))."""
    d = hamming_matrix(desc_a, desc_b)
    d = jnp.where(valid_b[None, :], d, 512)
    d = jnp.where(valid_a[:, None], d, 512)
    best = jnp.argmin(d, axis=1)
    dist = jnp.min(d, axis=1)
    # second-best for the ratio test
    d2 = d.at[jnp.arange(d.shape[0]), best].set(512)
    dist2 = jnp.min(d2, axis=1)
    keep = valid_a & (dist < ham_thresh) & (dist < ratio * dist2)
    # cross-check: a must also be b's nearest query
    rev = jnp.argmin(d, axis=0)  # (Nb,)
    keep &= rev[best] == jnp.arange(d.shape[0])
    return best.astype(jnp.int32), keep


@jax.jit
def global_descriptor(desc, valid):
    """(D,8) uint32 packed -> (256,) float mean-bit signature for retrieval
    (the DBoW replacement: cosine similarity on bit statistics)."""
    bits = ((desc[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)[None, None, :]) & 1).astype(
        jnp.float32
    )  # (D,8,32)
    bits = bits.reshape(desc.shape[0], 256)
    w = valid.astype(jnp.float32)
    m = jnp.sum(bits * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    # center and normalize
    c = m - 0.5
    return c / jnp.maximum(jnp.linalg.norm(c), 1e-9)
