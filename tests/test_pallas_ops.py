"""Pallas kernels vs jnp references (interpret mode on CPU exercises the
kernel bodies; the TPU bench runs them compiled)."""

import numpy as np
import jax.numpy as jnp

import isvins_tpu  # noqa: F401
from isvins_tpu.ops import (
    retrieval_scores_pallas,
    retrieval_scores_ref,
    schur_reduce_pallas,
    schur_reduce_ref,
)


def test_hamming_retrieval_kernel(rng):
    R, K = 64, 48
    qd = jnp.asarray(rng.integers(0, 2**32, size=(R, 8), dtype=np.uint32))
    dbd = jnp.asarray(rng.integers(0, 2**32, size=(K, R, 8), dtype=np.uint32))
    # plant near-duplicates of the query in keyframes 3 and 17
    dbd = dbd.at[3, :, :].set(qd)
    dbd = dbd.at[17, : R // 2, :].set(qd[: R // 2])
    qv = jnp.ones(R, bool).at[-5:].set(False)
    dbv = jnp.ones((K, R), bool).at[9, :].set(False)

    ref = np.asarray(retrieval_scores_ref(qd, qv, dbd, dbv, 64))
    out = np.asarray(retrieval_scores_pallas(qd, qv, dbd, dbv, 64))
    np.testing.assert_allclose(out, ref, atol=1e-6)
    assert ref[3] > 0.9  # full duplicate
    assert 0.3 < ref[17] < 0.8  # half duplicate
    assert ref[9] == 0.0  # masked keyframe


def test_schur_corr_kernel(rng):
    """Fused per-LM-iteration Schur correction (the production solver's hot
    op, solver/window.py body) vs the jnp form, at the reduced layout."""
    from isvins_tpu.ops.schur_pallas import schur_corr_pallas, schur_corr_ref

    F, Dr = 256, 66
    W = jnp.asarray(rng.normal(size=(F, Dr)).astype(np.float32))
    h = jnp.asarray(np.abs(rng.normal(size=F)).astype(np.float32) + 0.1)
    bl = jnp.asarray(rng.normal(size=F).astype(np.float32))
    C_ref, cb_ref = schur_corr_ref(W, h, bl)
    C, cb = schur_corr_pallas(W, h, bl)
    np.testing.assert_allclose(np.asarray(C), np.asarray(C_ref), rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(cb), np.asarray(cb_ref), rtol=2e-5, atol=2e-3)


def test_solve_window_pallas_path_matches(rng):
    """solve_window with the Pallas Schur correction forced on (interpret on
    CPU) must match the XLA path."""
    import jax
    from isvins_tpu.parallel import make_batch_problem
    from isvins_tpu.solver import WindowDims, solve_window

    dims = WindowDims(B=6, Vo=3, F=32, N=64)
    state, imu, proj, priors, G, psi = make_batch_problem(1, dims, dtype=jnp.float32)
    sq = lambda tree: jax.tree_util.tree_map(lambda a: a[0], tree)
    args = (sq(state), sq(imu), sq(proj), sq(priors))

    st_x, cost_x = solve_window(*args, G, psi, dims, iters=3, use_pallas_schur=False)
    st_p, cost_p = solve_window(*args, G, psi, dims, iters=3, use_pallas_schur=True)
    np.testing.assert_allclose(float(cost_p), float(cost_x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st_p.P), np.asarray(st_x.P), atol=1e-5)


def test_schur_reduce_kernel(rng):
    D, F = 276, 1000
    A = rng.normal(size=(D, D))
    H = jnp.asarray((A + A.T).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(F, D)).astype(np.float32))
    h = jnp.asarray(np.abs(rng.normal(size=F)).astype(np.float32) + 0.1)
    h = h.at[7].set(0.0)  # empty landmark
    b = jnp.asarray(rng.normal(size=D).astype(np.float32))
    bl = jnp.asarray(rng.normal(size=F).astype(np.float32))

    Hs_ref, bs_ref = schur_reduce_ref(H, b, W, h, bl)
    Hs, bs = schur_reduce_pallas(H, b, W, h, bl)
    np.testing.assert_allclose(np.asarray(Hs), np.asarray(Hs_ref), rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(bs), np.asarray(bs_ref), rtol=2e-5, atol=2e-3)
