"""Pallas kernels vs jnp references (interpret mode on CPU exercises the
kernel bodies; the TPU bench runs them compiled)."""

import numpy as np
import jax
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


def test_proj_rows_kernel_matches_fast_path(rng):
    """Fused projection-evaluation kernel (ops/proj_pallas.py, interpret on
    CPU) vs the component-planes reference (solver/proj_fast.py)."""
    from isvins_tpu.ops.proj_pallas import proj_rows_pallas
    from isvins_tpu.solver.proj_fast import eval_proj_rows

    N, B = 300, 6
    f32 = np.float32
    q = rng.normal(size=(B, 4)); q /= np.linalg.norm(q, axis=1, keepdims=True)
    P = rng.normal(size=(B, 3)) * 2.0
    idx_i = rng.integers(0, B, N)
    idx_j = rng.integers(0, B, N)
    pts_i = np.concatenate([rng.normal(size=(N, 2)) * 0.3, np.ones((N, 1))], 1)
    pts_j = np.concatenate([rng.normal(size=(N, 2)) * 0.3, np.ones((N, 1))], 1)
    qic = np.array([0.99, 0.05, -0.08, 0.03]); qic /= np.linalg.norm(qic)
    tic = np.array([0.02, -0.01, 0.015])
    dep = np.abs(rng.normal(size=N)) * 4.0 + 0.5
    valid = rng.random(N) > 0.15

    args = (
        jnp.asarray(pts_i, f32), jnp.asarray(pts_j, f32),
        jnp.asarray(P[idx_i], f32), jnp.asarray(q[idx_i], f32),
        jnp.asarray(P[idx_j], f32), jnp.asarray(q[idx_j], f32),
        jnp.asarray(tic, f32), jnp.asarray(qic, f32),
        jnp.asarray(dep, f32), jnp.asarray(valid),
    )
    ref = eval_proj_rows(*args)
    out = proj_rows_pallas(*args)
    for o, r, name in zip(out, ref, ("r", "J_pi", "J_pj", "J_dep")):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), rtol=3e-4, atol=1e-4, err_msg=name
        )

    # vmap falls back to the reference implementation (batch rule)
    vargs = jax.tree_util.tree_map(lambda a: jnp.stack([a, a]), args)
    vout = jax.vmap(proj_rows_pallas)(*vargs)
    np.testing.assert_allclose(
        np.asarray(vout[0][0]), np.asarray(ref[0]), rtol=3e-4, atol=1e-4
    )


def test_linstep_kernel_matches_reference(rng):
    """Fused LM linear-step kernel (ops/linstep_pallas.py, interpret on CPU)
    vs the XLA reference: Schur correction + damping + Cholesky + solves."""
    from isvins_tpu.ops.linstep_pallas import linstep_pallas, linstep_ref

    B = 18
    n_pose = 6 * B
    D = 15 * B + 6
    Dr = n_pose + 6
    F = 1000
    A = rng.normal(size=(D, D + 60))
    H0 = A @ A.T + 200 * np.eye(D)
    W = rng.normal(size=(F, Dr)).astype(np.float32)
    h = (np.abs(rng.normal(size=F)) * 5 + 0.5).astype(np.float32)
    # embed the landmark information in H so the Schur complement stays SPD
    # (in the solver H is the full J^T J, which always dominates W^T W / h)
    C = (W / h[:, None]).T @ W
    ex0 = D - 6
    H = H0.copy()
    H[:n_pose, :n_pose] += C[:n_pose, :n_pose]
    H[:n_pose, ex0:] += C[:n_pose, n_pose:]
    H[ex0:, :n_pose] += C[n_pose:, :n_pose]
    H[ex0:, ex0:] += C[n_pose:, n_pose:]
    H = H.astype(np.float32)
    b = rng.normal(size=D).astype(np.float32)
    bl = rng.normal(size=F).astype(np.float32)
    lam = jnp.asarray(1e-3, jnp.float32)
    args = (jnp.asarray(H), jnp.asarray(b), jnp.asarray(W), jnp.asarray(h),
            jnp.asarray(bl), lam)

    dx_r, dl_r = linstep_ref(*args, n_pose, D)
    dx_p, dl_p = linstep_pallas(*args, n_pose)
    scale = np.abs(np.asarray(dx_r)).max()
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_r),
                               atol=2e-3 * scale, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(dl_p), np.asarray(dl_r),
                               atol=2e-3 * np.abs(np.asarray(dl_r)).max(),
                               rtol=2e-3)

    # vmap falls back to the batched XLA reference
    vargs = jax.tree_util.tree_map(lambda a: jnp.stack([a, a]), args)
    vdx, vdl = jax.vmap(lambda *a: linstep_pallas(*a, n_pose))(*vargs)
    np.testing.assert_allclose(np.asarray(vdx[0]), np.asarray(dx_r),
                               atol=1e-5 * scale, rtol=1e-5)

    # batch-vectorized TPU path (interpret mode on CPU): the batched Pallas
    # Cholesky/triangular-solve kernel + XLA batched Schur correction must
    # match vmap(linstep_ref) (on TPU it replaces XLA's batched Cholesky
    # chain; selected by linstep_pallas' custom-vmap rule)
    from isvins_tpu.ops.linstep_pallas import _linstep_batched

    lam_b = jnp.asarray([1e-4, 1e-1], jnp.float32)
    bdx, bdl = _linstep_batched(*vargs[:5], lam_b, n_pose)
    rdx, rdl = jax.vmap(
        lambda *a: linstep_ref(*a, n_pose, D))(*vargs[:5], lam_b)
    np.testing.assert_allclose(np.asarray(bdx), np.asarray(rdx),
                               atol=2e-3 * scale, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(bdl), np.asarray(rdl),
                               atol=2e-3 * np.abs(np.asarray(rdl)).max(),
                               rtol=2e-3)


def test_imu_rows_kernel_matches_vmap_path(rng):
    """Fused IMU evaluation kernel (ops/imu_pallas.py, interpret on CPU) vs
    the vmapped reference (factors/preintegration.imu_residual_jacobians).
    NB on real TPU the XLA path's small matmuls run at bf16 default
    precision, so the kernel (exact f32 VPU) is the MORE accurate of the
    two; interpret-mode comparison is f32-exact."""
    import isvins_tpu.solver.window as Wm
    from isvins_tpu.parallel import make_batch_problem
    from isvins_tpu.solver import WindowDims

    dims = WindowDims(B=10, Vo=4, F=64, N=256)
    state, imu, proj, priors, G, psi = make_batch_problem(1, dims, dtype=jnp.float32)
    sq = lambda t: jax.tree_util.tree_map(lambda a: a[0], t)
    st, im = sq(state), sq(imu)
    old = Wm.USE_PALLAS_IMU
    try:
        Wm.USE_PALLAS_IMU = False
        r0, J0, c0 = Wm._eval_imu(st, im, G, dims)
        Wm.USE_PALLAS_IMU = True
        r1, J1, c1 = Wm._eval_imu(st, im, G, dims)
    finally:
        Wm.USE_PALLAS_IMU = old
    rs = float(jnp.abs(r0).max())
    Js = float(jnp.abs(J0).max())
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0),
                               atol=2e-6 * rs, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(J1), np.asarray(J0),
                               atol=2e-6 * Js, rtol=1e-5)
