"""Per-stage timing of the window-solve LM iteration on the current backend.

Times each stage of build_normal_equations + the linear-solve step as its own
jitted function (warm, 30 reps) and compares their sum to the measured
per-iteration marginal of the full solve. Stages whose time vanishes inside
the full solve are fused/overlapped by XLA; stages that dominate here
dominate there.
"""

import time

import jax
import jax.numpy as jnp

from isvins_tpu.parallel import make_batch_problem
from isvins_tpu.solver import WindowDims, solve_window
from isvins_tpu.solver.window import (
    _eval_imu,
    _eval_priors,
    _eval_proj,
    build_normal_equations,
    retract_state,
)


def _t(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    dims = WindowDims(B=18, Vo=8, F=1000, N=3072)
    state, imu, proj, priors, G, psi = make_batch_problem(1, dims, dtype=jnp.float32)
    sq = lambda tree: jax.tree_util.tree_map(lambda a: a[0], tree)
    st, im, pr, pri = sq(state), sq(imu), sq(proj), sq(priors)

    B, D, F = dims.B, dims.D, dims.F
    Dr = 6 * B + 6
    dtype = st.P.dtype

    stages = {}
    stages["eval_imu"] = _t(jax.jit(lambda s: _eval_imu(s, im, G, dims)), st)
    stages["eval_proj"] = _t(
        jax.jit(lambda s: _eval_proj(s, pr, psi, dims, False)), st
    )
    stages["eval_priors"] = _t(jax.jit(lambda s: _eval_priors(s, pri, dims)), st)
    stages["build_full"] = _t(
        jax.jit(lambda s: build_normal_equations(s, im, pr, pri, G, psi, dims)), st
    )

    ne = jax.jit(lambda s: build_normal_equations(s, im, pr, pri, G, psi, dims))(st)
    H, b, h, W, b_l, _ = ne

    def linstep(H, b, h, W, b_l, lam):
        h_d = h * (1.0 + lam)
        h_safe = jnp.where(h_d > 1e-12, h_d, 1.0)
        Wh = W / h_safe[:, None]
        C = W.T @ Wh
        c_b = W.T @ (b_l / h_safe)
        H_s = H
        H_s = H_s.at[: 6 * B, : 6 * B].add(-C[: 6 * B, : 6 * B])
        H_s = H_s.at[: 6 * B, 15 * B :].add(-C[: 6 * B, 6 * B :])
        H_s = H_s.at[15 * B :, : 6 * B].add(-C[6 * B :, : 6 * B])
        H_s = H_s.at[15 * B :, 15 * B :].add(-C[6 * B :, 6 * B :])
        b_s = b.at[: 6 * B].add(-c_b[: 6 * B])
        b_s = b_s.at[15 * B :].add(-c_b[6 * B :])
        diagH = jnp.clip(jnp.diag(H), 1e-8, None)
        H_d = H_s + jnp.diag(lam * diagH)
        L = jnp.linalg.cholesky(
            H_d + 1e-12 * jnp.trace(H_d) / D * jnp.eye(D, dtype=dtype)
        )
        dx = jax.scipy.linalg.cho_solve((L, True), b_s)
        dx_r = jnp.concatenate([dx[: 6 * B], dx[15 * B :]])
        dl = (b_l - W @ dx_r) / h_safe
        return dx, dl

    lam = jnp.asarray(1e-4, dtype)
    stages["schur+chol+solve"] = _t(jax.jit(linstep), H, b, h, W, b_l, lam)

    def cholonly(H_d):
        L = jnp.linalg.cholesky(H_d)
        return jax.scipy.linalg.cho_solve((L, True), b)

    H_d = H + jnp.eye(D, dtype=dtype)
    stages["chol+trisolve_only"] = _t(jax.jit(cholonly), H_d)

    dx, dl = jax.jit(linstep)(H, b, h, W, b_l, lam)
    stages["retract"] = _t(
        jax.jit(lambda s, dx, dl: retract_state(s, dx, dl, dims)), st, dx, dl
    )

    fn10 = jax.jit(
        lambda s: solve_window(s, im, pr, pri, G, psi, dims, iters=10)
    )
    fn20 = jax.jit(
        lambda s: solve_window(s, im, pr, pri, G, psi, dims, iters=20)
    )
    t10 = _t(fn10, st, n=20)
    t20 = _t(fn20, st, n=10)
    stages["full_solve_10it"] = t10
    stages["per_iter_marginal"] = (t20 - t10) / 10

    for k, v in stages.items():
        print(f"{k:24s} {v:8.3f} ms")


if __name__ == "__main__":
    main()
