"""Benchmark: steady-state VIO window-solve throughput on the available
accelerator (frames/s per chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference budgets <= 8 ms of Ceres DENSE_SCHUR/DOGLEG per frame
(config/euroc_config.yaml:49, estimator.cpp:1124–1128) => 125 frames/s on its
CPU. We time the identical problem shape — 18-frame window, 1000 landmarks,
3072 projection factors, 10 LM iterations — as one jitted device step in
float32 and report frames/s; vs_baseline = ours / 125.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from isvins_tpu.parallel import make_batch_problem
    from isvins_tpu.solver import WindowDims, solve_window

    dims = WindowDims(B=18, Vo=8, F=1000, N=3072)
    state, imu, proj, priors, G, psi = make_batch_problem(1, dims, dtype=jnp.float32)
    sq = lambda tree: jax.tree_util.tree_map(lambda a: a[0], tree)
    state, imu, proj, priors = sq(state), sq(imu), sq(proj), sq(priors)

    fn = jax.jit(
        lambda st, im, pr, pri: solve_window(st, im, pr, pri, G, psi, dims, iters=10)
    )
    # warmup / compile
    out = fn(state, imu, proj, priors)
    jax.block_until_ready(out)

    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(state, imu, proj, priors)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n

    frames_per_s = 1.0 / dt
    baseline = 125.0  # frames/s implied by the reference's 8 ms solver budget
    print(
        json.dumps(
            {
                "metric": "vio_window_solve_frames_per_s",
                "value": round(frames_per_s, 2),
                "unit": "frames/s (18-frame window, 1000 lm, 3072 obs, 10 LM iters, fp32)",
                "vs_baseline": round(frames_per_s / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
