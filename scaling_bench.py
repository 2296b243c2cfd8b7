"""Multi-device scaling measurement for the distributed pose-graph solve and
the data-parallel window solver.

Methodology note (why raw "efficiency" on a virtual CPU mesh is meaningless):
with `--xla_force_host_platform_device_count=N` all N devices SHARE this
host's physical cores, and the 1-device baseline already uses every core via
XLA's intra-op thread pool. Any replicated computation (the dense Cholesky
each device runs identically) then shows up as N-fold *extra* work on the
same cores — an artifact of the emulation, not of the algorithm; on real
multi-chip hardware replicated work is free (each chip computes its own copy
concurrently) and the collective rides ICI.

So this bench reports what IS meaningful on the emulated mesh:

  1. measured wall-clock per device count (with the caveat above),
  2. a PHASE DECOMPOSITION — the edge-sharded assembly phase measured alone
     at full and 1/nd shard sizes (it must shrink ~linearly: that is the
     distributed design working), and the replicated dense-solve phase
     measured alone (constant per device),
  3. the collective's exact byte volume per GN iteration, and an
     Amdahl-style multi-chip projection: eff(nd) from the measured phase
     times plus an analytic ICI all-reduce term
     (2*(nd-1)/nd * bytes / BW_ICI, BW ~4.5e10 B/s per v5e link).

Writes SCALING_r03.json.
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

ICI_BW = 4.5e10  # bytes/s, one v5e ICI link direction


def _time(fn, n=3):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def _posegraph_problem(K, E, n_loops, rng):
    t = jnp.asarray(np.cumsum(rng.normal(size=(K, 3)) * 0.05, axis=0))
    q = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (K, 1))
    e_i = jnp.asarray(np.minimum(np.arange(E), K - 2), jnp.int32)
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
    L = max(64, n_loops)
    loop_i = jnp.asarray(rng.integers(0, K // 2, L), jnp.int32)
    loop_j = jnp.asarray(rng.integers(K // 2, K - 1, L), jnp.int32)
    loop_dt = jnp.asarray(rng.normal(size=(L, 3)) * 0.05)
    loop_dq = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (L, 1))
    loop_w = jnp.ones(L) * 100.0
    loop_valid = jnp.ones(L, bool)
    return dict(t=t, q=q, active=active, fixed=fixed,
                e=(e_i, e_j, e_dt, e_dq, e_sqrt, e_valid),
                rp=(rp_i, rp_q, rp_sqrt, rp_valid),
                loop=(loop_i, loop_j, loop_dt, loop_dq, loop_w, loop_valid))


def bench_posegraph(K=256, E=None, n_loops=64, iters=3, with_cov=False,
                    phases_only=False):
    """Edge-sharded distributed pose-graph GN: measured totals per device
    count + phase decomposition + analytic multi-chip projection.
    phases_only skips the virtual-mesh sweep (for K where the emulated f64
    dense solve is minutes per call) and keeps the decomposition/projection."""
    from isvins_tpu.factors.priors import relpose_residual_jacobians  # noqa: F401
    from isvins_tpu.parallel import make_mesh
    from isvins_tpu.parallel.distributed import (
        _edge_rows, distributed_pose_graph_solve)

    E = E or K
    rng = np.random.default_rng(0)
    p = _posegraph_problem(K, E, n_loops, rng)
    D = 6 * K
    dtype = p["t"].dtype

    n_dev_avail = len(jax.devices())
    devs, times = [], []
    nd = 1
    if phases_only:
        devs = [1, 2, 4, 8]
    while not phases_only and nd <= min(8, n_dev_avail):
        mesh = make_mesh(nd)
        run = lambda: distributed_pose_graph_solve(
            mesh, p["t"], p["q"], p["active"], p["fixed"],
            *p["e"], *p["rp"], *p["loop"], iters=iters, with_cov=with_cov,
        )
        dt = _time(run, n=2)
        devs.append(nd)
        times.append(dt * 1e3)
        print(f"# posegraph K={K} cov={with_cov} {nd} device(s): "
              f"{dt*1e3:.1f} ms", file=sys.stderr)
        nd *= 2

    # ---- phase decomposition (single device, measured alone) ------------
    e_i, e_j, e_dt, e_dq, e_sqrt, e_valid = p["e"]

    def asm(n_edges):
        f = jax.jit(lambda tt, qq: _edge_rows(
            tt, qq, e_i[:n_edges], e_j[:n_edges], e_dt[:n_edges],
            e_dq[:n_edges], e_sqrt[:n_edges], e_valid[:n_edges], K, dtype)[0])
        return _time(lambda: f(p["t"], p["q"]), n=3)

    t_asm_full = asm(E)
    t_asm_shard = asm(max(E // 8, 1))
    chol = jax.jit(lambda H, b: jax.scipy.linalg.cho_solve(
        (jnp.linalg.cholesky(H), True), b))
    Hd = jnp.eye(D, dtype=dtype) * (D + 2.0)
    t_chol = _time(lambda: chol(Hd, jnp.ones(D, dtype=dtype)), n=3)

    # collective volume per GN iteration: psum of H + b + cost
    bytes_per_iter = (D * D + D + 1) * dtype.itemsize
    proj = {}
    for nd in devs:
        t_ici = 2 * (nd - 1) / nd * bytes_per_iter / ICI_BW
        t1 = iters * (t_asm_full + t_chol)
        tn = iters * (t_asm_full / nd + t_chol + t_ici)
        proj[str(nd)] = round(t1 / (nd * tn), 3)

    return {
        "K": K, "E": E, "loops": 64, "iters": iters, "with_cov": with_cov,
        "devices": devs, "measured_ms_virtual_mesh": [round(x, 2) for x in times],
        "phase_ms": {
            "assembly_full_E": round(t_asm_full * 1e3, 2),
            "assembly_E_over_8": round(t_asm_shard * 1e3, 2),
            "replicated_cholesky_solve": round(t_chol * 1e3, 2),
        },
        "collective_bytes_per_iter": int(bytes_per_iter),
        "projected_multichip_efficiency": proj,
        "projection_model": "eff(nd) = t1/(nd*tn); tn = iters*(asm/nd + chol"
                            " + 2(nd-1)/nd * bytes/4.5e10). Replicated chol"
                            " is concurrent (free) on real chips; on the"
                            " shared-core virtual mesh it multiplies instead"
                            " — hence measured_ms there anti-scales.",
    }


def bench_window_dp():
    """Data-parallel window solves (BASELINE configs[4-5]): a batch of 16
    product-shape problems (B=18, F=1000, N=3072) sharded over 1/2/4/8
    devices. Strong scaling: fixed total work. Embarrassingly parallel (no
    collectives inside the solve), so on real chips efficiency is ~1.0 by
    construction; the virtual-mesh numbers only check the plumbing."""
    from isvins_tpu.parallel import make_mesh, make_batch_problem
    from isvins_tpu.parallel.sharded import sharded_batch_solve
    from isvins_tpu.solver import WindowDims

    dims = WindowDims(B=18, Vo=8, F=1000, N=3072)
    NB = 16
    state, imu, proj, priors, G, psi = make_batch_problem(NB, dims, dtype=jnp.float32)
    n_dev_avail = len(jax.devices())
    devs, times = [], []
    nd = 1
    while nd <= min(8, n_dev_avail):
        mesh = make_mesh(nd)
        step, shard = sharded_batch_solve(mesh, dims, iters=5)
        args = shard((state, imu, proj, priors))
        dt = _time(lambda: step(*args, G, psi), n=3)
        devs.append(nd)
        times.append(dt * 1e3)
        print(f"# window-dp {nd} device(s): {dt*1e3:.1f} ms for {NB} solves",
              file=sys.stderr)
        nd *= 2
    return {
        "batch": NB, "dims": "B=18,F=1000,N=3072,iters=5",
        "devices": devs, "measured_ms_virtual_mesh": [round(x, 2) for x in times],
        "collectives_inside_solve": 0,
        "note": "zero-collective data parallelism: multi-chip efficiency is"
                " bounded only by per-chip solve time (see BENCH batched_x8)",
    }


def main():
    import isvins_tpu  # noqa: F401  (x64 config)

    cores = os.cpu_count() or 1
    out = {
        "metric": "multi_device_scaling",
        "cores": cores,
        "note": "virtual CPU mesh: devices share physical cores and the"
                " 1-device baseline already uses all of them (XLA intra-op"
                " threading), so measured_ms columns are plumbing checks,"
                " not hardware efficiency. The phase decomposition +"
                " projected_multichip_efficiency fields carry the scaling"
                " story; the collective path (shard_map+psum) is identical"
                " to multi-chip ICI.",
        "posegraph_assembly_small": bench_posegraph(K=32, E=2048, iters=1),
        "posegraph_product_scale": bench_posegraph(K=256, iters=3),
        "posegraph_product_cov_sharded": bench_posegraph(K=256, iters=3,
                                                         with_cov=True),
        # full-session scale (VERDICT r02 #5): phase decomposition +
        # projection only — the K=1024 f64 dense solve is minutes per call
        # on the emulated mesh, and the mesh sweep adds nothing over the
        # decomposition there
        "posegraph_K1024_phases": bench_posegraph(K=1024, iters=3,
                                                  phases_only=True),
        "window_solve_data_parallel": bench_window_dp(),
    }
    print(json.dumps(out))
    with open("SCALING_r03.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
