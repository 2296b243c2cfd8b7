"""Profile the batched x8 window solve on the TPU: one traced run, then a
per-op duration summary from the chrome trace (the technique that caught the
(N,2,6B) layout copies in round 3). Usage: python profile_batched.py [NB]
"""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

import isvins_tpu  # noqa: F401  (x64 config)


def main(NB=8):
    from isvins_tpu.parallel import make_batch_problem
    from isvins_tpu.solver import WindowDims, solve_window

    dims = WindowDims(B=18, Vo=8, F=1000, N=3072)
    state, imu, proj, priors, G, psi = make_batch_problem(NB, dims, dtype=jnp.float32)
    fnB = jax.jit(
        jax.vmap(
            lambda st, im, pr, pri: solve_window(st, im, pr, pri, G, psi, dims, iters=10)
        )
    )
    out = fnB(state, imu, proj, priors)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = fnB(state, imu, proj, priors)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    print(f"batched x{NB}: {dt*1e3:.3f} ms -> {NB/dt:.1f} fps", file=sys.stderr)

    trace_dir = "/tmp/jax_trace_batched"
    with jax.profiler.trace(trace_dir):
        out = fnB(state, imu, proj, priors)
        jax.block_until_ready(out)

    paths = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace found", file=sys.stderr)
        return
    ev = json.load(gzip.open(paths[-1]))["traceEvents"]
    dur = defaultdict(float)
    cnt = defaultdict(int)
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            # keep only device lanes (XLA ops), skip python/runtime threads
            name = e.get("name", "")
            args = e.get("args") or {}
            if "run_id" in args or "program_id" in args or name.startswith("fusion") \
               or "%" in str(args.get("long_name", "")):
                dur[name] += e["dur"]
                cnt[name] += 1
    total = sum(dur.values())
    print(f"total device-op time {total/1e3:.2f} ms")
    for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{d/1e3:9.3f} ms  x{cnt[name]:<5d} {name}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
