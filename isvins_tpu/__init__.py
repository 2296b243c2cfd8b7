"""isvins_tpu — a TPU-native visual-inertial SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of IS-VINS
(lyeemax/IS-VINS, reference mounted at /root/reference): optical-flow feature
tracking, IMU preintegration, sliding-window nonlinear least-squares VIO with
two-stage marginalization + information sparsification, and an
information-structured pose graph with loop closure and online covariance.

Design stance (see SURVEY.md §7): keep the *math contract* of the reference
(factor residuals, two-stage marginalization semantics, window sizes), replace
the *architecture* — Ceres residual blocks become batched, statically-shaped
factor kernels; pointer-rich track lists become fixed-capacity SoA arrays with
validity masks; the 7-thread queue topology becomes a host driver streaming
frames into jitted device super-steps.

Precision policy: the small, numerically delicate linear algebra
(marginalization eigendecompositions, ≤60×60) runs in float64; the batched hot
paths (factor evaluation, Schur, image kernels, Hamming matching) are float32/
bfloat16 on TPU. We enable x64 globally so host-side math defaults to double;
device kernels cast explicitly.
"""

import os as _os

import jax as _jax

try:  # must happen before any array is created; harmless if already set
    _jax.config.update("jax_enable_x64", True)
except Exception:  # pragma: no cover
    pass

__version__ = "0.1.0"


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache (call BEFORE the first jit).

    Called by the TPU drivers (bench.py, run_euroc.py). On the remote-TPU
    (axon) runtime the tradeoff depends on program size: tiny programs load
    slower from cache than they compile (10.3 s hit vs 1.1 s cold), but the
    product-path programs are large — the fused tracker step alone costs
    90-190 s to compile remotely AND the remote compile helper occasionally
    wedges outright (observed >9 min hangs on the same program that compiled
    in 90 s on retry) — so a warm cache turns a flaky multi-minute ramp into
    a deterministic ~10 s one (measured: tracker frame-0 ramp 193 s cold ->
    12 s warm). min_compile_time_secs=0.5 keeps the trivial programs out of
    the cache, preserving the small-program fast path.

    Deliberately not enabled at import time: CPU-only processes (pytest, CI)
    would load CPU AOT entries written by a TPU process, whose XLA:CPU
    target flags differ (prefer-no-scatter/-no-gather) and trip
    machine-feature mismatch errors."""
    if cache_dir is None:
        cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir is None:
        # key the default dir by host CPU identity: XLA:CPU AOT entries baked
        # for another machine's vector features SIGILL-warn (and slow-load)
        # when a TPU-process's CPU-backend programs hit them, and the same
        # /tmp may persist across differently-featured hosts
        import hashlib as _hashlib
        import platform as _platform
        try:
            with open("/proc/cpuinfo") as f:
                flags = next((ln for ln in f if ln.startswith("flags")), "")
        except OSError:
            flags = _platform.processor()
        h = _hashlib.sha1(flags.encode()).hexdigest()[:10]
        cache_dir = f"/tmp/isvins_jax_cache_{h}"
    d = cache_dir
    _jax.config.update("jax_compilation_cache_dir", d)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
