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

    NOT used by the TPU entry points in this deployment: on the remote-TPU
    (axon) runtime, LOADING a cached executable is ~10x slower than
    compiling it (measured: 10.3 s cache-hit vs 1.1 s cold compile for a
    trivial program; multi-minute stalls for the window solver), so a warm
    cache makes every process start strictly slower. Benches therefore
    measure steady-state inside one process (robust median over post-compile
    frames) instead of relying on warm restarts. On a standard local TPU
    runtime this helper is the right thing to call from drivers.

    Also deliberately not enabled at import time: CPU-only processes
    (pytest, CI) would load CPU AOT entries written by a TPU process, whose
    XLA:CPU target flags differ (prefer-no-scatter/-no-gather) and trip
    machine-feature mismatch errors."""
    d = cache_dir or _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/isvins_jax_cache"
    )
    _jax.config.update("jax_compilation_cache_dir", d)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
