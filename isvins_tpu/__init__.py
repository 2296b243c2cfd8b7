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
    """Enable the persistent compilation cache (call from TPU entry points
    BEFORE the first jit). The first TPU compile of each program runs through
    the remote-compile path (~20-40 s each; the e2e pipeline compiles ~40
    programs — profiled as the entire bench ramp-up); caching them on disk
    makes every later process start in seconds.

    Deliberately NOT enabled at import time: CPU-only processes (pytest, CI)
    would otherwise load CPU AOT entries written by the TPU process, whose
    XLA:CPU target flags differ (prefer-no-scatter/-no-gather) and trip
    machine-feature mismatch errors."""
    d = cache_dir or _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/isvins_jax_cache"
    )
    _jax.config.update("jax_compilation_cache_dir", d)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
