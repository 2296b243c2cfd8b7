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

import jax as _jax

try:  # must happen before any array is created; harmless if already set
    _jax.config.update("jax_enable_x64", True)
except Exception:  # pragma: no cover
    pass

__version__ = "0.1.0"
