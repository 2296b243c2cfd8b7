"""Visual-inertial initialization chain (reference src/initial/*,
estimator.cpp:239–429): IMU-excitation check, relative pose from the 5-point
algorithm, global SfM, PnP chaining, gyro-bias estimation, linear
velocity/gravity/scale alignment, and gravity refinement.

`initial_structure(est)` is the entry called by the Estimator when the window
first fills. Tests/benches may install `est._gt_init` to bypass it.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def initial_structure(est) -> bool:
    """estimator.cpp:239–355. Returns True when the window states (Ps, Qs,
    Vs, Bgs, scaled landmarks, gravity-aligned frame) are initialized."""
    hook = getattr(est, "_gt_init", None)
    if hook is not None:
        hook(est)
        return True

    from .vi_init import run_visual_inertial_init

    return run_visual_inertial_init(est)
