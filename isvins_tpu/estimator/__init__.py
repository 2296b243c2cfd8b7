"""Sliding-window VIO estimator: two-stage marginalization + information
sparsification (the IS scheme), window bookkeeping, initialization chain, and
the host-side step driver."""

from .marginalization import (  # noqa: F401
    PoseGraphPacket,
    init_sparsify,
    marg_backward,
    marg_forward,
)
