"""Visual-inertial initialization primitives (reference src/initial/*):
batched essential-matrix RANSAC (replaces solve_5pts.cpp's F-RANSAC +
recoverPose), Gauss-Newton PnP (replaces cv::solvePnP), global SfM built on
the window solver, and the gyro-bias / gravity / scale / velocity alignment."""

from .five_point import solve_relative_pose  # noqa: F401
from .pnp import pnp_gn, pnp_ransac_gn  # noqa: F401
from .alignment import (  # noqa: F401
    linear_alignment,
    refine_gravity,
    solve_gyroscope_bias,
)
