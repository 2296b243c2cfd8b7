"""Factor library: residual + analytic tangent-space Jacobian functions for all
six factor families of the reference (SURVEY.md §2 rows 6–15), as pure batched
functions. The solver consumes the *minimal-coordinate* Jacobians (6-dof pose,
9-dof speed/bias, 1-dof inverse depth); there is no Ceres-style 7-dof ambient
parameterization anywhere.
"""

from .preintegration import (  # noqa: F401
    ImuNoise,
    Preintegration,
    integrate_segment,
    imu_residual,
    imu_residual_jacobians,
)
from .projection import projection_residual, projection_residual_jacobians  # noqa: F401
from .priors import (  # noqa: F401
    relpose_residual,
    relpose_residual_jacobians,
    relpose_update,
    se3_prior_residual,
    se3_prior_residual_jacobians,
    se3_prior_update,
    linear9_residual_jacobians,
    rollpitch_residual,
    rollpitch_residual_jacobians,
    rollpitch_update,
    yaw_residual_jacobians,
)
