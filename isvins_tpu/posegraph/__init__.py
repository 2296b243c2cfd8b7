"""Pose graph + loop closure: BRIEF descriptors and batched XOR-popcount
Hamming matching (replaces DVision BRIEF + DBoW2), fixed-capacity keyframe
database with global-descriptor retrieval, dense on-device pose-graph
Gauss-Newton with per-pose covariance (replaces ceres SPARSE_NORMAL_CHOLESKY
+ ceres::Covariance), and the builder orchestration (SURVEY.md §2 rows 21–23).
"""

from .brief import (  # noqa: F401
    brief_descriptors,
    hamming_matrix,
    make_brief_pattern,
    match_descriptors,
)
from .keyframe_db import KeyframeDB  # noqa: F401
from .optimize import optimize_pose_graph  # noqa: F401
from .builder import PoseGraphBuilder  # noqa: F401
