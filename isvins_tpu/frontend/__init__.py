"""TPU-native frontend: batched pinhole+radtan camera model, image kernels
(blur/pyramid/CLAHE/Shi-Tomasi), pyramidal Lucas-Kanade tracking, and the
feature tracker orchestration (replaces src/feature_tracker/* + OpenCV +
camodocal; SURVEY.md §2 rows 4 and the thirdparty camera_models row)."""

from .camera import PinholeRadtan  # noqa: F401
from .tracker import FeatureTracker  # noqa: F401
