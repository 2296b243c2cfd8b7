"""Pallas TPU kernels for the engine's hot ops, with jnp fallbacks used on
CPU (tests) and as references for equivalence checks."""

from .hamming_pallas import retrieval_scores_pallas, retrieval_scores_ref  # noqa: F401
from .schur_pallas import schur_reduce_pallas, schur_reduce_ref  # noqa: F401
