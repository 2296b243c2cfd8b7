"""Test harness: run everything on a virtual 8-device CPU mesh (SURVEY.md §4f).

Must set XLA flags before jax initializes, hence the env mutation at import
time (pytest imports conftest before test modules import jax).
"""

import os

# force CPU: the ambient sitecustomize registers the 'axon' real-TPU tunnel
# backend and pins jax_platforms="axon,cpu" via jax.config at interpreter
# startup (overriding the env var), which makes every eager op a ~50 ms round
# trip — tests must not touch it
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def random_quat(rng, n=None):
    shape = (4,) if n is None else (n, 4)
    q = rng.normal(size=shape)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return q * np.where(q[..., :1] < 0, -1.0, 1.0)
