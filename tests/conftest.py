"""Test harness: force a virtual 8-device CPU platform.

Mirrors the survey's multi-chip test strategy (SURVEY.md §4.5): sharding and
collective tests run on a simulated 8-device host mesh; TPU-only benchmarks live
in bench.py.

Note: the environment's sitecustomize imports jax at interpreter startup (to
register the TPU PJRT plugin), so env vars like JAX_PLATFORMS set here would be
ignored — ``jax.config.update`` is the reliable override and also avoids the slow
remote-TPU handshake during unit tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses tests may spawn

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
