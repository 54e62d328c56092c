"""Test environment: force an 8-device CPU platform.

Recipe from SURVEY.md §4.4 (verified there): the `axon` TPU plugin is
pre-selected via JAX_PLATFORMS and wins over env overrides, so we must (a)
set XLA_FLAGS *before* importing jax, then (b) switch platforms via
jax.config *after* import. This gives every test a deterministic 8-device
fake mesh — the only multi-device coverage available on this 1-chip box.

Compiled-TPU Pallas coverage runs separately (scripts/tpu_smoke.py, bench.py)
because a single process cannot host both platforms' test sets cleanly.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8, f"expected 8 fake CPU devices, got {jax.device_count()}"
    yield


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
