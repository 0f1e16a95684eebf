"""Test harness: run everything on a virtual 8-device CPU mesh.

The sandbox's axon sitecustomize force-selects the remote-TPU backend with
`jax.config.update("jax_platforms", "axon,cpu")` at interpreter start, so
env vars alone don't stick — we must update jax.config after import (and
set XLA_FLAGS before any backend initializes).  SURVEY.md §4: distributed
tests use multi-device CPU simulation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
