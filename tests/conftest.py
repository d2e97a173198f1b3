"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax and registers the TPU ("axon")
backend before pytest loads this file, so env vars alone are too late —
we must flip the platform through jax.config before any backend is used.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", f"tests must run on CPU, got {jax.devices()}"
assert jax.device_count() == 8, f"expected 8 virtual CPU devices, got {jax.device_count()}"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
