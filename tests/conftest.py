"""Test harness: force an 8-device CPU platform before JAX initializes.

This is the "distributed-without-hardware" strategy from SURVEY.md §4 — the
pjit analog of the reference's device-placement-string tests
(model_deploy_test.py): shardings are asserted on a virtual CPU mesh.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Force CPU even when the ambient environment points JAX at a TPU
# (JAX_PLATFORMS=axon — the env var alone does not win against the axon
# plugin, the config update does): unit tests exercise sharding on 8
# virtual devices.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture()
def tmp_root(tmp_path, monkeypatch):
    """Point the framework's run-dir layout at a scratch directory."""
    monkeypatch.setenv("TFY2_ROOT", str(tmp_path))
    return tmp_path
