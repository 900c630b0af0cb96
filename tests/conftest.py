"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of testing distributed behavior without a
cluster (SURVEY.md §4): sharding-correctness tests use
``--xla_force_host_platform_device_count=8`` so `Mesh`-based code paths
compile and execute with real collectives on one host.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The hosting image force-registers the axon TPU plugin and overwrites
# jax.config.jax_platforms at import time (sitecustomize), so the env var
# alone is not enough — override the config after import.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_root():
    if not REFERENCE.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE


@pytest.fixture(scope="session")
def maps_dir(reference_root):
    return reference_root / "maps"


@pytest.fixture(scope="session")
def traces_dir(reference_root):
    return reference_root / "data" / "traces"
