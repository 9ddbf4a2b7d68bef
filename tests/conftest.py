"""Test environment: force an 8-device virtual CPU mesh before JAX import.

This is the TPU-native answer to "multi-node testing without a cluster"
(SURVEY.md §4): every sharding/collective path runs under
``--xla_force_host_platform_device_count=8`` so world_size>1 semantics
(all_gather labels, per-device batch splits, IL invariants) are covered by
plain pytest.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
