"""Test environment: force an 8-device virtual CPU mesh before first JAX use.

This is the TPU-native answer to "multi-node testing without a cluster"
(SURVEY.md §4): every sharding/collective path runs on 8 virtual CPU devices
so world_size>1 semantics (all_gather labels, per-device batch splits, IL
invariants) are covered by plain pytest.

Note: the axon TPU plugin can override ``JAX_PLATFORMS``/``XLA_FLAGS`` env
vars at import time, so we force the platform through the config API (which
wins) in addition to the env vars.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # pragma: no cover - older jax or backend already up
    pass
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: the suite's wall clock is dominated by jit
# compiles of near-identical step functions on the 8-device mesh; CPU-backend
# executables cache across test runs (unlike the TPU tunnel's remote compile).
from iterated_learning_for_vlm_tpu import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.device_count() >= 8, (
    f"tests need 8 virtual CPU devices, got {jax.device_count()} on "
    f"{jax.default_backend()}"
)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
