"""Test config: force an 8-device virtual CPU mesh (SURVEY.md §4 implication:
multi-device tests via xla_force_host_platform_device_count, no TPUs needed).

Note: this environment's sitecustomize registers a remote "axon" TPU backend
and forces jax_platforms="axon,cpu" AFTER env vars are read, so we must
override via jax.config after import — env vars alone are ignored.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
