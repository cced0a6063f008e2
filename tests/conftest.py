"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run against 8 virtual CPU devices
(xla_force_host_platform_device_count) so they work without TPU hardware.
"""

import os

# Must happen before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may already be imported by the environment's sitecustomize with the
# TPU platform baked in — override through the live config instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# NOTE: the persistent compile cache is deliberately NOT enabled here —
# zstandard-compressed cache writes segfault the interpreter in this
# environment (jax compilation_cache.put_executable_and_time → zstd backend).
# The suite pays the JIT compile cost each run instead of crashing.
jax.config.update("jax_enable_compilation_cache", False)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running integration tests")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    One long pytest process accumulates hundreds of XLA:CPU executables;
    in this environment the LLVM JIT eventually crashes (SIGSEGV/SIGABRT
    inside backend_compile) once enough are alive.  Dropping the caches at
    module boundaries keeps the live-executable count bounded; the cost is
    re-jitting shared helpers per module.
    """
    yield
    jax.clear_caches()


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
