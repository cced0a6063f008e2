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

# Persistent compile cache: ON by default.  Round-1 hit interpreter
# segfaults in the zstd cache-write path; that no longer reproduces
# (standalone repro, pytest-context repro, and a full 145-test suite run
# with the cache on were all green), so the cache is re-enabled — warm
# re-runs skip most of the ~20 min JIT cost.  TWOACE_TEST_COMPILE_CACHE=0
# opts out if the crash ever resurfaces.
if os.environ.get("TWOACE_TEST_COMPILE_CACHE", "1") != "0":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
else:
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
