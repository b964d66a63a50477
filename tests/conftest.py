"""Test configuration: force an 8-device virtual CPU mesh.

The shell profile exports JAX_PLATFORMS=axon (the TPU tunnel); tests must
never touch it. jax may already be imported by pytest plugins before this
conftest runs, so env vars are not reliable — use jax.config.update, which
works until the backend is first initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "float32")

if os.environ.get("SPDM_TEST_FAST_COMPILE"):
    # experiment knob: trade XLA optimization level for compile time
    jax.config.update("jax_disable_most_optimizations", True)

# persistent compilation cache: the suite compiles the same shapes every
# run (trainer/e2e tests dominate wall time); warm runs skip XLA entirely
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("SPDM_TEST_CACHE", "/tmp/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_enable_xla_caches",
                  "all")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU, got " + repr(jax.devices()))


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")
