"""Test bootstrap: force JAX onto 8 virtual CPU devices.

The reference's tests require physical hardware (`/root/reference/src/utils.rs:60-75`
unwraps /dev/xdma* opens) so its CI never runs them.  We do better: everything
here runs hardware-free on a virtual 8-device CPU mesh so single-chip math AND
the multi-chip sharding paths are exercised in CI.

`BLZ_TEST_PLATFORM=tpu pytest tests/test_tpu_fused.py` lifts the CPU pin to
run the TPU-gated fused-kernel tests on a real chip (they skip otherwise).
"""
import os

# Must happen before the first JAX backend initialization.  The container's
# sitecustomize registers the `axon` TPU platform at interpreter start, but
# platform *selection* happens lazily — overriding here still wins.
if os.environ.get("BLZ_TEST_PLATFORM", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

if os.environ.get("BLZ_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# The box has a single vCPU and XLA:CPU compiles the big-integer graphs
# slowly; the persistent cache makes every compile a one-time cost.
# BLZ_JAX_CACHE points the suite at a private copy when another process
# (e.g. a TPU bench) is using the shared one — concurrent readers of a
# cache being written have segfaulted zstd decompression.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("BLZ_JAX_CACHE", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
