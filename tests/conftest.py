import os

# Tests run on the CPU backend with a virtual 8-device mesh so sharding
# logic is exercised without TPU hardware (the reference's analogue: a
# FakeComm + mpirun -np 8 test matrix).  Note: the environment may pin
# JAX_PLATFORMS to a TPU plugin; config.update after import wins.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite re-traces many identical
# programs (same grids/configs across tests and runs); caching compiled
# executables cuts suite wall-clock several-fold (reference suite
# budget: 600 s, integration_tests/CMakeLists.txt:21).
jax.config.update("jax_compilation_cache_dir", "/tmp/hymls_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
