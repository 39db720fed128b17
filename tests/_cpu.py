"""Import before hymls_tpu in ad-hoc scripts to force the CPU backend."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/hymls_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
