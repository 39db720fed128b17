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
