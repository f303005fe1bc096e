import os

# 8-way virtual CPU mesh (the standard JAX substitute for a multi-chip slice).
# NOTE: this environment force-registers an 'axon' (tunneled TPU) platform via
# site config that overrides JAX_PLATFORMS, so we must override through
# jax.config BEFORE the backend initializes — eager ops on the tunneled TPU
# are network round-trips and make tests pathologically slow.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu"
