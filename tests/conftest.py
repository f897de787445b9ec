import os

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware. Note: this container force-registers the `axon` TPU
# backend via sitecustomize and ignores JAX_PLATFORMS; jax.config.update is
# the reliable override. XLA_FLAGS must be set before the backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
