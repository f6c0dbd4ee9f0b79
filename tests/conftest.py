"""Test configuration: force an 8-device virtual CPU platform so sharding /
multi-chip code paths are exercised without TPU hardware (the driver's
dryrun_multichip does the same).

Note: this sandbox's sitecustomize imports jax at interpreter startup and
presets JAX_PLATFORMS=axon (the tunneled TPU), so env vars set here are too
late — we must go through jax.config, which works because backend
initialization is still lazy at conftest-import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
