"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (SURVEY.md §4d).

Note: this image's axon sitecustomize programmatically selects the TPU
backend regardless of the JAX_PLATFORMS env var, so the override must go
through jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
