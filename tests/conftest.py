"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's note — the reference has no distributed CI; we test all
sharding deterministically on host CPU devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may pre-register a TPU backend via sitecustomize and force
# jax_platforms; tests always run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
