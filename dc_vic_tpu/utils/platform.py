"""Make CLI entry points honor the JAX_PLATFORMS environment variable.

Some TPU runtime plugins force-prepend themselves to jax_platforms and
ignore the JAX_PLATFORMS env var, so `JAX_PLATFORMS=cpu python
scripts/compress.py ...` would still land on the accelerator. Calling
apply_env_platform() early in each script's main() re-applies the env
request through jax.config (the same mechanism tests/conftest.py uses),
including the XLA_FLAGS host-platform device-count override used for
virtual multi-device CPU runs.
"""
from __future__ import annotations

import os
import re


def apply_env_platform() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    jax.config.update("jax_platforms", plat)
    if "cpu" in plat:
        m = re.search(r"xla_force_host_platform_device_count=(\d+)",
                      os.environ.get("XLA_FLAGS", ""))
        if m:
            jax.config.update("jax_num_cpu_devices", int(m.group(1)))
