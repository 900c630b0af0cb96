"""Platform selection helpers.

The hosting image's sitecustomize registers the axon TPU plugin and
overwrites ``jax.config.jax_platforms`` during ``import jax``, so selecting
CPU requires a post-import config update, not just the env var.
"""

from __future__ import annotations

import os


def force_cpu(virtual_devices: int = 0) -> None:
    """Pin JAX to the host CPU backend; optionally request N virtual devices
    (must be called before the CPU backend initializes)."""
    if virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count={virtual_devices}"
            ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
