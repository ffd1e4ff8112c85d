"""Test config: run everything on CPU with a virtual 8-device mesh.

This is the JAX-native 'multi-chip without a cluster' mechanism the
reference lacks (SURVEY.md §4): XLA's host platform is split into 8 virtual
devices so sharding/collective tests exercise real SPMD partitioning.

Note: this environment registers a TPU PJRT plugin via sitecustomize which
overrides the JAX_PLATFORMS env var, so the platform must be forced through
jax.config AFTER import (and XLA_FLAGS before).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
