"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip code paths (pjit/shard_map collectives) are validated on host CPU
devices, substituting for a real pod slice (see SURVEY.md §4).  Note: plain
JAX_PLATFORMS env is ignored here because the axon TPU plugin pre-registers;
jax.config.update is authoritative.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
