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

import gc  # noqa: E402

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compile cache: the suite compiles ~100 XLA CPU programs (the
# scan/cond pipeline ones take tens of seconds each on this 2-vCPU host);
# caching them makes reruns minutes faster.  Gitignored, like .jax_cache/.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The suite compiles ~100 distinct XLA CPU programs (several of them very
    large scan/cond pipelines); keeping them all loaded in one process has
    produced compiler crashes (SIGSEGV/SIGABRT inside backend_compile) late
    in the run.  Each module's tests share configs — and therefore jit cache
    entries — so clearing at module boundaries costs nothing within a module."""
    yield
    jax.clear_caches()
    gc.collect()
