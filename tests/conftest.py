"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (SURVEY.md §4 implication (d)).
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the real TPU
# tunnel and a sitecustomize imports jax at interpreter start, so the env var
# alone is too late — update the already-imported config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
# Tests are compile-bound (big-field limb graphs), not runtime-bound: drop the
# XLA backend optimization level.  Roughly 1.6x faster compiles on 2 cores.
# Set HALO2_TPU_TEST_OPT=1 to run the suite through the fully optimized XLA
# pipeline (the one bench.py and production use) — slower compiles, but
# catches optimization-dependent miscompiles (ADVICE.md round-2).
_OPTIMIZED = bool(os.environ.get("HALO2_TPU_TEST_OPT"))
if not _OPTIMIZED and "xla_backend_optimization_level" not in flags:
    flags = flags + " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
if not _OPTIMIZED:
    jax.config.update("jax_disable_most_optimizations", True)
# Persistent compilation cache: big-field kernels are compile-heavy; reuse
# compilations across test runs.  HALO2_TPU_CACHE_DIR overrides (e.g. to a
# temp dir for honest cold-cache timing).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("HALO2_TPU_CACHE_DIR", "/root/repo/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import pytest  # noqa: E402


def pytest_collection_modifyitems(items):
    """Auto-tier: anything not marked `slow` is `fast`, so `-m fast` selects
    the quick tier and `-m slow` the compile-heavy one (VERDICT r4 #8)."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)
