"""Persistent XLA compilation cache configuration.

The prover's big-field limb kernels produce large HLO graphs; on small hosts
the XLA compile dominates wall-clock (a single Montgomery multiply graph takes
seconds to compile).  Every entry point (tests, bench, driver dry runs) enables
the repo-local persistent cache so compilations amortize across processes.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("HALO2_TPU_CACHE_DIR") or _DEFAULT_DIR
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
