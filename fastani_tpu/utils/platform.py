"""Platform/runtime helpers: compilation cache, backend selection.

The session TPU is reached through a tunnel whose compiles are expensive;
a persistent compilation cache makes repeated runs (tests, bench, CLI)
reuse executables across processes.
"""

from __future__ import annotations

import os


def setup_cache(path: str = "/root/.cache/jax_fastani") -> None:
    os.makedirs(path, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def force_cpu() -> None:
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
