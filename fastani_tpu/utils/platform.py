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


def lut_cache(name: str, compute, *key) -> "np.ndarray":
    """Disk-backed cache for deterministic host LUTs (the binomial-CI
    tables cost ~1 min of scipy time per (k, identity, s_max))."""
    import numpy as np

    d = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_fastani")
    os.makedirs(d, exist_ok=True)
    key_s = "_".join(str(x).replace(".", "p") for x in key)
    path = os.path.join(d, f"lut_{name}_{key_s}.npy")
    if os.path.exists(path):
        try:
            return np.load(path)
        except Exception:
            pass
    out = compute()
    tmp = path + ".tmp.npy"
    np.save(tmp, out)
    os.replace(tmp, path)
    return out


def force_cpu() -> None:
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
