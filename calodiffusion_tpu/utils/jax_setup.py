"""JAX runtime setup helpers."""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Enable the persistent XLA compilation cache.

    Remote-TPU compiles of the U-Net graphs take minutes; the cache makes
    every run after the first start instantly.  Called by the CLIs, bench,
    and scripts.  Respects an existing JAX_COMPILATION_CACHE_DIR.
    """
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(os.path.expanduser("~"), ".cache", "calodiffusion_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
