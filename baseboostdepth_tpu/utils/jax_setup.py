"""Process-level JAX setup: persistent compilation cache.

Compiles of the full-method train graph run minutes on a cold process; the
persistent cache makes every subsequent process (bench, eval, resumed
training) reuse them.
"""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None) -> None:
    import jax

    cache = cache_dir or os.environ.get(
        "BBD_JAX_CACHE", os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    )
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        print(f"[jax_setup] compilation cache unavailable: {e}")
