"""JAX persistent compilation cache.

TPU compilation dominates wall-clock in this framework's environments
(remote-compiled programs take minutes); the persistent cache cuts repeat
runs of every entry point to seconds.  Enabled automatically on package
import (set MER_TPU_NO_COMPILE_CACHE=1 to disable, MER_TPU_COMPILE_CACHE_DIR
to relocate).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    if os.environ.get("MER_TPU_NO_COMPILE_CACHE") == "1":
        return
    cache_dir = cache_dir or os.environ.get("MER_TPU_COMPILE_CACHE_DIR") or _DEFAULT_DIR
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
