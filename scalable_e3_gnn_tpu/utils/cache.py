"""Persistent XLA compilation cache setup.

First compiles through the sandbox's remote-compile tunnel run minutes; the
persistent cache makes every subsequent process start warm.  Import and call
``enable_compilation_cache()`` at program start (bench/examples do).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/root/.jax_compile_cache") -> None:
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
