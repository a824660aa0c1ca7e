"""Persistent XLA compilation cache.

First compilation of the 41M decode loop costs ~25 s (and the 85M multitask
engines considerably more). Enabling the on-disk cache makes every later
process start with warm executables — essential for CLI tools and serving
restarts.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/dmg_tpu_xla")


def enable(cache_dir: str = _DEFAULT) -> str:
    import jax
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
