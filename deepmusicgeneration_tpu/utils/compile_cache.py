"""Persistent XLA compilation cache.

First compilation of the 41M decode loop costs ~25 s (and the 85M multitask
engines considerably more). Enabling the on-disk cache makes every later
process start with warm executables — essential for CLI tools and serving
restarts.

CPU-backend caveat: XLA:CPU caches AOT machine code compiled for the exact
host CPU. Loading an entry produced on a different machine logs "machine
type doesn't match" and can SIGILL/SIGSEGV (observed when the environment
migrated hosts between sessions). TPU executables have no such host
dependence (they target the chip). So CPU runs get a cache directory keyed
by the host's CPU-flag fingerprint, while the TPU cache stays shared.
"""

from __future__ import annotations

import hashlib
import os

_DEFAULT = os.path.expanduser("~/.cache/dmg_tpu_xla")


def _host_fingerprint() -> str:
    # Hash BOTH the model name and the flags line: XLA:CPU derives extra
    # target features from the CPU model (e.g. +prefer-no-gather), so two
    # hosts with identical cpuinfo flags but different models still produce
    # incompatible AOT code (observed: "machine type ... doesn't match"
    # loading a same-flags entry, with a SIGILL warning).
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    parts.append(line)
                    if len(parts) == 2:
                        break
    except OSError:
        pass
    if not parts:
        import platform
        parts = [platform.processor()]
    return hashlib.sha1("".join(parts).encode()).hexdigest()[:10]


def enable(cache_dir: str = None) -> str:
    import jax
    if cache_dir is None:
        cache_dir = _DEFAULT
        # decide by config/env, NOT jax.default_backend(): initializing the
        # backend here would move the first (possibly stalling) tunnel
        # contact into cache setup. Forced-CPU contexts (tests, the dryrun
        # re-exec, tools run with JAX_PLATFORMS=cpu) set the platform list
        # to exactly "cpu"; the session default is "axon[,cpu]" (TPU-first).
        plat = (jax.config.jax_platforms
                or os.environ.get("JAX_PLATFORMS", ""))
        if str(plat).lower().startswith("cpu"):
            cache_dir = f"{_DEFAULT}_cpu_{_host_fingerprint()}"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
