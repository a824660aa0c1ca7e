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
    # Hash the full identity block of CPU 0: XLA:CPU derives target features
    # from LLVM's host detection (e.g. +prefer-no-gather), which keys off
    # cpuid family/model/stepping — NOT the cpuinfo "flags" line.  Hashing
    # only model name + flags proved insufficient: after a host migration,
    # same-named CPUs produced incompatible AOT code (the loader proceeded
    # with "machine type ... doesn't match" and a later 8-device collective
    # aborted on a stuck rendezvous).  Family/model/stepping/microcode
    # discriminate those hosts; jaxlib version guards ABI changes.
    keys = ("vendor_id", "cpu family", "model\t", "model name", "stepping",
            "microcode", "flags")
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():
                    break                      # end of CPU 0's block
                if line.startswith(keys):
                    parts.append(line)
    except OSError:
        pass
    if not parts:
        import platform
        parts = [platform.processor()]
    try:
        import jaxlib
        parts.append(jaxlib.__version__)
    except Exception:
        pass
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
