"""Persistent XLA compilation cache setup.

This host has a single CPU core, so XLA compiles are slow; caching compiled
executables across processes makes test/bench reruns fast.  Call
`enable_persistent_cache()` before the first jit compilation.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(path: str | None = None) -> str:
    # Honor JAX_PLATFORMS: the axon TPU plugin ignores the env var, so
    # mirror it into the config flag (must run before backend init).
    env_platform = os.environ.get("JAX_PLATFORMS", "")
    if env_platform:
        try:
            jax.config.update("jax_platforms", env_platform)
        except Exception:
            pass
    path = path or os.environ.get("DIFFCODEC_JAX_CACHE", _DEFAULT_DIR)
    # key by requested platform: CPU AOT artifacts are machine-feature
    # specific and must not be shared with entries produced while the axon
    # TPU plugin was active (SIGILL risk on feature mismatch)
    platform = os.environ.get("JAX_PLATFORMS", "default") or "default"
    path = os.path.join(path, platform.replace(",", "_"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
