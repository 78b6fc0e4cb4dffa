"""Persistent XLA compilation cache.

TPU compiles of the fused-kernel steps take minutes through the axon
relay's AOT helper and are paid again by EVERY process (benchmarks, the
driver's entry-point checks, user scripts). JAX's persistent
compilation cache serializes compiled executables keyed by HLO +
compile options, so a recompile of an unchanged step across processes
becomes a file read. This module turns it on at a stable default
location unless the user already configured one.

Backends whose PJRT plugin cannot serialize executables make JAX skip
caching with a warning — enabling is safe everywhere.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/clima_oceananigans_jl_tpu/xla")
_done = False


def enable_persistent_cache(path=None):
    """Idempotently enable the JAX persistent compilation cache (no-op
    when the user already set ``jax_compilation_cache_dir`` or the
    ``JAX_COMPILATION_CACHE_DIR`` env var)."""
    global _done
    if _done:
        return
    _done = True
    import jax
    try:
        if jax.config.jax_compilation_cache_dir or \
                os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            return
        cache_dir = path or _DEFAULT_DIR
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache anything that took >= 5 s to compile (the fused-kernel
        # steps take minutes; trivial jits stay uncached)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # never let cache plumbing break a run
