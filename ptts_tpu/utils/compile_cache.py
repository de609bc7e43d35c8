"""Persistent XLA compilation cache management.

The reference C binary starts serving within seconds of launch (per-call
weight load, ptts.c:1047-1059); a jitted TPU serving path instead pays an
XLA compile on first use (~30 s for the while_loop generator after the
lax.scan layer rollup -- ~920 s before it, BENCH_r02). Two mitigations ship:

  * this module: a persistent on-disk compilation cache, enabled by default
    at engine construction, so every executable is compiled at most once per
    machine (including across process restarts and the driver's bench runs);
  * TTSEngine.warmup(): explicit precompilation of the serving executables
    for chosen shape buckets, so a deployment can pay all compiles at
    startup rather than on the first request.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> bool:
    """Point JAX's compilation cache at a persistent directory (idempotent).

    Default location: $PTTS_COMPILE_CACHE or ~/.cache/ptts_xla. Set
    PTTS_COMPILE_CACHE=0 to disable. Returns True when enabled.
    """
    global _enabled
    if _enabled:
        return True
    env = os.environ.get("PTTS_COMPILE_CACHE", "")
    if env == "0":
        return False
    try:
        import jax

        cache_dir = cache_dir or env or os.path.expanduser("~/.cache/ptts_xla")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        _enabled = True
        return True
    except Exception:
        return False
