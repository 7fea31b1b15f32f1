"""JAX runtime setup: persistent compilation cache.

First-compile of the jitted model can take minutes on remote-compile TPU
runtimes; the persistent cache makes every later pipeline invocation start
hot.  Called from the CLI entry points and benchmarks."""

from __future__ import annotations

import os

_done = False


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    global _done
    if _done:
        return
    _done = True
    import jax

    cache_dir = (cache_dir
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "pepper_tpu_jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization only
