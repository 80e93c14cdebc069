"""JAX runtime configuration shared by every device-facing module.

The persistent compilation cache matters a lot here: the chunked winnow
and the sharded query program are compiled once per (shape, params)
configuration, and on this platform a cold XLA compile of the query
program takes ~10 s.  The ``JAX_COMPILATION_CACHE_DIR`` environment
variable is not honored by this jaxlib build, so the cache must be
enabled through ``jax.config`` -- which `configure` does, exactly once.

Set ``PYFASTANI_TPU_CACHE_DIR=0`` to disable, or point it at a custom
directory (default ``/tmp/jax_cache_pyfastani_tpu``).
"""

from __future__ import annotations

import os

_DONE = False


def configure() -> None:
    """Enable the persistent compilation cache (idempotent)."""
    global _DONE
    if _DONE:
        return
    _DONE = True
    path = os.environ.get(
        "PYFASTANI_TPU_CACHE_DIR",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_pyfastani_tpu"),
    )
    if not path or path == "0":
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass
