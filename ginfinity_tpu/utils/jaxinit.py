"""JAX runtime initialization for ginfinity_tpu.

Enables the persistent XLA compilation cache (first TPU compiles over
the axon tunnel cost minutes; cached reloads cost milliseconds) unless
the user already configured one.  Imported for its side effect by
ginfinity_tpu/__init__.py.
"""

from __future__ import annotations

import os


def init_jax_defaults() -> None:
    import jax

    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "ginfinity_tpu", "xla_cache"
        )
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            # cache everything, even fast compiles
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:  # pragma: no cover - cache is best-effort
            pass
