"""Process-wide JAX configuration: persistent compilation cache.

Index construction compiles one program per (text bucket size) — caching
them on disk makes repeat runs and the test suite fast. Opt out with
MUMEMTO_TPU_NO_CACHE=1.
"""

import os

_done = False


def ensure_cache():
    global _done
    if _done or os.environ.get("MUMEMTO_TPU_NO_CACHE"):
        return
    _done = True
    import jax

    cache_dir = os.environ.get(
        "MUMEMTO_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "mumemto_tpu_jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
