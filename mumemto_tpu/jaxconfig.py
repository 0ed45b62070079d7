"""Process-wide JAX configuration: persistent compilation cache.

Index construction compiles one program per (text bucket size) — caching
them on disk makes repeat runs and the test suite fast. Opt out with
MUMEMTO_TPU_NO_CACHE=1.

CPU-forced processes (tests, fuzz drivers, dryrun) get a HOST-FINGERPRINTED
cache directory: XLA:CPU persists AOT machine code keyed without the exact
CPU feature set, so a cache written on one VM type can be loaded on another
with missing ISA extensions — the loader warns "could lead to execution
errors such as SIGILL", and we observed real libgcc segfaults from exactly
this under heavy CPU fuzzing. Scoping the fingerprint to CPU-forced
processes keeps the (expensive, tunnel-compiled) TPU cache directory
stable.
"""

import hashlib
import os

_done = False


def _host_fingerprint() -> str:
    """Short stable id of this host's CPU feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


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
        # CPU-forced processes set jax_platforms to exactly "cpu"
        # (tests/conftest, dryrun, fuzz drivers); accelerator processes
        # carry the plugin list (e.g. "axon,cpu") and keep the base dir
        if str(jax.config.jax_platforms or "").strip() == "cpu":
            cache_dir = f"{cache_dir}_cpu_{_host_fingerprint()}"
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
