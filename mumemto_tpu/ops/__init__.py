"""Device-side programs. Importing any ops module enables the persistent
JAX compilation cache (compiles through the tunneled device are minutes;
the cache makes them one-time per shape bucket)."""

from mumemto_tpu.jaxconfig import ensure_cache

ensure_cache()
