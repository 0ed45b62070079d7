"""Loader for the native host-runtime extension, with pure-Python fallback.

The native module (native/mumemto_native.cc) is the C++ data-loader
equivalent of the reference's kseq.h+zlib ingest layer. It is built on
demand (g++, links zlib) and silently skipped when unavailable — every
caller must work against the fallback too. Disable with
MUMEMTO_TPU_NO_NATIVE=1.
"""

from __future__ import annotations

import os

_native = None
_tried = False


def get_native():
    """The `_native` extension module, or None when unavailable."""
    global _native, _tried
    if _tried:
        return _native
    _tried = True
    if os.environ.get("MUMEMTO_TPU_NO_NATIVE"):
        return None
    # build (or staleness-check) FIRST: importing before checking would
    # happily load a stale .so built from older sources
    try:
        import importlib.util
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "mumemto_tpu_native_build", os.path.join(root, "native", "build.py"))
        _build = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(_build)
        fresh = _build.build(quiet=True)
    except Exception:
        fresh = False
    if not fresh:
        return None
    try:
        from mumemto_tpu import _native as mod
        _native = mod
    except ImportError:
        _native = None
    return _native
