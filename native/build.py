"""Build the native host-runtime extension (mumemto_tpu/_native.so).

Usage: python native/build.py [--force]

Direct g++ invocation (no setuptools ceremony): one translation unit,
links zlib. The Python loader (mumemto_tpu/native.py) calls this lazily
the first time the extension is missing or stale.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "native", "mumemto_native.cc")
OUT = os.path.join(ROOT, "mumemto_tpu", "_native.so")


def stale() -> bool:
    return (not os.path.exists(OUT)
            or os.path.getmtime(OUT) < os.path.getmtime(SRC))


def build(force: bool = False, quiet: bool = False) -> bool:
    """Compile if missing/stale. Returns True only when OUT is FRESH —
    a failed compile with a stale .so on disk returns False (and removes
    the stale binary) so callers fall back to the pure-Python path rather
    than silently importing outdated native code."""
    if not os.path.exists(SRC):
        # no sources shipped: trust a prebuilt .so if present
        return os.path.exists(OUT)
    if not force and not stale():
        return True
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", OUT, SRC, f"-I{include}", "-lz",
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        if not quiet:
            print(f"[native] build failed to launch: {e}", file=sys.stderr)
        res = None
    if res is None or res.returncode != 0:
        if res is not None and not quiet:
            print(f"[native] g++ failed:\n{res.stderr}", file=sys.stderr)
        if os.path.exists(OUT):
            try:
                os.remove(OUT)  # never import a stale binary
            except OSError:
                pass
        return False
    return True


if __name__ == "__main__":
    ok = build(force="--force" in sys.argv)
    print("built" if ok else "FAILED", OUT)
    sys.exit(0 if ok else 1)
