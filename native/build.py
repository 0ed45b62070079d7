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
    """Compile if missing/stale. Returns True when OUT exists afterwards."""
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
        return os.path.exists(OUT)
    if res.returncode != 0:
        if not quiet:
            print(f"[native] g++ failed:\n{res.stderr}", file=sys.stderr)
        return os.path.exists(OUT)
    return True


if __name__ == "__main__":
    ok = build(force="--force" in sys.argv)
    print("built" if ok else "FAILED", OUT)
    sys.exit(0 if ok else 1)
