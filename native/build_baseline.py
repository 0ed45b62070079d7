"""Build the single-core CPU baseline binary (native/baseline_cpu).

Usage: python native/build_baseline.py [--force]

Compiled with the reference's own release flags
(-O3 -march=native -funroll-loops, single thread,
CMakeModules/ConfigureCompilerGcc.cmake:120) so the measured Mbp/s is an
honest single-core C++ figure for bench.py's vs_baseline denominator.
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "native", "baseline_cpu.cc")
OUT = os.path.join(ROOT, "native", "baseline_cpu")


def stale() -> bool:
    return (not os.path.exists(OUT)
            or os.path.getmtime(OUT) < os.path.getmtime(SRC))


def build(force: bool = False, quiet: bool = False) -> bool:
    if not os.path.exists(SRC):
        return os.path.exists(OUT)
    if not force and not stale():
        return True
    cmd = ["g++", "-O3", "-march=native", "-funroll-loops", "-std=c++17",
           "-o", OUT, SRC]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    except (OSError, subprocess.TimeoutExpired) as e:
        if not quiet:
            print(f"[baseline] build failed to launch: {e}", file=sys.stderr)
        res = None
    if res is None or res.returncode != 0:
        if res is not None and not quiet:
            print(f"[baseline] g++ failed:\n{res.stderr}", file=sys.stderr)
        if os.path.exists(OUT):
            try:
                os.remove(OUT)
            except OSError:
                pass
        return False
    return True


if __name__ == "__main__":
    ok = build(force="--force" in sys.argv)
    print("built" if ok else "FAILED", OUT)
    sys.exit(0 if ok else 1)
