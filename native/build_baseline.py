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


def selftest(quiet: bool = False) -> bool:
    """Run the binary on a tiny input and check the JSON shape.

    A -march=native binary from another machine (or a stale checkout where
    mtimes lie) would SIGILL or garble output; exercising SA-IS + Kasai +
    the scan on a real (if tiny) workload catches that before bench.py
    trusts the measurement."""
    import json as _json
    import tempfile
    try:
        with tempfile.TemporaryDirectory() as td:
            tf = os.path.join(td, "t.bin")
            lf = os.path.join(td, "l.txt")
            doc = b"ACGTACGTTGCA" * 8
            with open(tf, "wb") as f:
                f.write(doc + b"$" + doc + b"$")
            with open(lf, "w") as f:
                f.write(f"{len(doc) + 1}\n{len(doc) + 1}\n")
            r = subprocess.run(
                [OUT, tf, lf, "4", "0", "1", "0", "1", "0", "1"],
                capture_output=True, text=True, timeout=30)
        if r.returncode != 0:
            raise RuntimeError(f"rc={r.returncode} ({r.stderr[:120]})")
        out = _json.loads(r.stdout)
        return out["matches"] >= 1 and out["t_total"] >= 0
    except Exception as e:  # noqa: BLE001 — any failure means rebuild
        if not quiet:
            print(f"[baseline] selftest failed: {e}", file=sys.stderr)
        return False


def build(force: bool = False, quiet: bool = False) -> bool:
    if not os.path.exists(SRC):
        return os.path.exists(OUT)
    if not force and not stale() and selftest(quiet=quiet):
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
