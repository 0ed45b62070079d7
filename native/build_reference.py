"""Build the UNMODIFIED reference sources (/root/reference) into runnable
oracle binaries for golden testing, using the from-scratch shims in
native/refshim/ (gsacak + sdsl subset + empty gzstream).

No reference code is copied into this repository: sources are compiled
straight out of /root/reference via include/source paths. The binaries
land in native/ref_bin/ (gitignored).

Targets (mirroring /root/reference/src/CMakeLists.txt):
  mumemto_exec    <- src/pfp_mum.cpp + src/ref_builder.cpp  (-DM64, zlib)
  compute_lengths <- src/compute_lengths.cpp
  extract_mums    <- src/extract_mums.cpp
  anchor_merge    <- src/merge_candidates.cpp

Usage: python native/build_reference.py  (or import and call build())
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("MUMEMTO_REFERENCE_DIR", "/root/reference")
SHIM = os.path.join(REPO, "native", "refshim")
OUT = os.path.join(REPO, "native", "ref_bin")

COMMON_FLAGS = [
    "-std=c++17",
    "-O2",
    "-DM64",
    "-w",
    f"-I{REF}/include",
    f"-I{SHIM}",  # provides <gsacak.h>, <gzstream.h>, and <sdsl/...>
]

TARGETS = {
    "mumemto_exec": {
        "sources": [
            f"{REF}/src/pfp_mum.cpp",
            f"{REF}/src/ref_builder.cpp",
            os.path.join(SHIM, "gsacak_shim.cc"),
        ],
        "libs": ["-lz"],
        # common.hpp defines non-inline helpers and is included by both
        # reference TUs (as in the upstream build); definitions are
        # token-identical, so let the linker keep the first.
        "ldflags": ["-Wl,--allow-multiple-definition"],
    },
    "compute_lengths": {
        "sources": [f"{REF}/src/compute_lengths.cpp"],
        "libs": ["-lz"],
        "ldflags": ["-Wl,--allow-multiple-definition"],
    },
    "extract_mums": {
        "sources": [f"{REF}/src/extract_mums.cpp"],
        "libs": ["-lz"],
        "ldflags": ["-Wl,--allow-multiple-definition"],
    },
    "anchor_merge": {
        "sources": [f"{REF}/src/merge_candidates.cpp"],
        "libs": [],
        "ldflags": ["-Wl,--allow-multiple-definition"],
    },
}


def available() -> bool:
    return os.path.isdir(os.path.join(REF, "src"))


def _binary(name: str) -> str:
    return os.path.join(OUT, name)


def _stale(name: str) -> bool:
    out = _binary(name)
    if not os.path.exists(out):
        return True
    btime = os.path.getmtime(out)
    deps = list(TARGETS[name]["sources"])
    for root in (os.path.join(REF, "include"), SHIM, os.path.join(SHIM, "sdsl")):
        for fn in os.listdir(root):
            p = os.path.join(root, fn)
            if os.path.isfile(p):
                deps.append(p)
    return any(os.path.getmtime(d) > btime for d in deps)


def build(names=None, force: bool = False) -> dict:
    """Build (if stale) and return {name: path}. Raises on compile error."""
    if not available():
        raise FileNotFoundError(f"reference sources not found at {REF}")
    os.makedirs(OUT, exist_ok=True)
    names = list(TARGETS) if names is None else list(names)
    paths = {}
    for name in names:
        spec = TARGETS[name]
        out = _binary(name)
        if force or _stale(name):
            cmd = (
                ["g++"]
                + COMMON_FLAGS
                + spec["sources"]
                + ["-o", out]
                + spec["ldflags"]
                + spec["libs"]
            )
            res = subprocess.run(cmd, capture_output=True, text=True)
            if res.returncode != 0:
                raise RuntimeError(
                    f"building {name} failed:\n{res.stderr[-4000:]}"
                )
        paths[name] = out
    return paths


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--force"]
    try:
        built = build(args or None, force="--force" in sys.argv)
    except Exception as exc:  # surface compiler output
        print(exc)
        sys.exit(1)
    for name, path in built.items():
        print(f"built {name} -> {path}")
