"""Bounded Mosaic/Pallas compile probe (VERDICT r3 item 8).

Round 2 found that ANY pallas_call compile wedged the tunneled chip's
process (not just slow — unkillable in-process hangs), so Pallas kernels
were shipped interpreter-tested only (ops/pallas_kernels.py docstring).
This probe re-tests in a SEPARATE process under a hard timeout so a wedge
cannot take the session down: rc 0 -> Mosaic compiles now (re-evaluate
kernels), rc 9/timeout -> still wedged, record and move on.

Run: python tools/mosaic_probe.py [timeout_s]
"""
import os
import subprocess
import sys
import time

CHILD = r"""
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

def add_one(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1

x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
y = pl.pallas_call(
    add_one, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
assert (jnp.asarray(y) == x + 1).all()
print("MOSAIC_OK", jax.devices()[0].platform, flush=True)
"""


def main():
    timeout_s = float(sys.argv[1]) if len(sys.argv) > 1 else 600.0
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", CHILD],
                           capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(f"mosaic probe: TIMEOUT after {timeout_s:.0f}s "
              f"(compile wedge still present)", flush=True)
        raise SystemExit(2)
    dt = time.time() - t0
    if r.returncode == 0 and "MOSAIC_OK" in r.stdout:
        print(f"mosaic probe: OK in {dt:.0f}s — {r.stdout.strip()}",
              flush=True)
        return
    tail = (r.stderr or "").strip().splitlines()
    print(f"mosaic probe: FAILED rc={r.returncode} in {dt:.0f}s: "
          f"{tail[-3:] if tail else ''}", flush=True)
    raise SystemExit(1)


if __name__ == "__main__":
    main()
