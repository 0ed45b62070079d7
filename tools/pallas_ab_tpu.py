"""On-chip A/B: Pallas KR break-mask kernel vs the XLA formulation.

Round 5 (2026-08-20): the Mosaic compile wedge that blocked all Pallas
work on this tunneled chip (rounds 2-4; tools/mosaic_probe.py) is GONE —
the probe compiles and runs in ~18 s. This tool settles VERDICT r3 item 8:
compile ops/pallas_kernels.break_mask_pallas on the real chip, check it is
bit-identical to ops/pfp._break_mask at bench shape, and time both.

The other named candidate — a "descent-shaped" kernel for the LCP rank
descent / RMQ lookups — has no Pallas TPU expression: those are
per-element random HBM gathers, and Pallas TPU dynamic indexing is
block-granular (scalar-prefetch index maps select BLOCKS; arbitrary
per-lane HBM addressing isn't available). The XLA gather unit IS the
hardware primitive for them, already measured at ~9 ns/element.

Usage: python tools/pallas_ab_tpu.py [mbp]   (default 8)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mumemto_tpu.ops import pfp as ops_pfp
from mumemto_tpu.ops import pallas_kernels as pk


def timeit(fn, reps=10):
    fn()  # compile + warm
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    mbp = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    rng = np.random.default_rng(0)
    n_text = int(mbp * 1e6 * 2)  # incl. revcomp, as in the bench
    w, mod = 10, 100
    ext_np = np.concatenate([
        np.full(1, ops_pfp.DOLLAR_PFP, np.uint8),
        rng.integers(65, 85, n_text).astype(np.uint8),
        np.full(w, ops_pfp.DOLLAR_PFP, np.uint8)])
    ne = ops_pfp.bucket(ext_np.size)
    assert ne % pk.BLK == 0, f"ne={ne} not a multiple of BLK={pk.BLK}"
    ext_pad = np.zeros(ne, np.uint8)
    ext_pad[:ext_np.size] = ext_np
    ext = jnp.asarray(ext_pad)
    n_real = jnp.int32(n_text)
    print(f"n_text={n_text} ne={ne}", flush=True)

    t0 = time.time()
    mask_p, cnt_p = jax.block_until_ready(
        pk.break_mask_pallas(ext, n_real, w, mod, ne))
    print(f"pallas compile+run: {time.time() - t0:.1f}s "
          f"({int(cnt_p)} breaks)", flush=True)
    mask_x, cnt_x = jax.block_until_ready(
        ops_pfp._break_mask(ext, n_real, w, mod, ne))
    same = bool(jnp.array_equal(mask_p, mask_x)) and int(cnt_p) == int(cnt_x)
    print(f"bit-identical: {same}", flush=True)
    if not same:
        raise SystemExit("MISMATCH — do not enable the Pallas kernel")

    tx = timeit(lambda: ops_pfp._break_mask(ext, n_real, w, mod, ne))
    tp = timeit(lambda: pk.break_mask_pallas(ext, n_real, w, mod, ne))
    print(f"XLA   _break_mask:      {tx * 1e3:8.2f} ms", flush=True)
    print(f"Pallas break_mask:      {tp * 1e3:8.2f} ms "
          f"({tx / tp:.2f}x vs XLA)", flush=True)


if __name__ == "__main__":
    main()
