"""Pallas TPU kernels for the PFP hot ops (opt-in).

First kernel: the rolling window-hash phrase-break mask (the reference's
per-character Karp-Rabin loop, newscan.hpp:310-325; HOT #1 in SURVEY §3.1).
The XLA formulation (ops/pfp._break_mask) materializes w shifted copies of
the text; this kernel streams one block (plus a (w-1)-char halo from the
previous block) through VMEM and emits the mask in a single pass.

Enabled with MUMEMTO_TPU_PALLAS=1 (ops/pfp.compute_breaks consults
`use_pallas()`); the XLA path remains the default. Both paths are
bit-identical (tested in interpreter mode against the XLA path).

STATUS on the current environment: Mosaic compilation of this kernel
through the tunneled axon device stalls indefinitely (observed even at 1M
elements; the same compiler pathology class as tuple-carry
lax.associative_scan, see ops/pfp._segmented_min_after_valid). The kernel
is therefore an opt-in exhibit + the round-2 halo-blocking template, not
the default path; on a directly-attached TPU it should be re-evaluated.

Blocking scheme (the round-2 template for halo kernels): the input is
front-padded by one block so every grid step can read (prev, cur) block
pairs through two BlockSpecs on the same array — a static halo without
unaligned index maps.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from mumemto_tpu.ops.pfp import HASH_BASE

BLK = 65536  # elements per grid step (256 KiB of uint32 in VMEM)


def use_pallas() -> bool:
    return bool(os.environ.get("MUMEMTO_TPU_PALLAS"))


def _break_mask_kernel(w: int, mod: int, nreal_ref, prev_ref, cur_ref,
                       out_ref):
    """One block: mask[i] = (hash(text[i-w+1..i]) % mod == 0) for global
    i in this block, with the w-1 halo chars taken from prev block."""
    from jax.experimental import pallas as pl  # noqa: F401  (doc import)

    i = pl.program_id(0)
    cur = cur_ref[:].astype(jnp.uint32)
    halo = prev_ref[:].astype(jnp.uint32)  # previous BLK chars
    # ext[j] = char at global position i*BLK + j - (w-1), j in [0, BLK+w-1)
    ext = jnp.concatenate([halo[BLK - (w - 1):], cur])
    h = jnp.zeros((BLK,), jnp.uint32)
    power = jnp.uint32(1)
    for k in range(w):  # char at window offset (w-1-k) carries BASE^k
        h = h + ext[(w - 1) - k:(w - 1) - k + BLK] * power
        power = power * jnp.uint32(HASH_BASE)
    gidx = (i * BLK
            + jax.lax.broadcasted_iota(jnp.int32, (BLK, 1), 0).reshape(BLK))
    mask = (h % jnp.uint32(mod) == 0) & (gidx >= w - 1) \
        & (gidx < nreal_ref[0])
    out_ref[:] = mask


@functools.partial(jax.jit,
                   static_argnames=("w", "mod", "n", "interpret"))
def break_mask_pallas(text: jax.Array, n_real: jax.Array, w: int, mod: int,
                      n: int, interpret: bool = False):
    """Drop-in replacement for ops/pfp._break_mask (same outputs)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n % BLK == 0, "text bucket must be a multiple of the block size"
    padded = jnp.concatenate([jnp.zeros((BLK,), text.dtype), text])
    grid = (n // BLK,)
    mask = pl.pallas_call(
        functools.partial(_break_mask_kernel, w, mod),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK,), lambda i: (i,),       # prev block (halo)
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK,), lambda i: (i + 1,),   # current block
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.bool_),
        interpret=interpret,
    )(jnp.asarray([n_real], jnp.int32), padded, padded)
    return mask, mask.sum(dtype=jnp.int32)
