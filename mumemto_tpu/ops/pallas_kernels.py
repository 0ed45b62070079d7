"""Pallas TPU kernels for the PFP hot ops (opt-in).

First kernel: the rolling Karp-Rabin window-hash phrase-break mask (the
reference's per-character KR loop, newscan.hpp:84-115,310-325; HOT #1 in
SURVEY §3.1). The XLA formulation (ops/pfp._break_mask) materializes w
shifted copies of the ext array; this kernel streams one block (plus a
(w-1)-char halo from the previous block) through VMEM and emits the mask
in a single pass, with the same uint32 two-limb mod-p arithmetic.

Enabled with MUMEMTO_TPU_PALLAS=1 (ops/pfp.compute_breaks consults
`use_pallas()`); the XLA path remains the default. Both paths are
bit-identical (tested in interpreter mode against the XLA path).

STATUS on the current environment (re-tested round 5, 2026-08-20,
tools/mosaic_probe.py + tools/pallas_ab_tpu.py): a single-block 8x128
kernel now compiles and runs in ~18 s (the round-2 "any pallas_call
wedges the service" state is gone), but THIS kernel still hangs the
Mosaic compile at production shapes — a 16-block grid over 1M elements
sat > 20 min with no result (round 2 saw the same at > 400 s). The
kernel stays an opt-in exhibit + halo-blocking template; re-evaluate on
a directly-attached TPU. Note the measured perf context: the XLA
formulation of this mask costs 0.03 s at 16.7M chars — the hot paths
are hardware-gather-bound (LCP descent, RMQ lookups), and per-element
random HBM gathers have no Pallas TPU expression anyway (dynamic
indexing is block-granular scalar-prefetch), so the XLA gather unit is
the right primitive for them regardless.

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

from mumemto_tpu.ops.pfp import KR_PRIME

BLK = 65536  # elements per grid step (256 KiB of uint32 in VMEM)


def use_pallas() -> bool:
    return bool(os.environ.get("MUMEMTO_TPU_PALLAS"))


def _break_mask_kernel(w: int, mod: int, nreal_ref, prev_ref, cur_ref,
                       out_ref):
    """One block of ext coords: mask[k] = KR break at ext position
    i*BLK + k, with the w-1 halo chars taken from the previous block.
    Same two-limb arithmetic as ops/pfp._break_mask."""
    from jax.experimental import pallas as pl  # noqa: F401  (doc import)

    i = pl.program_id(0)
    p = jnp.uint32(KR_PRIME)
    cur = cur_ref[:].astype(jnp.uint32)
    halo = prev_ref[:].astype(jnp.uint32)  # previous BLK chars
    gidx = (i * BLK
            + jax.lax.broadcasted_iota(jnp.int32, (BLK, 1), 0).reshape(BLK))
    # win[j] = char at global ext position gidx - (w-1) + j, j in [0, BLK+w)
    win = jnp.concatenate([halo[BLK - (w - 1):], cur])
    # global position 0 is the unhashed decoration Dollar; positions < 0
    # (the artificial front pad block) are zero-filled by construction
    win_pos = (gidx[0] - (w - 1)
               + jax.lax.broadcasted_iota(jnp.int32, (BLK + w - 1, 1), 0
                                          ).reshape(BLK + w - 1))
    win = jnp.where(win_pos == 0, jnp.uint32(0), win)
    shi = jnp.zeros((BLK,), jnp.uint32)
    slo = jnp.zeros((BLK,), jnp.uint32)
    pw = 1
    for j in range(w):  # char j positions back carries 256^j (mod p)
        tj = win[(w - 1) - j:(w - 1) - j + BLK]
        ph, pl_ = pw >> 8, pw & 255
        shi = shi + tj * jnp.uint32(ph)
        shi = jnp.where(shi >= p, shi - p, shi)
        slo = slo + tj * jnp.uint32(pl_)
        pw = (pw * 256) % KR_PRIME
    for _ in range(8):
        shi = shi + shi
        shi = jnp.where(shi >= p, shi - p, shi)
    h = shi + slo
    h = jnp.where(h >= p, h - p, h)
    mask = (h % jnp.uint32(mod) == 0) & (gidx >= w) \
        & (gidx <= nreal_ref[0])
    out_ref[:] = mask


@functools.partial(jax.jit,
                   static_argnames=("w", "mod", "ne", "interpret"))
def break_mask_pallas(ext: jax.Array, n_real: jax.Array, w: int, mod: int,
                      ne: int, interpret: bool = False):
    """Drop-in replacement for ops/pfp._break_mask (same outputs)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert ne % BLK == 0, "ext bucket must be a multiple of the block size"
    padded = jnp.concatenate([jnp.zeros((BLK,), ext.dtype), ext])
    grid = (ne // BLK,)
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
        out_shape=jax.ShapeDtypeStruct((ne,), jnp.bool_),
        interpret=interpret,
    )(jnp.asarray([n_real], jnp.int32), padded, padded)
    return mask, mask.sum(dtype=jnp.int32)
