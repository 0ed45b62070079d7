"""TPU profile of the fused dict_index program's sub-stages at bench shape.

dict_index is ONE fused program in production (no per-stage dispatch), so
this tool times progressively longer prefixes of its body — setup, +SA
doubling, +PLCP, +groups — each as its own jit. Differences between
consecutive rows approximate the marginal cost of each sub-stage (XLA may
fuse differently per prefix; treat as a guide, not gospel).

Usage: python tools/dict_stage_tpu.py [mbp] (default 8, the bench shape).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mumemto_tpu import refbuilder
from mumemto_tpu.ops import pfp as ops_pfp
from mumemto_tpu.ops import suffix as ops_suffix

mbp = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
rng = np.random.default_rng(0)
n_docs = 8
base_len = int(mbp * 1e6 / n_docs)
base = rng.integers(0, 4, base_len, dtype=np.int8)
acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
docs = []
for d in range(n_docs):
    s = base.copy()
    pos = rng.integers(0, base_len, max(1, base_len // 1000))
    s[pos] = (s[pos] + rng.integers(1, 4, pos.size)) % 4
    docs.append([bytes(acgt[s])])
rb = refbuilder.build_from_sequences(docs)
w = int(os.environ.get("MUMEMTO_BENCH_W", 10))
mod = int(os.environ.get("MUMEMTO_BENCH_MOD", 100))
pfp = ops_pfp.build_pfp(rb.text, w=w, mod=mod)
h = ops_pfp._host_prep(pfp, rb.doc_ends, rb.num_docs)
nd = h["nd"]
maxlen = int(pfp.phrase_ln.max())
print(f"text={rb.text.size} nd={nd} lvl_cap={h['lvl_cap']} "
      f"lvl_static={h['lvl_static']} maxlen={maxlen} w={w} mod={mod}",
      flush=True)


@functools.partial(jax.jit, static_argnames=("upto",))
def run(ext, phrase_st, phrase_ln, d_starts, npz, total, upto):
    d, pos_meta = ops_pfp._dict_setup(ext, phrase_st, phrase_ln, d_starts,
                                      npz, total, nd, h["ne"])
    if upto == "setup":
        return d.astype(jnp.int32)[::97].sum()
    saD, histD, lvlD = ops_suffix._suffix_array_impl(
        d, nd, packed_init=True, max_lvl=h["lvl_cap"],
        alpha_thresholds=h["seed_thr"])
    if upto == "sa":
        return saD[::97].sum()
    lcpD, isaD = ops_suffix._lcp_plcp_impl(
        saD, histD, d, nd, h["lvl_static"], h["seed_thr"],
        deep_cap=max(nd // 3, 1024))
    if upto == "plcp":
        return lcpD[::97].sum() + isaD[::97].sum()
    lcpD = ops_suffix.canonicalize_pad_lcp(lcpD, saD, total, nd)
    grp_of_pos, grp_cross = ops_pfp._dict_groups(d, saD, lcpD, pos_meta,
                                                 nd, w)
    return grp_of_pos[::97].sum() + grp_cross[::97].sum() + isaD[::97].sum()


args = (pfp.ext, h["phrase_st"], h["phrase_ln"], h["d_starts"],
        h["npz"], h["total_real"])
prev = 0.0
for upto in ("setup", "sa", "plcp", "groups"):
    jax.block_until_ready(run(*args, upto=upto))  # compile
    ts = []
    for _ in range(4):
        t0 = time.time()
        jax.block_until_ready(run(*args, upto=upto))
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"{upto:8s}: cumulative {best:.3f}s  (marginal {best - prev:+.3f}s)",
          flush=True)
    prev = best
