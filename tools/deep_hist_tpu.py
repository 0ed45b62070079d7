"""One-off: distribution of true PLCP values over the dict's DEEP rows
(the rows whose 9-char probe saturates — the compacted-descent set of
ops/suffix._lcp_plcp_impl) at bench shape, measured on the real chip.

Decides whether a deeper packed probe (18/27 chars = 1-2 extra O(nd)
gathers) could shrink the deep set enough to cut the descent buffer
(deep_cap) — the descent is ~8 levels x 2 gathers over deep_cap rows,
the top cost inside the PLCP stage (~0.3 s of the 8 Mbp bench's 1.2 s
dict_index). If most deep rows share far more than 18 chars (whole
variant phrases), a deeper probe can't shrink the set and the idea dies.

Usage: python tools/deep_hist_tpu.py [mbp] (default 8)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mumemto_tpu import refbuilder
from mumemto_tpu.ops import pfp as ops_pfp
from mumemto_tpu.ops import suffix as ops_suffix

EDGES = (9, 18, 27, 36, 64, 128, 256, 512, 1024)


def main():
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
    pfp = ops_pfp.build_pfp(rb.text, w=10, mod=100)
    h = ops_pfp._host_prep(pfp, rb.doc_ends, rb.num_docs)
    nd, ne = h["nd"], h["ne"]
    probe_thr = h["seed_thr"]
    print(f"text={rb.text.size} nd={nd} lvl_static={h['lvl_static']}",
          flush=True)

    @jax.jit
    def analyze(ext, phrase_st, phrase_ln, d_starts, npz, total):
        d, _m = ops_pfp._dict_setup(ext, phrase_st, phrase_ln, d_starts,
                                    npz, total, nd, ne)
        saD, histD, lvlD = ops_suffix._suffix_array_impl(
            d, nd, packed_init=True, max_lvl=h["lvl_cap"],
            alpha_thresholds=probe_thr)
        # exact adjacent-row LCP via the full descent (slow, one-off)
        lcp = ops_suffix._lcp_impl(saD, histD, lvlD, nd,
                                   levels=h["lvl_static"], text=d,
                                   bottom_thresholds=h["lcp_thr"])
        idx = jnp.arange(nd, dtype=jnp.int32)
        prev_sa = jnp.concatenate([saD[:1], saD[:-1]])
        isa, phi = ops_suffix.route_set(saD, idx, prev_sa)
        plcp = jnp.take(lcp, isa)  # plcp[i] = LCP(i, phi[i])

        # the deep mask EXACTLY as _lcp_plcp_impl builds it
        code = jnp.zeros((nd,), jnp.int32)
        for t in probe_thr:
            code = code + (d > jnp.uint8(t)).astype(jnp.int32)
        q = code << 24
        for j in range(1, 9):
            q = q | (ops_suffix._shift_static(code, j, nd, 0) << (3 * (8 - j)))
        prevc = jnp.concatenate([jnp.zeros((1,), jnp.int32), code[:-1]])
        pw = (prevc << 27) | q
        pwp = jnp.take(pw, phi)
        isa_n = ops_suffix._shift_static(isa, 1, nd, 0)
        phi_n = ops_suffix._shift_static(phi, 1, nd, 0)
        pwp_n = ops_suffix._shift_static(pwp, 1, nd, 0)
        red = (isa_n > 0) & (phi_n >= 1) & (code == (pwp_n >> 27))
        irr = ~red
        mask9 = (1 << 27) - 1
        qj = pw & mask9
        qp = pwp & mask9
        c9 = jnp.zeros((nd,), jnp.int32)
        for k in range(1, 10):
            s = 27 - 3 * k
            c9 = c9 + ((qj >> s) == (qp >> s)).astype(jnp.int32)
        deep = irr & (c9 >= 9) & (isa > 0)
        counts = jnp.stack([
            jnp.sum(deep & (plcp >= e), dtype=jnp.int32) for e in EDGES])
        return jnp.sum(irr, dtype=jnp.int32), \
            jnp.sum(deep, dtype=jnp.int32), counts

    args = (pfp.ext, h["phrase_st"], h["phrase_ln"], h["d_starts"],
            h["npz"], h["total_real"])
    n_irr, n_deep, counts = jax.block_until_ready(analyze(*args))
    n_irr, n_deep = int(n_irr), int(n_deep)
    print(f"irreducible rows: {n_irr} ({100 * n_irr / nd:.1f}% of nd)")
    print(f"deep rows (9-char probe saturated): {n_deep} "
          f"({100 * n_deep / nd:.1f}% of nd); deep_cap nd//3 = {nd // 3}")
    for e, c in zip(EDGES, np.asarray(counts)):
        print(f"  deep rows with plcp >= {e:5d}: {int(c):9d} "
              f"({100 * int(c) / max(n_deep, 1):5.1f}% of deep, "
              f"{100 * int(c) / nd:5.2f}% of nd)")


if __name__ == "__main__":
    main()
