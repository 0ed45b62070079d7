"""AOT HBM peak analysis of the fused scan program (no execution).

Compiles ops/pfp._full_scan for a bench-shaped input and prints the
compiled memory analysis (argument/output/temp/peak bytes) — the tool
that replaces guesswork about the 16 GB HBM ceiling at the 32 Mbp tier
(BENCH_r04 compile OOM; the 18-char-probe runtime OOM of 2026-08-20).

Set MUMEMTO_PLCP_PROBE2=1/0 to A/B the probe-gate variants.

Usage: python tools/hbm_analysis_tpu.py [mbp] (default 32)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mumemto_tpu import refbuilder
from mumemto_tpu.ops import pfp as ops_pfp


def main():
    mbp = float(sys.argv[1]) if len(sys.argv) > 1 else 32.0
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
    print(f"shapes: nd={h['nd']} nr={h['nr']} mp={h['mp']} "
          f"probe2_env={os.environ.get('MUMEMTO_PLCP_PROBE2')}", flush=True)

    from mumemto_tpu import engine, options
    opts = options.normalize(rb.num_docs, quiet=True)
    size_cap = engine.interval_size_cap(opts, rb.num_docs)
    t0 = time.time()
    lowered = ops_pfp._full_scan.lower(
        pfp.ext, h["phrase_st"], h["phrase_ln"], h["d_starts"], h["npz"],
        h["total_real"], h["parse"], h["cumC"], h["cumcnt"], h["m"],
        h["total_rows"], h["n_text"], h["doc_ends"],
        jnp.int32(opts.min_match_len), jnp.int32(opts.num_distinct),
        jnp.int32(opts.max_total_freq),
        nd=h["nd"], ne=h["ne"], nr=h["nr"], mp=h["mp"], w=h["w"],
        num_docs=rb.num_docs, lvl_cap=h["lvl_cap"],
        lvl_static=h["lvl_static"], seed_thr=h["seed_thr"],
        lcp_thr=h["lcp_thr"], max_doc_freq=opts.max_doc_freq,
        size_cap=size_cap, need_ctx=opts.merge)
    compiled = lowered.compile()
    print(f"compile: {time.time() - t0:.0f}s", flush=True)
    ma = compiled.memory_analysis()
    gb = 1 << 30
    try:
        print(f"args {ma.argument_size_in_bytes / gb:.2f} GB, "
              f"outputs {ma.output_size_in_bytes / gb:.2f} GB, "
              f"temps {ma.temp_size_in_bytes / gb:.2f} GB, "
              f"gen {ma.generated_code_size_in_bytes / gb:.3f} GB")
        peak = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                + ma.temp_size_in_bytes)
        print(f"peak (args+out+temps): {peak / gb:.2f} GB of ~15.75 GB")
    except AttributeError:
        print(ma)


if __name__ == "__main__":
    main()
