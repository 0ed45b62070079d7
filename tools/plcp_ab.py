import os, sys, time, functools
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from mumemto_tpu import refbuilder
from mumemto_tpu.ops import pfp as ops_pfp
from mumemto_tpu.ops import suffix as ops_suffix

mbp = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
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
nd = h["nd"]
print(f"text={rb.text.size} nd={nd}", flush=True)


@functools.partial(jax.jit, static_argnames=("which",))
def run(ext, phrase_st, phrase_ln, d_starts, npz, total, which):
    d, _m = ops_pfp._dict_setup(ext, phrase_st, phrase_ln, d_starts,
                                npz, total, nd, h["ne"])
    saD, histD, lvlD = ops_suffix._suffix_array_impl(
        d, nd, packed_init=True, max_lvl=h["lvl_cap"],
        alpha_thresholds=h["seed_thr"])
    if which == "plcp":
        lcp, isa = ops_suffix._lcp_plcp_impl(
            saD, histD, d, nd, h["lvl_static"], h["seed_thr"],
            deep_cap=max(nd // 3, 1024))
    else:
        lcp = ops_suffix._lcp_impl(saD, histD, lvlD, nd,
                                   levels=h["lvl_static"], text=d,
                                   bottom_thresholds=h["lcp_thr"])
    return lcp.sum(dtype=jnp.int64) if False else lcp[::97].sum()


args = (pfp.ext, h["phrase_st"], h["phrase_ln"], h["d_starts"],
        h["npz"], h["total_real"])
for which in ("descent", "plcp"):
    r = jax.block_until_ready(run(*args, which))  # compile
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(run(*args, which))
        ts.append(time.time() - t0)
    print(f"{which}: best {min(ts):.2f}s  (lvl_static={h['lvl_static']})",
          flush=True)
