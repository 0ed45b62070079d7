"""Input-diversity smoke: oracle byte-equality over input classes the main
tests don't emphasize (homopolymer mixes, N-containing multi-record docs,
mixed option combos). Distilled from a 269-run fuzz sweep (0 mismatches,
2026-08-17); seeds chosen to cover each input style x option family."""

import numpy as np
import pytest

from mumemto_tpu import engine, options, refbuilder
from mumemto_tpu.oracle import naive
from tests.conftest import mutated_collection, rand_seq


def _docs(style: int, rng, n_docs: int):
    if style == 0:
        return mutated_collection(rng, n_docs, base_len=400)
    if style == 1:
        rep = rand_seq(rng, 50)
        return mutated_collection(rng, n_docs, base_len=300, insert_rep=rep)
    if style == 2:  # low-complexity / homopolymer mixes
        return [[("A" * int(rng.integers(50, 200))) + rand_seq(rng, 150)
                 + ("CG" * int(rng.integers(10, 60)))] for _ in range(n_docs)]
    # N-containing multi-record docs
    return [[rand_seq(rng, 120).replace("G", "N", 3), rand_seq(rng, 150)]
            for _ in range(n_docs)]


@pytest.mark.parametrize("style,cfg", [
    (2, {}),                                    # homopolymers, strict MUM
    (3, {}),                                    # Ns + multi-record
    (2, {"rare_freq": 2}),                      # homopolymers, MEM f=2
    (3, {"num_distinct_docs": -1}),             # Ns, partial MUM
    (1, {"rare_freq": 0, "max_mem_freq": 6}),   # repeats, F-capped MEM
    (0, {"merge": True, "min_match_len": 12}),  # merge metadata, short l
])
def test_fuzz_smoke(style, cfg):
    rng = np.random.default_rng(style * 7919 + 13)
    n_docs = 4
    docs = _docs(style, rng, n_docs)
    rb = refbuilder.build_from_sequences(docs)
    opts = options.normalize(rb.num_docs, quiet=True, **cfg)
    want = naive.oracle_output(rb, opts)
    got = engine.find_matches(rb, opts, backend="pfp").output_bytes()
    assert want == got
