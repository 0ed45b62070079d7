import numpy as np

from mumemto_tpu import engine, refbuilder
from mumemto_tpu.ops import suffix as ops_suffix
from mumemto_tpu.oracle import naive


def _check_against_oracle(text_padded):
    sa, lcp, bwt = ops_suffix.suffix_lcp_arrays(text_padded)
    sa = np.asarray(sa)
    lcp = np.asarray(lcp)
    bwt = np.asarray(bwt)
    want_sa = naive.suffix_array_doubling(text_padded)
    assert (sa == want_sa).all()
    want_lcp = naive.lcp_kasai(text_padded, want_sa)
    assert (lcp == want_lcp).all()
    n = text_padded.size
    assert (bwt == text_padded[(sa + n - 1) % n]).all()


def test_sa_lcp_random(rng):
    for trial in range(3):
        n_real = int(rng.integers(50, 400))
        text = rng.integers(65, 91, n_real).astype(np.uint8)
        padded = np.zeros(engine.pad_size(n_real), dtype=np.uint8)
        padded[:n_real] = text
        _check_against_oracle(padded)


def test_sa_lcp_repetitive(rng):
    # highly repetitive text stresses deep LCPs
    unit = rng.integers(65, 69, 30).astype(np.uint8)
    text = np.tile(unit, 40)
    padded = np.zeros(engine.pad_size(text.size), dtype=np.uint8)
    padded[:text.size] = text
    _check_against_oracle(padded)


def test_naive_sa_matches_doubling(rng):
    text = rng.integers(0, 5, 200).astype(np.uint8)
    text[-1] = 0
    assert (naive.suffix_array_naive(text) == naive.suffix_array_doubling(text)).all()


def test_padding_is_output_neutral(rng, collection):
    """Different pad amounts must give identical match output."""
    from mumemto_tpu import options
    rb = refbuilder.build_from_sequences(collection)
    opts = options.normalize(rb.num_docs, quiet=True)
    outs = []
    for padded_n in (engine.pad_size(rb.text.size), 8192, 12288):
        arrs = engine.compute_arrays(rb, padded_n=padded_n)
        res = engine.find_matches_from_arrays(*arrs, rb, opts)
        outs.append(res.output_bytes())
    assert outs[0] == outs[1] == outs[2]
    assert outs[0]  # nonempty — the collection shares a mutated base
