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


def test_plcp_direct_text_exact(rng):
    """Direct-backend PLCP (traced num_lvl, uncapped history) == classic
    descent EXACTLY on real rows (no depth cap -> no tie-interior class),
    with zero-pad rows canonicalized identically; repetitive content
    exercises both the compacted deep descent and, at deep_cap=1, the
    lax.cond fallback."""
    import functools

    import jax
    import jax.numpy as jnp

    from mumemto_tpu.ops import pfp as ops_pfp
    from tests.conftest import mutated_collection

    docs = mutated_collection(rng, 3, base_len=1200)
    rb = refbuilder.build_from_sequences(docs)
    padded = np.zeros(engine.pad_size(rb.text.size), dtype=np.uint8)
    padded[: rb.text.size] = rb.text
    n = padded.size
    seed_thr, lcp_thr = ops_pfp.seed_thresholds(padded[: rb.text.size])
    assert seed_thr is not None
    total = int(rb.doc_ends[-1]) + 1

    @functools.partial(jax.jit, static_argnames=("deep_cap",))
    def both(text, deep_cap):
        sa, hist, num_lvl = ops_suffix._suffix_array_impl(
            text, n, packed_init=True, alpha_thresholds=seed_thr)
        old = ops_suffix._lcp_impl(sa, hist, num_lvl, n, text=text,
                                   bottom_thresholds=lcp_thr)
        new, isa = ops_suffix._lcp_plcp_impl(
            sa, hist, text, n, hist.shape[0], seed_thr,
            deep_cap=deep_cap, num_lvl=num_lvl)
        old = ops_suffix.canonicalize_pad_lcp(old, sa, total, n)
        new = ops_suffix.canonicalize_pad_lcp(new, sa, total, n)
        return old, new, sa, isa

    text = jnp.asarray(padded)
    for cap in (max(n // 4, 1024), 1):  # fast path, then forced fallback
        old, new, sa, isa = both(text, cap)
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
        sa = np.asarray(sa)
        assert (np.asarray(isa)[sa] == np.arange(n)).all()
