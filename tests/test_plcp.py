"""PLCP (irreducible-LCP) dictionary LCP path == classic rank descent.

ops/suffix._lcp_plcp_impl replaces ~16 O(nd) random-gather passes with ~4
(see its docstring). Equivalence contract: exact on every row except
tie-interior rows (true LCP beyond the capped doubling depth), where both
implementations produce values >= maxlen+1 that no consumer reads
un-clamped, and zero-pad-class rows, which canonicalize_pad_lcp pins to
the same value in both. So: clamped-at-maxlen+1 equality after
canonicalization, on inputs covering the hazard classes (repetitive tie
blocks, random high-irreducible-fraction text, multi-record docs), plus
the lax.cond fallback when the deep-row buffer would overflow.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mumemto_tpu import engine, options, refbuilder
from mumemto_tpu.ops import pfp as ops_pfp
from mumemto_tpu.ops import suffix as ops_suffix
from tests.conftest import mutated_collection, rand_seq


@functools.partial(jax.jit, static_argnames=("nd", "ne", "w", "lvl_cap",
                                             "lvl_static", "seed_thr",
                                             "lcp_thr", "deep_cap",
                                             "probe_words", "deep_cap_small"))
def _both_lcps(ext, phrase_st, phrase_ln, d_starts, npz, total, nd, ne, w,
               lvl_cap, lvl_static, seed_thr, lcp_thr, deep_cap,
               probe_words, deep_cap_small):
    d, _meta = ops_pfp._dict_setup(ext, phrase_st, phrase_ln, d_starts,
                                   npz, total, nd, ne)
    saD, histD, lvlD = ops_suffix._suffix_array_impl(
        d, nd, packed_init=True, max_lvl=lvl_cap, alpha_thresholds=seed_thr)
    old = ops_suffix._lcp_impl(saD, histD, lvlD, nd, levels=lvl_static,
                               text=d, bottom_thresholds=lcp_thr)
    new, isa = ops_suffix._lcp_plcp_impl(saD, histD, d, nd, lvl_static,
                                         seed_thr, deep_cap=deep_cap,
                                         probe_words=probe_words,
                                         deep_cap_small=deep_cap_small)
    old = ops_suffix.canonicalize_pad_lcp(old, saD, total, nd)
    new = ops_suffix.canonicalize_pad_lcp(new, saD, total, nd)
    return old, new, saD, isa


def _check(docs, deep_cap=None, probe_words=1, deep_cap_small=None):
    rb = refbuilder.build_from_sequences(docs)
    pfp = ops_pfp.build_pfp(rb.text, w=10, mod=100)
    h = ops_pfp._host_prep(pfp, rb.doc_ends, rb.num_docs)
    cap = deep_cap if deep_cap is not None else max(h["nd"] // 3, 1024)
    old, new, saD, isa = _both_lcps(
        pfp.ext, h["phrase_st"], h["phrase_ln"], h["d_starts"],
        h["npz"], h["total_real"], h["nd"], h["ne"], h["w"],
        h["lvl_cap"], h["lvl_static"], h["seed_thr"], h["lcp_thr"], cap,
        probe_words, deep_cap_small)
    clamp = int(pfp.phrase_ln.max()) + 1
    old = np.minimum(np.asarray(old), clamp)
    new = np.minimum(np.asarray(new), clamp)
    np.testing.assert_array_equal(old, new)
    # the isa byproduct must be the scatter-inverse of saD
    sa = np.asarray(saD)
    assert (np.asarray(isa)[sa] == np.arange(sa.size)).all()


@pytest.mark.parametrize("probe_words", [1, 2])
def test_plcp_mutated(rng, probe_words):
    _check(mutated_collection(rng, 4, base_len=900),
           probe_words=probe_words)


@pytest.mark.parametrize("probe_words", [1, 2])
def test_plcp_repetitive(rng, probe_words):
    """Tie blocks from heavy repeats — the chain/clamp hazard class."""
    rep = rand_seq(rng, 60)
    docs = [[rand_seq(rng, 100) + rep * 12 + rand_seq(rng, 80) + rep * 9]
            for _ in range(3)]
    _check(docs, probe_words=probe_words)


def test_plcp_random(rng):
    """Random text: high irreducible fraction stresses the probe."""
    _check([[rand_seq(rng, 3000)] for _ in range(2)])


def test_plcp_deep_cap_overflow_fallback(rng):
    """deep_cap=1 forces the lax.cond slow branch (classic descent) —
    output must be unchanged."""
    _check(mutated_collection(rng, 3, base_len=600), deep_cap=1)


def test_plcp_tier1_small_cap(rng):
    """probe_words=2 with a generous small tier: the 18-char probe sends
    nearly all 9-char-saturated rows to their exact probe value, so the
    first-tier buffer suffices (the production _dict_index configuration,
    nd//16 + nd//3 + full fallback)."""
    docs = mutated_collection(rng, 4, base_len=900)
    rb = refbuilder.build_from_sequences(docs)
    pfp = ops_pfp.build_pfp(rb.text, w=10, mod=100)
    nd = ops_pfp._host_prep(pfp, rb.doc_ends, rb.num_docs)["nd"]
    _check(docs, probe_words=2, deep_cap_small=max(nd // 16, 1024))


def test_plcp_tier2_when_small_overflows(rng):
    """deep_cap_small=1 forces the first tier to overflow — the nested
    lax.cond must land on the second (deep_cap) tier, byte-equal."""
    _check(mutated_collection(rng, 3, base_len=600), probe_words=2,
           deep_cap_small=1)


def test_plcp_slow_when_both_overflow(rng):
    """Both tiers overflow (1 and 2) — the full-width descent fallback
    still produces identical values with the 18-char probe."""
    _check(mutated_collection(rng, 3, base_len=600), deep_cap=2,
           probe_words=2, deep_cap_small=1)


def test_plcp_end_to_end_bytes(rng):
    """Engine output through the PLCP dict path == oracle bytes (the
    default engine path now uses it for canonical alphabets)."""
    from mumemto_tpu.oracle import naive
    docs = mutated_collection(rng, 4, base_len=800)
    rb = refbuilder.build_from_sequences(docs)
    opts = options.normalize(rb.num_docs, merge=True, quiet=True)
    got = engine.find_matches(rb, opts, backend="pfp").output_bytes()
    assert got == naive.oracle_output(rb, opts)
