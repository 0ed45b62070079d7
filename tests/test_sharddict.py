"""Sharded dict index (parallel/sharddict.py) == replicated ops/pfp index.

Table-level equality: d / grp_of_pos / grp_cross must be bit-identical;
lcpD is compared clamped at maxlen+1 (tie-interior rows — suffix pairs
sharing more than 2^cap chars — may pair differently under the distributed
bitonic sort and chain differently under the replicated PLCP path, but
every such value is >= 2^lvl_static - 1 >= maxlen+1 in BOTH
implementations and is never consumed un-clamped; zero-pad-class rows are
canonicalized identically in both; all other rows are exact);
isaD is compared at whole-phrase rows (the only positions the parse side
reads), which are never tied. Plus end-to-end byte equality of the full
seq-sharded scan with the dict stage distributed.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mumemto_tpu import engine, options, refbuilder
from mumemto_tpu.ops import pfp as ops_pfp
from mumemto_tpu.parallel import seqpfp, sharddict
from tests.conftest import mutated_collection, rand_seq


def _mesh(nshards):
    devs = np.asarray(jax.devices()[:nshards]).reshape(nshards)
    return jax.sharding.Mesh(devs, ("seq",))


def _both_indexes(rb, nshards):
    pfp = ops_pfp.build_pfp(rb.text, w=10, mod=100)
    h = ops_pfp._host_prep(pfp, rb.doc_ends, rb.num_docs)
    ref = ops_pfp._dict_index(
        pfp.ext, h["phrase_st"], h["phrase_ln"], h["d_starts"],
        h["npz"], h["total_real"], h["nd"], h["ne"], h["w"],
        h["lvl_cap"], h["lvl_static"], h["seed_thr"], h["lcp_thr"])
    fn = sharddict.compile_sharded_dict_index(
        _mesh(nshards), "seq", h["nd"], h["ne"], h["w"], h["lvl_cap"],
        h["lvl_static"], h["seed_thr"], h["lcp_thr"])
    got = fn(pfp.ext, h["phrase_st"], h["phrase_ln"], h["d_starts"],
             h["npz"], h["total_real"])
    maxlen = int(pfp.phrase_ln.max())
    d_starts = np.asarray(h["d_starts"])[1:int(h["npz"]) + 1]
    return ref, got, maxlen, d_starts


def _check_tables(ref, got, maxlen, d_starts):
    d_r, lcp_r, isa_r, gop_r, gcr_r = (np.asarray(x) for x in ref)
    d_g, lcp_g, isa_g, gop_g, gcr_g = (np.asarray(x) for x in got)
    assert (d_r == d_g).all()
    clamp = maxlen + 1
    assert (np.minimum(lcp_r, clamp) == np.minimum(lcp_g, clamp)).all()
    assert (gop_r == gop_g).all()
    assert (gcr_r == gcr_g).all()
    # whole-phrase suffixes are untied under the depth cap -> exact ranks
    assert (isa_r[d_starts] == isa_g[d_starts]).all()


@pytest.mark.parametrize("nshards", [1, 2, 4, 8])
def test_sharded_dict_tables(rng, nshards):
    docs = mutated_collection(rng, 4, base_len=900)
    rb = refbuilder.build_from_sequences(docs)
    _check_tables(*_both_indexes(rb, nshards))


def test_sharded_dict_tables_repetitive(rng):
    """Heavy repeats -> large dict tie blocks, the hazard class for the
    distributed tie-order argument."""
    rep = rand_seq(rng, 80)
    docs = mutated_collection(rng, 4, base_len=600, insert_rep=rep)
    rb = refbuilder.build_from_sequences(docs)
    _check_tables(*_both_indexes(rb, 8))


@pytest.mark.parametrize("nshards", [2, 8])
def test_sharded_dict_end_to_end(rng, nshards):
    docs = mutated_collection(rng, 4, base_len=800)
    rb = refbuilder.build_from_sequences(docs)
    opts = options.normalize(rb.num_docs, quiet=True)
    want = engine.find_matches(rb, opts, backend="pfp").output_bytes()
    got = seqpfp.find_matches_seq_sharded(
        rb, opts, _mesh(nshards), shard_dict=True).output_bytes()
    assert want == got


def test_sharded_dict_end_to_end_merge(rng):
    """Merge metadata (candidate thresholds) with the sharded dict stage."""
    docs = mutated_collection(rng, 3, base_len=700)
    rb = refbuilder.build_from_sequences(docs)
    opts = options.normalize(rb.num_docs, merge=True, quiet=True)
    single = engine.find_matches(rb, opts, backend="pfp")
    sharded = seqpfp.find_matches_seq_sharded(rb, opts, _mesh(4),
                                              shard_dict=True)
    assert single.output_bytes() == sharded.output_bytes()
    assert (single.candidate_thresh == sharded.candidate_thresh).all()


def test_sharded_dict_env_opt_in(rng, monkeypatch):
    monkeypatch.setenv("MUMEMTO_SHARD_DICT", "1")
    docs = mutated_collection(rng, 3, base_len=500)
    rb = refbuilder.build_from_sequences(docs)
    opts = options.normalize(rb.num_docs, quiet=True)
    want = engine.find_matches(rb, opts, backend="pfp").output_bytes()
    got = seqpfp.find_matches_seq_sharded(rb, opts, _mesh(4)).output_bytes()
    assert want == got
