"""PFP backend golden equivalence: identical bytes to the trusted oracle."""

import numpy as np
import pytest

from mumemto_tpu import engine, options, refbuilder
from mumemto_tpu.oracle import naive
from mumemto_tpu.ops import pfp as ops_pfp
from tests.conftest import mutated_collection, rand_seq


def _check(rb, opts):
    want = naive.oracle_output(rb, opts)
    got = engine.find_matches(rb, opts, backend="pfp").output_bytes()
    assert want == got
    return want


@pytest.mark.parametrize("use_revcomp", [True, False])
@pytest.mark.parametrize("k", [0, -1])
def test_pfp_mums(rng, use_revcomp, k):
    docs = mutated_collection(rng, int(rng.integers(2, 5)), base_len=400)
    rb = refbuilder.build_from_sequences(docs, use_revcomp=use_revcomp)
    opts = options.normalize(rb.num_docs, num_distinct_docs=k,
                             use_revcomp=use_revcomp, quiet=True)
    assert _check(rb, opts)


@pytest.mark.parametrize("k,f,F", [(0, 2, 0), (0, 0, 0)])
def test_pfp_mems(rng, k, f, F):
    rep = rand_seq(rng, 60)
    docs = mutated_collection(rng, 3, base_len=200, insert_rep=rep)
    rb = refbuilder.build_from_sequences(docs)
    opts = options.normalize(rb.num_docs, num_distinct_docs=k, rare_freq=f,
                             max_mem_freq=F, quiet=True)
    _check(rb, opts)


def test_pfp_edge_cases(rng):
    cases = [
        # tandem repeats: deep nesting + big same-suffix groups
        [[rand_seq(rng, 25) * 12 + "ACGT"], ["TTGG" + rand_seq(rng, 25) * 9]],
        # homopolymer run: giant phrase (few hash breaks)
        [["A" * 300 + rand_seq(rng, 50)], [rand_seq(rng, 40) + "A" * 280]],
        # tiny identical docs
        [["ACGTACGTACGTACGTACGTACGTA"], ["ACGTACGTACGTACGTACGTACGTA"]],
    ]
    for docs in cases:
        rb = refbuilder.build_from_sequences(docs)
        _check(rb, options.normalize(rb.num_docs, quiet=True))


def test_pfp_merge_metadata(rng):
    docs = mutated_collection(rng, 3, base_len=300)
    rb = refbuilder.build_from_sequences(docs)
    opts = options.normalize(rb.num_docs, merge=True, quiet=True)
    f_o = naive.run_finder(rb, opts)
    r_e = engine.find_matches(rb, opts, backend="pfp")
    assert (np.asarray(f_o.candidate_thresh) == r_e.candidate_thresh).all()
    fo, ro = f_o.thresh_arrays()
    dl0 = rb.seq_lengths[0] // 2
    fe, re_ = engine.thresh_arrays(r_e, dl0)
    assert (fo == fe).all() and (ro == re_).all()


def test_parse_files_roundtrip(rng, tmp_path):
    docs = mutated_collection(rng, 2, base_len=300)
    rb = refbuilder.build_from_sequences(docs)
    prefix = str(tmp_path / "p")
    ops_pfp.write_parse_files(rb, prefix)
    body, starts, lens, parse = ops_pfp.read_parse_files(prefix)
    pfp = ops_pfp.build_pfp(rb.text)
    assert parse.size == pfp.m
    assert (parse == pfp.parse).all()
    assert lens.size == pfp.num_phrases
    # reconstruct the text from parse + dict (overlap w): phrase j contributes
    # its chars minus the w-overlap with the next, validating the PFP invariant
    w = pfp.w
    rebuilt = []
    for j, pid in enumerate(parse):
        s, l = starts[pid - 1], lens[pid - 1]
        chunk = body[s:s + l]
        rebuilt.append(chunk[:-w] if j < parse.size - 1 else chunk)
    rebuilt = np.concatenate(rebuilt)
    # strip the leading artificial Dollar and trailing w Dollars
    assert (rebuilt[1:1 + rb.text.size] == rb.text).all()
    assert rebuilt[0] == ops_pfp.DOLLAR_PFP
    assert (rebuilt[1 + rb.text.size:] == ops_pfp.DOLLAR_PFP).all()
