"""Pin the vectorized host emit/threshold paths (VERDICT r3 item 4).

The emitters became numpy array programs (engine._emit_mems line assembly,
MatchResults.mum_lines, engine.thresh_arrays); these tests pin their output
BYTES against the straightforward per-match loop transcriptions of the
reference writers (mem_finder.hpp:210-263, :406-425, :116-157) that they
replaced, on randomized synthetic match sets — and bound host time at the
10^5-match scale (the merge-mode chr-scale workload class)."""

import time

import numpy as np
import pytest

from mumemto_tpu import engine, formats
from mumemto_tpu.options import MatchOptions


# ---- loop transcriptions of the pre-vectorization emitters (oracles) ----

def loop_mem_lines(s, e, L, w_sa, w_da, valid, opts, doc_offsets, doc_lens):
    m = len(s)
    num_docs = len(doc_lens)
    W = valid.shape[1]
    nv = valid.sum(axis=1).astype(np.int64)
    docs = np.minimum(w_da, num_docs - 1)
    pos = w_sa.astype(np.int64) - doc_offsets[docs]
    dl = doc_lens[docs]
    neg = (valid & (pos >= dl)) if opts.use_revcomp else np.zeros_like(valid)
    is_last = np.arange(W)[None, :] == (nv[:, None] - 1)
    tpos = np.where(neg, 2 * dl - pos - L[:, None].astype(np.int64)
                    - 1 + is_last, pos)
    lines, records = [], []
    for i in range(m):
        k = int(nv[i])
        p = tpos[i, :k]
        d = w_da[i, :k]
        sn = neg[i, :k]
        strand = ["-" if x else "+" for x in sn]
        lines.append(formats.format_mem_line(int(L[i]), p.tolist(),
                                             d.tolist(), strand))
        records.append((int(L[i]), p, d.astype(np.int64), ~sn))
    return lines, records


def loop_mum_lines(lengths, offsets, strands):
    out = []
    for i in range(len(lengths)):
        ss = ["+" if s > 0 else "-" for s in strands[i]]
        out.append(formats.format_mum_line(
            int(lengths[i]), [int(x) for x in offsets[i]], ss))
    return out


def loop_thresh_arrays(mum_positions, candidate_thresh, doc_len0):
    mp = mum_positions[np.argsort(mum_positions[:, 0], kind="stable")]
    total = int((mp[:, 1] + 1).sum())
    fwd = np.zeros(total, dtype=np.uint16)
    rev = np.zeros(total, dtype=np.uint16)
    ct = candidate_thresh
    offset = 0
    for pos, length in mp.tolist():
        revpos = 2 * doc_len0 - pos - length - 1
        jj = np.arange(length)
        fv = ct[pos + jj]
        rv = ct[revpos + jj]
        sel = fv < (length - jj)
        fwd[offset:offset + length][sel] = fv[sel]
        sel = rv < (length - jj)
        rev[offset:offset + length][sel] = rv[sel]
        offset += length + 1
    return fwd, rev


# ---- synthetic match-set generators ----

def synth_mem_windows(m, num_docs, rng, W=6):
    doc_len = 10_000
    doc_lens = np.full(num_docs, doc_len, dtype=np.int64)
    doc_offsets = np.arange(num_docs, dtype=np.int64) * 2 * doc_len
    nv = rng.integers(2, W + 1, m)
    s = rng.integers(0, 1000, m).astype(np.int64)
    e = s + nv
    L = rng.integers(20, 200, m).astype(np.int64)
    valid = (s[:, None] + np.arange(W)) < e[:, None]
    w_da = rng.integers(0, num_docs, (m, W)).astype(np.int32)
    # in-doc positions on both strands, far enough from the end that the
    # revcomp transform stays in range
    inpos = rng.integers(0, 2 * doc_len - 300, (m, W)).astype(np.int64)
    w_sa = doc_offsets[np.minimum(w_da, num_docs - 1)] + inpos
    return s, e, L, w_sa, w_da, valid, doc_offsets, doc_lens


def synth_mums(m, num_docs, rng):
    lengths = rng.integers(20, 200, m).astype(np.int64)
    offsets = rng.integers(0, 10_000, (m, num_docs)).astype(np.int64)
    strands = rng.choice(np.array([-1, 1], np.int8), (m, num_docs))
    absent = rng.random((m, num_docs)) < 0.3
    # canonical: doc with column index `first present` is '+', emitter
    # output doesn't require it, so leave randomized
    offsets[absent] = -1
    strands[absent] = 0
    # at least one present doc per row
    none = ~(offsets != -1).any(axis=1)
    offsets[none, 0] = 7
    strands[none, 0] = 1
    return lengths, offsets, strands


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("revcomp", [True, False])
def test_mem_lines_match_loop(seed, revcomp):
    rng = np.random.default_rng(seed)
    m, num_docs = 257, 5
    s, e, L, w_sa, w_da, valid, doc_offsets, doc_lens = \
        synth_mem_windows(m, num_docs, rng)
    opts = MatchOptions(max_doc_freq=3, use_revcomp=revcomp)
    res = engine.MatchResults(opts=opts, num_docs=num_docs)
    engine._emit_mems(res, s, e, L, w_sa, w_da, valid, opts,
                      doc_offsets, doc_lens)
    want_lines, want_recs = loop_mem_lines(
        s, e, L, w_sa, w_da, valid, opts, doc_offsets, doc_lens)
    assert res.mem_lines == want_lines
    assert len(res.mem_records) == len(want_recs)
    for got, want in zip(res.mem_records, want_recs):
        assert got[0] == want[0]
        np.testing.assert_array_equal(got[1], want[1])
        np.testing.assert_array_equal(got[2], want[2])
        np.testing.assert_array_equal(got[3], want[3])
    # slice + truthiness (library.py / test_matches consumers)
    assert res.mem_records
    assert len(res.mem_records[1:3]) == 2


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("num_docs", [1, 2, 7])
def test_mum_lines_match_loop(seed, num_docs):
    rng = np.random.default_rng(seed)
    lengths, offsets, strands = synth_mums(311, num_docs, rng)
    res = engine.MatchResults(opts=MatchOptions(), num_docs=num_docs,
                              lengths=lengths, offsets=offsets,
                              strands=strands)
    assert res.mum_lines() == loop_mum_lines(lengths, offsets, strands)


def test_mum_lines_empty():
    res = engine.MatchResults(
        opts=MatchOptions(), num_docs=3,
        lengths=np.zeros(0, np.int64),
        offsets=np.zeros((0, 3), np.int64),
        strands=np.zeros((0, 3), np.int8))
    assert res.mum_lines() == []


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_thresh_arrays_match_loop(seed):
    rng = np.random.default_rng(seed)
    doc_len0 = 50_000
    m = 301
    lengths = rng.integers(1, 120, m).astype(np.int64)
    pos = rng.integers(0, doc_len0 - 200, m).astype(np.int64)
    mp = np.stack([pos, lengths], axis=1)
    ct = rng.integers(0, 300, 2 * doc_len0).astype(np.int64)
    res = engine.MatchResults(opts=MatchOptions(merge=True), num_docs=2,
                              mum_positions=mp, candidate_thresh=ct)
    fwd, rev = engine.thresh_arrays(res, doc_len0)
    wf, wr = loop_thresh_arrays(mp, ct, doc_len0)
    np.testing.assert_array_equal(fwd, wf)
    np.testing.assert_array_equal(rev, wr)


def test_thresh_arrays_zero_length_mums():
    # length-0 rows contribute only their separator slot
    mp = np.array([[10, 0], [5, 3]], dtype=np.int64)
    ct = np.ones(200, dtype=np.int64)
    res = engine.MatchResults(opts=MatchOptions(merge=True), num_docs=2,
                              mum_positions=mp, candidate_thresh=ct)
    fwd, rev = engine.thresh_arrays(res, 50)
    wf, wr = loop_thresh_arrays(mp, ct, 50)
    np.testing.assert_array_equal(fwd, wf)
    np.testing.assert_array_equal(rev, wr)


def test_emit_speed_1e5_matches():
    """VERDICT r3 item 4 'done' bar: a 10^5-match set emits in < 2 s of
    host time (was minutes-class with per-match Python loops at chr
    scale). Measured in process CPU time so concurrent test workers or a
    busy host cannot flake the bound (it did under xdist -n 4)."""
    rng = np.random.default_rng(3)
    m, num_docs = 100_000, 8
    s, e, L, w_sa, w_da, valid, doc_offsets, doc_lens = \
        synth_mem_windows(m, num_docs, rng, W=8)
    opts = MatchOptions(max_doc_freq=3)
    res = engine.MatchResults(opts=opts, num_docs=num_docs)
    t0 = time.process_time()
    engine._emit_mems(res, s, e, L, w_sa, w_da, valid, opts,
                      doc_offsets, doc_lens)
    t_mem = time.process_time() - t0
    assert len(res.mem_lines) == m

    lengths, offsets, strands = synth_mums(m, num_docs, rng)
    res2 = engine.MatchResults(opts=MatchOptions(), num_docs=num_docs,
                               lengths=lengths, offsets=offsets,
                               strands=strands)
    t0 = time.process_time()
    lines = res2.mum_lines()
    t_mum = time.process_time() - t0
    assert len(lines) == m

    doc_len0 = 40_000_000
    pos = rng.integers(0, doc_len0 - 300, m).astype(np.int64)
    mlen = rng.integers(20, 200, m).astype(np.int64)
    res3 = engine.MatchResults(
        opts=MatchOptions(merge=True), num_docs=2,
        mum_positions=np.stack([pos, mlen], axis=1),
        candidate_thresh=rng.integers(
            0, 300, 2 * doc_len0).astype(np.uint16))
    t0 = time.process_time()
    engine.thresh_arrays(res3, doc_len0)
    t_thresh = time.process_time() - t0

    assert t_mem < 2.0, f"_emit_mems {t_mem:.2f}s at 1e5 matches"
    assert t_mum < 2.0, f"mum_lines {t_mum:.2f}s at 1e5 matches"
    # 0.64s solo; the 80M-element uint16 sweep is DRAM-bandwidth-bound,
    # and concurrent xdist workers inflate CPU time (stall cycles) ~3-10x
    # — bound loose enough to pass under a 4-worker suite run while still
    # catching a regression to the per-match Python loop (~60s)
    assert t_thresh < 15.0, f"thresh_arrays {t_thresh:.2f}s at 1e5 matches"
