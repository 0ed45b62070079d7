"""End-to-end match-finding engine: collection text -> .mums/.mems outputs.

Device side (JAX/XLA, see ops/): one fused program (ops/pipeline.py)
building the suffix array by prefix doubling, exact LCP from the rank
history, BWT/doc arrays, and the vectorized LCP-interval analysis, followed
by device-side compaction so only O(matches) data ever reaches the host.
Host side (numpy): coordinate transforms/canonicalization, writers, and
merge threshold metadata — all in reference pop order (close row asc,
length desc).

Byte-compatible with the reference pipeline `build_main` (src/pfp_mum.cpp:31);
semantics cited per rule in ops/intervals.py and below.
"""

from __future__ import annotations

from collections.abc import Sequence as _Sequence
from dataclasses import dataclass, field

import numpy as np

from mumemto_tpu.jaxconfig import ensure_cache

ensure_cache()

import jax.numpy as jnp  # noqa: E402

from mumemto_tpu import formats  # noqa: E402
from mumemto_tpu.options import MatchOptions  # noqa: E402
from mumemto_tpu.ops import pipeline as ops_pipeline  # noqa: E402
from mumemto_tpu.ops import suffix as ops_suffix  # noqa: E402
from mumemto_tpu.ops import intervals as ops_intervals  # noqa: E402

MAX_THRESH = 65535  # mem_finder.hpp:299


def interval_size_cap(opts: MatchOptions, num_docs: int) -> int | None:
    """Static upper bound on the SA-row count of any interval that can pass
    the occurrence filters: each doc contributes <= f rows (check_doc_range,
    mem_finder.hpp:265-289) and the total is <= F when F > 0. None when both
    f and F are unlimited. Rounded up to a power of two to bound the number
    of compiled walk variants."""
    caps = []
    if opts.max_doc_freq > 0:
        caps.append(num_docs * opts.max_doc_freq)
    if opts.max_total_freq > 0:
        caps.append(int(opts.max_total_freq))
    if not caps:
        return None
    cap = min(caps)
    return 1 << max(cap.bit_length(), 2)


def pad_size(n: int, min_pad: int = 4) -> int:
    """Bucket n + min_pad up to a power-of-two-ish size (0.75 / 1.0 multiples
    of powers of two, min 4096) to bound the number of compiled shapes."""
    target = max(n + min_pad, 4096)
    p = 1 << (target - 1).bit_length()
    if p // 2 + p // 4 >= target:
        return p // 2 + p // 4
    return p


@dataclass
class MatchResults:
    """Compacted, emission-ordered match set + merge metadata."""
    opts: MatchOptions
    num_docs: int
    # MUM mode: per-match doc-major arrays
    lengths: np.ndarray = None          # (m,) int64
    offsets: np.ndarray = None          # (m, N) int64, -1 = absent
    strands: np.ndarray = None          # (m, N) int8: +1/-1/0
    # MEM mode: ragged per-match occurrence lists
    mem_lines: list = field(default_factory=list)
    mem_records: list = field(default_factory=list)  # (L, positions, docs, strands)
    # merge metadata
    candidate_thresh: np.ndarray = None  # per-first-genome-position values
    mum_positions: np.ndarray = None     # (m, 2) [offset-in-doc0, length]
    # run stats (reference n/r, pfp_mum.cpp:148-150)
    text_length: int = 0
    bwt_runs: int = 0

    @property
    def num_matches(self) -> int:
        if self.opts.mum_mode:
            return 0 if self.lengths is None else len(self.lengths)
        return len(self.mem_lines)

    def mum_lines(self) -> list:
        """Vectorized .mums line assembly (format_mum_line semantics,
        mem_finder.hpp:406-425: docs 0..N-2 always get a trailing comma,
        absent slots render empty, last doc appended only if present)."""
        m = len(self.lengths)
        if m == 0:
            return []
        N = self.offsets.shape[1]
        present = self.offsets != -1
        sep = np.array([","] * (N - 1) + [""])
        pos_p = np.char.add(
            np.where(present, np.char.mod("%d", self.offsets), ""), sep)
        strand_p = np.char.add(
            np.where(present,
                     np.where(self.strands > 0, "+", "-"), ""), sep)
        starts = np.arange(m, dtype=np.int64) * N
        pos_col = _join_ragged(pos_p.ravel(), starts)
        strand_col = _join_ragged(strand_p.ravel(), starts)
        head = np.char.add(np.char.mod("%d", self.lengths), "\t")
        full = head.astype(object) + pos_col + "\t" + strand_col + "\n"
        return "".join(full.tolist()).encode().splitlines(keepends=True)

    def output_bytes(self) -> bytes:
        if self.opts.mum_mode:
            return b"".join(self.mum_lines())
        return b"".join(self.mem_lines)


def _doc_metadata(rb, opts):
    doc_offsets = np.zeros(rb.num_docs, dtype=np.int64)
    doc_offsets[1:] = np.cumsum(np.asarray(rb.seq_lengths))[:-1]
    doc_lens = np.asarray(rb.seq_lengths, dtype=np.int64)
    if opts.use_revcomp:
        doc_lens = doc_lens // 2
    return doc_offsets, doc_lens


def find_matches(rb, opts: MatchOptions, backend: str = "pfp",
                 pfp_w: int = 10, pfp_mod: int = 100,
                 parse_prefix: str | None = None,
                 arrays_out_prefix: str | None = None,
                 show_progress: bool = True) -> MatchResults:
    """Full fused pipeline on one collection (device-side compaction).

    backend: "pfp" (default, mirrors the reference's PFP path) or "direct"
    (full-text prefix doubling, the reference's -g gsacak path).
    parse_prefix: resume from PREFIX.dict/.parse instead of rb.text
    (-p/--from-parse, pfp_mum.cpp:122-123).
    arrays_out_prefix: also write .sa/.lcp/.bwt checkpoint files from the
    SAME scan (-A; the reference streams them out of the PFP pass for
    free, pfp_lcp_mum.hpp:323-378 — no separate index construction).
    """
    from mumemto_tpu import progress
    # tty/env-gated phase bar (printProgress analog); library callers
    # disable it via show_progress=False (pfp_lcp_mum.hpp:46-52).
    # try/finally: a raising scan must not leak the module-global bar
    bar = progress.activate() if show_progress else None
    try:
        return _find_matches_inner(
            rb, opts, backend, pfp_w, pfp_mod, parse_prefix,
            arrays_out_prefix)
    finally:
        if bar is not None:
            progress.deactivate()


def _find_matches_inner(rb, opts, backend, pfp_w, pfp_mod, parse_prefix,
                        arrays_out_prefix):
    size_cap = interval_size_cap(opts, rb.num_docs)
    from mumemto_tpu.ops.pfp import _phase_logger
    phase = _phase_logger()
    if parse_prefix:
        from mumemto_tpu.ops import pfp as ops_pfp
        pfp = ops_pfp.pfp_from_parse_files(parse_prefix, w=pfp_w)
        res, counts, n = ops_pfp.pfp_scan(
            pfp, rb.doc_ends, rb.num_docs,
            jnp.int32(opts.min_match_len), jnp.int32(opts.num_distinct),
            jnp.int32(opts.max_total_freq), opts.max_doc_freq,
            size_cap=size_cap, need_ctx=opts.merge)
    elif backend == "pfp":
        from mumemto_tpu.ops import pfp as ops_pfp
        res, counts, n = ops_pfp.scan_collection_pfp(
            rb.text, rb.doc_ends, rb.num_docs,
            jnp.int32(opts.min_match_len), jnp.int32(opts.num_distinct),
            jnp.int32(opts.max_total_freq), opts.max_doc_freq,
            w=pfp_w, mod=pfp_mod, size_cap=size_cap, need_ctx=opts.merge)
    else:
        from mumemto_tpu.ops import pfp as ops_pfp
        n_real = int(rb.text.size)
        n = pad_size(n_real)
        text = np.zeros(n, dtype=np.uint8)
        text[:n_real] = rb.text
        # same alphabet-coded seed / packed-LCP-bottom levers as the PFP
        # dict stage (pad byte 0 is part of the device text's alphabet)
        seed_thr, lcp_thr = ops_pfp.seed_thresholds(
            set(ops_pfp._alphabet(rb.text)) | {0})
        res, counts = ops_pipeline.scan_collection(
            jnp.asarray(text), jnp.asarray(rb.doc_ends, dtype=jnp.int32),
            n, rb.num_docs,
            jnp.int32(opts.min_match_len), jnp.int32(opts.num_distinct),
            jnp.int32(opts.max_total_freq), opts.max_doc_freq,
            size_cap=size_cap, need_ctx=opts.merge,
            alpha_thresholds=seed_thr, lcp_thresholds=lcp_thr)
    phase("scan_dispatch")
    n_emit, n_cand, n_runs = (int(x) for x in np.asarray(counts))
    phase("counts_sync")
    if arrays_out_prefix:
        _write_arrays_from_res(res, arrays_out_prefix, rb.num_docs)
        phase("arrays_out")

    results = MatchResults(opts=opts, num_docs=rb.num_docs)
    results.bwt_runs = n_runs
    results.text_length = int(rb.text.size) if rb.text is not None else (
        sum(rb.seq_lengths))
    doc_offsets, doc_lens = _doc_metadata(rb, opts)

    if opts.mum_mode:
        W = rb.num_docs  # distinct docs => window size <= N
        M = ops_pipeline.bucket(n_emit)
        s, e, L, w_sa, w_da = ops_pipeline.fetch_packed(
            *ops_pipeline.compact_windows_mum(res, n, M, W, rb.num_docs))
        phase("compact_readback")
        m = n_emit
        valid = (s[:m, None] + np.arange(W)) < e[:m, None]
        _emit_mums(results, s[:m], e[:m], L[:m], w_sa[:m],
                   w_da[:m].astype(np.int32), valid, opts,
                   doc_offsets, doc_lens, rb.num_docs)
        phase("emit_mums")
    else:
        M = ops_pipeline.bucket(n_emit)
        _, s0, e0, _, _real0 = ops_pipeline.compact_fields(res, n, M)
        s0, e0 = ops_pipeline.fetch_packed(s0, e0)
        maxw = int((e0[:n_emit] - s0[:n_emit]).max()) if n_emit else 1
        W = ops_pipeline.bucket(maxw, lo=8)
        s, e, L, w_sa, w_da, w_prev = ops_pipeline.fetch_packed(
            *ops_pipeline.compact_windows_mem(res, n, M, W, rb.num_docs))
        m = n_emit
        valid = (s[:m, None] + np.arange(W)) < e[:m, None]
        w_da = w_da.astype(np.int32)
        keep = np.ones(m, dtype=bool)
        if opts.max_doc_freq != 1 and m:
            # deferred distinct-count (check_doc_range unique >= k,
            # mem_finder.hpp:265-289)
            unique = (valid & (w_prev[:m] < s[:m, None])).sum(axis=1)
            keep = unique >= opts.num_distinct
        _emit_mems(results, s[:m][keep], e[:m][keep], L[:m][keep],
                   w_sa[:m][keep], w_da[:m][keep], valid[keep],
                   opts, doc_offsets, doc_lens)

    if opts.merge:
        Wc = rb.num_docs
        Mc = ops_pipeline.bucket(n_cand)
        has0, sa_first0, prev_ctx, next_ctx = ops_pipeline.fetch_packed(
            *ops_pipeline.compact_cand_thresh(res, n, Mc, Wc))
        _merge_thresholds(results, has0[:n_cand], sa_first0[:n_cand],
                          prev_ctx[:n_cand], next_ctx[:n_cand],
                          doc_offsets, doc_lens)
    return results


def _write_arrays_from_res(res, prefix: str, num_docs: int) -> None:
    """-A checkpoint files straight from the scan's row arrays (real doc
    rows only; pads and the trailing-terminator row carry doc id ==
    num_docs). One O(n) readback — the reference's stream-to-disk analog
    (pfp_lcp_mum.hpp:323-378)."""
    from mumemto_tpu import formats

    da = np.asarray(res["da"])
    real = da < num_docs
    formats.write_5byte(prefix + ".sa",
                        np.asarray(res["sa"])[real].astype(np.uint64))
    formats.write_5byte(prefix + ".lcp",
                        np.asarray(res["lcp"])[real].astype(np.uint64))
    formats.write_rl_bwt(prefix + ".bwt", np.asarray(res["bwt"])[real])


def compute_arrays(rb, padded_n: int | None = None):
    """Host-array index construction (debug/test path). Returns numpy
    (sa, lcp, bwt, da) over the zero-padded text."""
    n_real = int(rb.text.size)
    n = padded_n or pad_size(n_real)
    text = np.zeros(n, dtype=np.uint8)
    text[:n_real] = rb.text
    sa, lcp, bwt = ops_suffix.suffix_lcp_arrays(text)
    da = ops_suffix.doc_array(sa, jnp.asarray(rb.doc_ends, dtype=jnp.int32),
                              rb.num_docs)
    return (np.asarray(sa), np.asarray(lcp), np.asarray(bwt), np.asarray(da))


def find_matches_from_arrays(sa, lcp, bwt, da, rb, opts: MatchOptions) -> MatchResults:
    """Host-array path (debug/test): same semantics as find_matches."""
    n = int(sa.size)
    res = ops_intervals.analyze_intervals(
        jnp.asarray(lcp, jnp.int32), jnp.asarray(da, jnp.int32),
        jnp.asarray(bwt), n,
        jnp.int32(opts.min_match_len), jnp.int32(opts.num_distinct),
        jnp.int32(opts.max_total_freq), opts.max_doc_freq,
        size_cap=interval_size_cap(opts, rb.num_docs),
        need_ctx=opts.merge)
    cand = np.array(res["cand"])
    emit = np.array(res["emit"])
    s_all = np.asarray(res["s"])
    e_all = np.asarray(res["e"])
    prev_ctx = np.asarray(res["prev_ctx"])
    next_ctx = np.asarray(res["next_ctx"])
    prev_same = np.asarray(res["prev_same"])
    lcp = np.asarray(lcp)
    sa = np.asarray(sa)
    da = np.asarray(da)

    def ordered(idx):
        return idx[np.lexsort((-lcp[idx], e_all[idx]))]

    emit_idx = ordered(np.flatnonzero(emit))
    results = MatchResults(opts=opts, num_docs=rb.num_docs)
    doc_offsets, doc_lens = _doc_metadata(rb, opts)

    s = s_all[emit_idx]
    e = e_all[emit_idx]
    L = lcp[emit_idx]
    if opts.mum_mode:
        W = rb.num_docs
    else:
        W = int((e - s).max()) if emit_idx.size else 1
    cols = s[:, None] + np.arange(W)
    valid = cols < e[:, None]
    colc = np.minimum(cols, n - 1)
    w_sa = sa[colc]
    w_da = da[colc]
    if opts.max_doc_freq != 1 and emit_idx.size:
        w_prev = prev_same[colc]
        unique = (valid & (w_prev < s[:, None])).sum(axis=1)
        keep = unique >= opts.num_distinct
        s, e, L = s[keep], e[keep], L[keep]
        w_sa, w_da, valid = w_sa[keep], w_da[keep], valid[keep]

    if opts.mum_mode:
        _emit_mums(results, s, e, L, w_sa, w_da, valid, opts,
                   doc_offsets, doc_lens, rb.num_docs)
    else:
        _emit_mems(results, s, e, L, w_sa, w_da, valid, opts,
                   doc_offsets, doc_lens)

    if opts.merge:
        cand_idx = ordered(np.flatnonzero(cand))
        sc = s_all[cand_idx]
        ec = e_all[cand_idx]
        colsc = np.minimum(sc[:, None] + np.arange(rb.num_docs), n - 1)
        validc = colsc < ec[:, None]
        is0 = validc & (da[colsc] == 0)
        has0 = is0.any(axis=1)
        first0 = np.argmax(is0, axis=1)
        sa_first0 = sa[np.minimum(sc + first0, n - 1)]
        _merge_thresholds(results, has0, sa_first0, prev_ctx[cand_idx],
                          next_ctx[cand_idx], doc_offsets, doc_lens)
    return results


def _emit_mums(results, s, e, L, w_sa, w_da, valid, opts,
               doc_offsets, doc_lens, num_docs):
    """write_mum semantics (mem_finder.hpp:357-428), vectorized over the
    compacted (m, W) windows (W = num_docs; all docs distinct in MUM mode)."""
    m = len(s)
    N = num_docs
    L = L.astype(np.int64)
    if m == 0:
        results.lengths = np.zeros(0, dtype=np.int64)
        results.offsets = np.zeros((0, N), dtype=np.int64)
        results.strands = np.zeros((0, N), dtype=np.int8)
        results.mum_positions = np.zeros((0, 2), dtype=np.int64)
        return
    docs = np.minimum(w_da, N - 1)
    pos = w_sa.astype(np.int64) - doc_offsets[docs]
    dl = doc_lens[docs]
    neg = (valid & (pos >= dl)) if opts.use_revcomp else np.zeros_like(valid)
    # '-'-strand matches crossing the doc's final terminator are dropped
    # whole (mem_finder.hpp:372-373)
    wrap_bad = (neg & (pos + L[:, None] >= 2 * dl)).any(axis=1)
    tpos = np.where(neg, 2 * dl - pos - L[:, None] - 1, pos)

    OFF = np.full((m, N), -1, dtype=np.int64)
    STR = np.zeros((m, N), dtype=np.int8)
    rows = np.broadcast_to(np.arange(m)[:, None], valid.shape)
    OFF[rows[valid], docs[valid]] = tpos[valid]
    STR[rows[valid], docs[valid]] = np.where(neg[valid], -1, 1)

    # canonicalization: first present genome among docs 0..N-2 (or N-1 if
    # none present) must be '+' (mem_finder.hpp:383-391)
    head = STR[:, : N - 1] if N > 1 else STR
    anyset = (head != 0).any(axis=1)
    first = np.where(anyset, np.argmax(head != 0, axis=1), N - 1)
    first_strand = STR[np.arange(m), first]
    keep = ~wrap_bad & (first_strand != -1)

    results.lengths = L[keep]
    results.offsets = OFF[keep]
    results.strands = STR[keep]
    results.mum_positions = np.stack(
        [OFF[keep][:, 0], L[keep]], axis=1) if opts.merge else None


class _MemRecords(_Sequence):
    """Lazy list-like view of (L, positions, docs, strands) per match over
    flat occurrence arrays — avoids 10^5-10^6 per-match tuple/slice
    construction at emit time (the merge-mode chr-scale workload); each
    record materializes on access with identical values to the old eager
    tuples."""

    def __init__(self, L, tposf, docf, negf, offs):
        self._L = L
        self._tposf = tposf
        self._docf = docf
        self._negf = negf
        self._offs = offs

    def __len__(self):
        return len(self._L)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return [self[j] for j in range(*i.indices(len(self)))]
        o, o2 = self._offs[i], self._offs[i + 1]
        return (int(self._L[i]), self._tposf[o:o2],
                self._docf[o:o2].astype(np.int64), ~self._negf[o:o2])


def _join_ragged(pieces, starts):
    """Per-row string concatenation of a flat unicode piece array grouped
    by `starts` (reduceat over object strings; groups are small — one
    occurrence list each)."""
    return np.add.reduceat(pieces.astype(object), starts)


def _emit_mems(results, s, e, L, w_sa, w_da, valid, opts,
               doc_offsets, doc_lens):
    """write_mem semantics (mem_finder.hpp:210-263), incl. the last-element
    '-' transform quirk (no -1 at :248). Fully vectorized — coordinate
    transforms AND line assembly are numpy array programs (the reference's
    writer is a stream loop, but our contract is batch: 10^5-10^6 matches
    must emit in seconds of host time, not minutes)."""
    m = len(s)
    if m == 0:
        results.mem_lines = []
        results.mem_records = []
        return
    num_docs = len(doc_lens)
    W = valid.shape[1]
    nv = valid.sum(axis=1).astype(np.int64)
    docs = np.minimum(w_da, num_docs - 1)
    pos = w_sa.astype(np.int64) - doc_offsets[docs]
    dl = doc_lens[docs]
    if opts.use_revcomp:
        neg = valid & (pos >= dl)
    else:
        neg = np.zeros_like(valid)
    is_last = np.arange(W)[None, :] == (nv[:, None] - 1)
    # '-' transform: 2*len - pos - L - 1, except the LAST occurrence of a
    # match drops the -1 (mem_finder.hpp:248)
    tpos = np.where(neg, 2 * dl - pos - L[:, None].astype(np.int64)
                    - 1 + is_last, pos)

    # flat occurrence arrays, row-major (valid is a prefix mask per row;
    # every emitted interval has >= 2 rows, required by the ragged joins)
    assert nv.min() > 0, "empty emission window"
    tposf = tpos[valid]
    docf = w_da[valid].astype(np.int32)
    negf = neg[valid]
    offs = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(nv, out=offs[1:])
    starts = offs[:-1]
    # trailing comma after every occurrence except the row's last
    rowid = np.repeat(np.arange(m), nv)
    jj = np.arange(offs[-1]) - starts[rowid]
    sep = np.where(jj == nv[rowid] - 1, "", ",")
    pos_col = _join_ragged(np.char.add(
        np.char.mod("%d", tposf), sep), starts)
    doc_col = _join_ragged(np.char.add(
        np.char.mod("%d", docf), sep), starts)
    strand_col = _join_ragged(np.char.add(
        np.where(negf, "-", "+"), sep), starts)
    head = np.char.add(np.char.mod("%d", L.astype(np.int64)), "\t")
    full = (head.astype(object) + pos_col + "\t" + doc_col + "\t"
            + strand_col + "\n")
    results.mem_lines = "".join(full.tolist()).encode().splitlines(
        keepends=True)
    results.mem_records = _MemRecords(L.astype(np.int64), tposf, docf,
                                      negf, offs)


def _merge_thresholds(results, has0, sa_first0, prev_ctx, next_ctx,
                      doc_offsets, doc_lens):
    """candidate_thresh updates (mem_finder.hpp:326-336): for every candidate
    interval (in pop order), next_best = min(max(LCP[s], LCP[e]), 65535) is
    written at the first-genome offset of the interval's doc-0 row. Later
    writes at the same position win (plain assignment in stream order)."""
    dl0 = int(doc_lens[0])
    # uint16 is exact: values are clamped to MAX_THRESH = 65535 below, and
    # the on-disk format is uint16 (write_thresh) — storing 2-byte entries
    # keeps thresh_arrays' chr-scale gathers at 1/4 the memory traffic
    thresh = np.zeros(dl0 * 2, dtype=np.uint16)
    rowpos = sa_first0[has0].astype(np.int64) - doc_offsets[0]
    nb = np.minimum(np.maximum(prev_ctx[has0], next_ctx[has0]), MAX_THRESH)
    if rowpos.size:
        # keep-last-write semantics under duplicate positions
        rev = np.arange(rowpos.size - 1, -1, -1)
        uniq_pos, first_in_rev = np.unique(rowpos[rev], return_index=True)
        thresh[uniq_pos] = nb[rev][first_in_rev]
    results.candidate_thresh = thresh


def thresh_arrays(results: MatchResults, doc_len0: int):
    """Close-time .thresh/.thresh_rev generation (mem_finder.hpp:116-157),
    as one flat ragged-expansion array program (each MUM contributes
    `length` threshold slots + one zero separator slot)."""
    mp = results.mum_positions
    order = np.argsort(mp[:, 0], kind="stable")
    mp = mp[order]
    pos_a = mp[:, 0]
    len_a = mp[:, 1]
    total = int((len_a + 1).sum())
    fwd = np.zeros(total, dtype=np.uint16)
    rev = np.zeros(total, dtype=np.uint16)
    ct = results.candidate_thresh
    nflat = int(len_a.sum())
    if nflat == 0:
        return fwd, rev
    # One arange + four repeats, all expressed as "per-row base + flat
    # position": with starts = cumsum(len)-len, any per-row-affine flat
    # quantity q_row + jj becomes repeat(q_row - starts, len) + arange —
    # no rowid gathers. Narrow index dtype halves the memory traffic
    # (this host's core is bandwidth-bound on these passes).
    idx_dt = np.int64 if (nflat >= 2**31 or 2 * doc_len0 >= 2**31
                          or total >= 2**31) else np.int32
    starts = (np.cumsum(len_a) - len_a).astype(idx_dt)
    len_i = len_a.astype(idx_dt)
    pos_i = pos_a.astype(idx_dt)
    ar = np.arange(nflat, dtype=idx_dt)
    revpos = idx_dt(2 * doc_len0) - pos_i - len_i - 1
    out_starts = np.cumsum(len_i + 1) - (len_i + 1)
    # thresholds are < 2^16 (MAX_THRESH clamp) — gather 2-byte values
    ct16 = ct if ct.dtype == np.uint16 else ct.astype(np.uint16)
    fv = ct16[np.repeat(pos_i - starts, len_a) + ar]
    rv = ct16[np.repeat(revpos - starts, len_a) + ar]
    rem = np.repeat(len_i + starts, len_a) - ar
    out = np.repeat((out_starts - starts).astype(idx_dt), len_a) + ar
    sel = fv < rem
    fwd[out[sel]] = fv[sel]
    sel = rv < rem
    rev[out[sel]] = rv[sel]
    return fwd, rev


def write_outputs(results: MatchResults, rb, prefix: str) -> None:
    """Write .mums/.mems (+ .bumbl, merge metadata) like mem_finder's
    constructor/close (mem_finder.hpp:91-158)."""
    opts = results.opts
    if not opts.mum_mode:
        with open(prefix + ".mems", "wb") as f:
            f.write(results.output_bytes())
    elif opts.binary:
        formats.write_bumbl(prefix + ".bumbl",
                            results.lengths.astype(np.uint32),
                            results.offsets,
                            results.strands > 0,
                            partial=opts.num_distinct < results.num_docs)
    else:
        with open(prefix + ".mums", "wb") as f:
            f.write(results.output_bytes())

    if opts.anchor_merge:
        dl0 = int(rb.seq_lengths[0] // (2 if opts.use_revcomp else 1))
        formats.write_thresh(prefix + ".athresh",
                             results.candidate_thresh[:dl0])
    elif opts.merge:
        dl0 = int(rb.seq_lengths[0] // (2 if opts.use_revcomp else 1))
        fwd, rev = thresh_arrays(results, dl0)
        formats.write_thresh(prefix + ".thresh", fwd)
        formats.write_thresh(prefix + ".thresh_rev", rev)
