"""MumemtoM orchestration: partitioned multi-MUM finding + merge, one call.

The reference's scale-out story (README.md:124-142) is operational: run
`mumemto -M [-n]` once per collection partition (one host each), then
`mumemto merge`. This module packages that whole flow:

    merged = run_partitioned(partitions, out_prefix, anchor=True)

Each partition runs the full engine (device-side scan) with merge metadata;
partition outputs are combined with the anchor or string merging scheme
(analysis/merge.py). The invariant — merge(partitions) == run-on-union —
is the tested contract (tests/test_merge.py, tests/test_mumemtom.py).

For multi-host deployments each partition call is placed on that host's
devices; partitions are embarrassingly parallel (the reference's per-host
processes) and only the merge step exchanges data, exactly like the
reference's file-based DCN-free design.
"""

from __future__ import annotations

import os

from mumemto_tpu import engine, options, refbuilder
from mumemto_tpu.analysis import merge as merge_mod


def auto_partition(files, num_partitions: int, anchor: bool = True):
    """Split a collection into partitions.

    anchor=True: the first file is the shared anchor sequence, prepended to
    every partition (anchor merging requires an identical first sequence
    per partition, merge_candidates.cpp:211-219). anchor=False: disjoint
    round-robin split (string merging).
    """
    if num_partitions < 2:
        return [list(files)]
    if anchor:
        # a partition of [anchor] alone carries no extra docs — dropping
        # it loses nothing (the anchor is in every partition)
        rest = list(files[1:])
        parts = [[files[0]] for _ in range(num_partitions)]
        for i, f in enumerate(rest):
            parts[i % num_partitions].append(f)
        return [p for p in parts if len(p) > 1]
    # string mode: every partition must hold >= 2 docs (a 1-doc partition
    # has no MUMs and previously got silently DROPPED, losing its doc from
    # the merge — found by merge-cycle fuzzing). Cap the partition count so
    # the round-robin guarantees >= 2 docs each.
    num_partitions = min(num_partitions, len(files) // 2)
    if num_partitions < 2:
        return [list(files)]
    parts = [[] for _ in range(num_partitions)]
    for i, f in enumerate(files):
        parts[i % num_partitions].append(f)
    return parts


def scan_partition(files, pfx: str, anchor: bool = True,
                   min_match_len: int = 20, use_revcomp: bool = True,
                   verbose: bool = False) -> str:
    """One partition: full engine scan with merge metadata, outputs under
    pfx. Shared by the in-process flow below and the multi-host SPMD flow
    (parallel/dcn.py). Returns the partition .mums path."""
    rb = refbuilder.build_from_files(files, use_revcomp=use_revcomp)
    rb.write_lengths_file(pfx)
    opts = options.normalize(
        rb.num_docs, min_match_len=min_match_len,
        use_revcomp=use_revcomp, merge=True, anchor_merge=anchor,
        quiet=not verbose)
    results = engine.find_matches(rb, opts)
    engine.write_outputs(results, rb, pfx)
    return pfx + ".mums"


def merge_partition_outputs(part_mums, output_prefix: str,
                            collective: bool = False) -> str:
    """Combine partition outputs into output_prefix.mums (single-partition
    degenerates to a rename of every sidecar). Shared with dcn.py."""
    merged = output_prefix + ".mums"
    if len(part_mums) == 1:
        os.replace(part_mums[0], merged)
        for ext in (".lengths", ".athresh", ".thresh", ".thresh_rev"):
            src = os.path.splitext(part_mums[0])[0] + ext
            if os.path.exists(src):
                os.replace(src, output_prefix + ext)
        return merged
    argv = list(part_mums) + ["-o", output_prefix]
    if collective:
        argv.append("--collective")
    rc = merge_mod.run(argv)
    if rc != 0:
        raise RuntimeError(f"merge failed with exit code {rc}")
    return merged


def run_partitioned(partitions, output_prefix: str, anchor: bool = True,
                    min_match_len: int = 20, use_revcomp: bool = True,
                    verbose: bool = False) -> str:
    """Run the engine per partition with merge metadata, then merge.

    partitions: list of file lists. With anchor=True every partition must
    start with the same anchor file. Returns the merged .mums path.
    """
    part_mums = [
        scan_partition(files, f"{output_prefix}_part{i}", anchor=anchor,
                       min_match_len=min_match_len,
                       use_revcomp=use_revcomp, verbose=verbose)
        for i, files in enumerate(partitions)
    ]
    return merge_partition_outputs(part_mums, output_prefix)


def run_partitioned_files(files, output_prefix: str,
                          num_partitions: int = 2, anchor: bool = True,
                          **kw) -> str:
    """Convenience: auto-partition a file list, run, and merge."""
    parts = auto_partition(files, num_partitions, anchor=anchor)
    return run_partitioned(parts, output_prefix, anchor=anchor, **kw)
