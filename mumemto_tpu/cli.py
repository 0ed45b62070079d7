"""mumemto-compatible CLI: build command + subcommand dispatch.

Mirrors the reference command surface:
  * build flags: src/pfp_mum.cpp:255-313 (getopt string "hi:F:o:w:sl:ra:AKk:p:m:f:bgMnP")
  * subcommand router: mumemto/mumemto:180-230 (viz, inversion, coverage,
    collinear, convert, view, extract, label, lengths, merge, bed)
  * easter egg: `mumemto mori` prints a skull (pfp_mum.cpp:373-378)
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

VERSION = "1.4.0"

SKULL = r"""
                            ,--.
                           {    }
                           K,   }
                          /  ~Y`
                     ,   /   /
                    {_'-K.__/
                      `/-.__L._
                      /  ' /`\_}
                     /  ' /
             ____   /  ' /
      ,-'~~~~    ~~/  ' /_
    ,'             ``~~~  ',
   (                        Y
  {                         I
 {      -                    `,
 |       ',                   )
 |        |   ,..__      __. Y
 |    .,_./  Y ' / ^Y   J   )|
 \           |' /   |   |   ||
  \          L_/    . _ (_,.'(
   \,   ,      ^^""' / |      )
     \_  \          /,L]     /
       '-_~-,       ` `   ./`
          `'{_            )
              ^^\..___,.--`
"""

SUBCOMMANDS = ("viz", "inversion", "coverage", "collinear", "convert", "view",
               "extract", "label", "lengths", "merge", "bed", "trim",
               "density", "tabix", "convert-thresh", "mori")


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="mumemto",
        description="mumemto - find maximal [unique | exact] matches using PFP.")
    ap.add_argument("files", nargs="*", help="input FASTA files")
    ap.add_argument("-i", "--input", dest="input_list", default="",
                    help="path to a file-list of genomes (overrides positional args)")
    ap.add_argument("-o", "--output", dest="output_prefix", default="output",
                    help="output prefix path")
    ap.add_argument("-r", "--no-revcomp", dest="use_rcomp", action="store_false",
                    help="do not include the reverse complement")
    ap.add_argument("-b", "--binary", action="store_true",
                    help="output binary format (multi-MUMs only)")
    ap.add_argument("-A", "--arrays-out", action="store_true",
                    help="write LCP, BWT, and SA to file")
    ap.add_argument("-a", "--arrays-in", default="",
                    help="compute matches from precomputed arrays (PREFIX.bwt/sa/lcp)")
    ap.add_argument("-M", "--merge", action="store_true",
                    help="output extra metadata to enable merging multi-MUMs")
    ap.add_argument("-n", "--anchor", dest="anchor_merge", action="store_true",
                    help="use anchor-based merging (requires -M)")
    ap.add_argument("-l", "--min-match-len", type=int, default=20)
    ap.add_argument("-k", "--minimum-genomes", dest="num_distinct_docs",
                    type=int, default=0)
    ap.add_argument("-f", "--per-seq-freq", dest="rare_freq", type=int, default=1)
    ap.add_argument("-F", "--max-total-freq", dest="max_mem_freq", type=int,
                    default=0)
    ap.add_argument("-w", "--window", dest="pfp_w", type=int, default=10)
    ap.add_argument("-m", "--modulus", dest="hash_mod", type=int, default=100)
    ap.add_argument("-p", "--from-parse", dest="parse_prefix", default="")
    ap.add_argument("-K", "--keep-temp-files", action="store_true",
                    help="accepted for reference-CLI compatibility; the "
                         "PFP here is in-memory, so no temp .dict/.parse "
                         "ever exist (use -P to write them explicitly)")
    ap.add_argument("-g", "--use-gsacak", action="store_true",
                    help="use the direct suffix-array backend (no PFP)")
    ap.add_argument("-P", "--only-parse", action="store_true")
    ap.add_argument("--seq-shards", type=int, default=0, metavar="N",
                    help="shard ONE collection's scan over N devices on the "
                         "'seq' mesh axis (multi-chip long-context mode; "
                         "power of two, requires N attached devices)")
    ap.add_argument("-s", "--no-overlap", dest="overlap", action="store_false",
                    help=argparse.SUPPRESS)  # parsed but unused (legacy)
    ap.add_argument("--version", action="version", version=VERSION)
    return ap


def read_filelist(path: str) -> list:
    files = []
    with open(path) as f:
        for line in f:
            words = line.split()
            if words:
                files.append(words[0])
    return files


def _seq_mesh(nshards: int):
    """1D ('seq',) mesh over the first nshards devices, or None + error."""
    import jax
    if nshards <= 0 or nshards & (nshards - 1):
        print(f"Error: --seq-shards must be a positive power of two, "
              f"got {nshards}", file=sys.stderr)
        return None
    devs = jax.devices()
    if len(devs) < nshards:
        print(f"Error: --seq-shards {nshards} needs that many devices, "
              f"have {len(devs)}", file=sys.stderr)
        return None
    return jax.sharding.Mesh(np.asarray(devs[:nshards]), ("seq",))


def _is_device_oom(e: Exception) -> bool:
    msg = str(e)
    return "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg


def _oom_partition_fallback(args, opts, files, err):
    """Device OOM during the union scan: automatically fall back to the
    MumemtoM partition-merge scheme (per-partition runs + threshold merge,
    README.md:124-142) when the run is eligible — strict multi-MUM mode
    over >= 3 input files. merge(partitions) == run-on-union is the tested
    invariant, so the fallback is output-identical. Returns an exit code,
    or None when not eligible (caller re-raises)."""
    eligible = (opts.mum_mode and opts.num_distinct == len(files)
                and not opts.merge and not opts.binary
                and files and len(files) >= 3)
    if not eligible:
        return None
    from mumemto_tpu.parallel import mumemtom
    nparts = 2
    while nparts <= max(2, len(files) - 1):
        print(f"[build_main] device OOM on the union scan — retrying as "
              f"{nparts} MumemtoM partitions + anchor merge", file=sys.stderr)
        try:
            mumemtom.run_partitioned_files(
                files, args.output_prefix, num_partitions=nparts,
                anchor=True, min_match_len=args.min_match_len,
                use_revcomp=args.use_rcomp)
            print("[build_main] partitioned fallback succeeded",
                  file=sys.stderr)
            return 0
        except Exception as e2:
            if not _is_device_oom(e2):
                raise
            nparts *= 2
    print("Error: the device ran out of memory even at maximum "
          "partitioning.", file=sys.stderr)
    return 137


def build_main(argv) -> int:
    from mumemto_tpu import engine, options, refbuilder

    args = build_argparser().parse_args(argv)
    if args.input_list:
        if args.files:
            print("[build_main] Using filelist, ignoring positional args",
                  file=sys.stderr)
        files = read_filelist(args.input_list)
    else:
        files = args.files

    if not files and not args.arrays_in and not args.parse_prefix:
        print("Error: Need to provide a file-list or files as positional args "
              "for processing.", file=sys.stderr)
        return 1

    if args.seq_shards and (args.arrays_out or args.arrays_in
                            or args.only_parse or args.use_gsacak):
        # refuse rather than silently dropping either flag: the sharded
        # scan has no array-checkpoint stream-out and the replay/direct
        # paths are single-device programs (-p resume IS supported)
        print("Error: --seq-shards is not supported together with "
              "-A/-a/-P/-g; run those single-device (or per-partition "
              "via MumemtoM).", file=sys.stderr)
        return 1

    if args.arrays_in:
        rb = refbuilder.build_from_lengths(args.arrays_in,
                                           use_revcomp=args.use_rcomp)
        opts = options.normalize(
            rb.num_docs, min_match_len=args.min_match_len,
            num_distinct_docs=args.num_distinct_docs, rare_freq=args.rare_freq,
            max_mem_freq=args.max_mem_freq, use_revcomp=args.use_rcomp,
            merge=args.merge, anchor_merge=args.anchor_merge, binary=args.binary)
        from mumemto_tpu import formats
        sa = formats.read_5byte(args.arrays_in + ".sa").astype(np.int64)
        lcp = formats.read_5byte(args.arrays_in + ".lcp").astype(np.int64)
        bwt = formats.read_rl_bwt(args.arrays_in + ".bwt")
        da = rb.doc_array(sa)
        results = engine.find_matches_from_arrays(sa, lcp, bwt, da, rb, opts)
        engine.write_outputs(results, rb, args.output_prefix)
        print(f"[build_main] {results.num_matches} matches found", file=sys.stderr)
        return 0

    if args.parse_prefix:
        # -p/--from-parse: resume from PREFIX.dict/.parse (+ .lengths);
        # pfp_mum.cpp:122-123, ref_builder.cpp:140-169
        rb = refbuilder.build_from_lengths(args.parse_prefix,
                                           use_revcomp=args.use_rcomp)
        opts = options.normalize(
            rb.num_docs, min_match_len=args.min_match_len,
            num_distinct_docs=args.num_distinct_docs, rare_freq=args.rare_freq,
            max_mem_freq=args.max_mem_freq, use_revcomp=args.use_rcomp,
            merge=args.merge, anchor_merge=args.anchor_merge, binary=args.binary)
        if args.seq_shards:
            mesh = _seq_mesh(args.seq_shards)
            if mesh is None:
                return 1
            from mumemto_tpu.parallel import seqpfp
            results = seqpfp.find_matches_seq_sharded(
                rb, opts, mesh, pfp_w=args.pfp_w,
                parse_prefix=args.parse_prefix)
        else:
            results = engine.find_matches(rb, opts, pfp_w=args.pfp_w,
                                          parse_prefix=args.parse_prefix)
        engine.write_outputs(results, rb, args.output_prefix)
        print(f"[build_main] {results.num_matches} matches found",
              file=sys.stderr)
        return 0

    import time
    t_start = time.time()
    rb = refbuilder.build_from_files(files, use_revcomp=args.use_rcomp)
    rb.write_lengths_file(args.output_prefix)
    print(f"[build_main] reference built ({time.time() - t_start:.2f}s, "
          f"{rb.text.size / 1e6:.1f}M chars, {rb.num_docs} docs)",
          file=sys.stderr)
    opts = options.normalize(
        rb.num_docs, min_match_len=args.min_match_len,
        num_distinct_docs=args.num_distinct_docs, rare_freq=args.rare_freq,
        max_mem_freq=args.max_mem_freq, use_revcomp=args.use_rcomp,
        merge=args.merge, anchor_merge=args.anchor_merge, binary=args.binary)

    if args.only_parse:
        from mumemto_tpu.ops import pfp as ops_pfp
        ops_pfp.write_parse_files(rb, args.output_prefix, w=args.pfp_w,
                                  mod=args.hash_mod)
        return 0

    t0 = time.time()
    try:
        if args.seq_shards:
            # multi-chip long-context mode: the expansion row space of
            # this ONE collection sharded over the seq mesh axis
            from mumemto_tpu.parallel import seqpfp
            mesh = _seq_mesh(args.seq_shards)
            if mesh is None:
                return 1
            results = seqpfp.find_matches_seq_sharded(
                rb, opts, mesh, pfp_w=args.pfp_w, pfp_mod=args.hash_mod)
        else:
            # -A rides the same scan: the index rows are checkpointed out
            # of the run that also emits the matches (no separate index
            # construction — the reference's stream-out,
            # pfp_lcp_mum.hpp:323-378)
            results = engine.find_matches(
                rb, opts,
                backend="direct" if args.use_gsacak else "pfp",
                pfp_w=args.pfp_w, pfp_mod=args.hash_mod,
                arrays_out_prefix=(args.output_prefix if args.arrays_out
                                   else None))
    except Exception as e:
        if not _is_device_oom(e):
            raise
        rc = _oom_partition_fallback(args, opts, files, e)
        if rc is not None:
            return rc
        raise
    print(f"[build_main] match scan finished ({time.time() - t0:.2f}s)",
          file=sys.stderr)
    engine.write_outputs(results, rb, args.output_prefix)
    print(f"[build_main] {results.num_matches} matches found "
          f"(total {time.time() - t_start:.2f}s)", file=sys.stderr)
    if results.bwt_runs:
        # repetitiveness stat n/r (pfp_mum.cpp:148-150)
        n, r = results.text_length, results.bwt_runs
        print(f"[build_main] n = {n}, r = {r}, n/r = {n / r:.3f}",
              file=sys.stderr)
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "mori":
        print(SKULL)
        return 0
    if argv and argv[0] == "--version":
        print(VERSION)
        return 0
    if argv and argv[0] in SUBCOMMANDS:
        sub, rest = argv[0], argv[1:]
        from mumemto_tpu.analysis import dispatch
        return dispatch.run(sub, rest)
    from mumemto_tpu import options
    try:
        return build_main(argv)
    except (options.InputError, FileNotFoundError) as e:
        # ONLY user-input validation failures print cleanly like the
        # reference's die() (ref_builder.cpp:249-252, pfp_mum.cpp:69-72);
        # internal ValueErrors keep their tracebacks
        print(f"Error: {e}", file=sys.stderr)
        return 1
    except MemoryError:
        # out-of-memory heuristic of the reference wrapper
        # (mumemto/mumemto:19-21: SIGKILL -> OOM message)
        print("Error: mumemto ran out of memory. Try a smaller collection, "
              "partitioned runs (mumemto -M per partition + mumemto merge), "
              "or a machine/device with more memory.", file=sys.stderr)
        return 137
    except Exception as e:  # device OOM surfaces as XlaRuntimeError
        if _is_device_oom(e):
            print("Error: the device ran out of memory during the scan. "
                  "Partition the collection (mumemto -M per partition + "
                  "mumemto merge) or use more chips.", file=sys.stderr)
            return 137
        raise


if __name__ == "__main__":
    sys.exit(main())
