"""MumemtoM merge invariant: merge(partition outputs) == run on the union
(the promise at reference README.md:132)."""

import numpy as np
import pytest

from mumemto_tpu import cli, engine, formats, options, refbuilder
from mumemto_tpu.analysis import merge as merge_mod
from mumemto_tpu.analysis.mumdata import MUMdata
from tests.conftest import rand_seq


def _genomes(rng, n, base_len=400, n_mut=10):
    """Mutated copies with unique 25bp flanks per genome.

    Unique flanks keep MUMs away from the '$' terminators: the reference
    finder emits '+'-strand matches that cross the terminator into the
    revcomp half (no wrap guard for '+', mem_finder.hpp:370-377), and such
    matches get clipped during MUM extraction, degrading the merge==union
    invariant for both the reference and this implementation.
    """
    base = rand_seq(rng, base_len)
    out = []
    for _ in range(n):
        s = list(base)
        for _ in range(int(rng.integers(2, n_mut))):
            i = int(rng.integers(0, len(s)))
            s[i] = rng.choice(list("ACGT"))
        out.append(rand_seq(rng, 25) + "".join(s) + rand_seq(rng, 25))
    return out


def _write_fastas(tmp_path, genomes, names):
    paths = []
    for g, name in zip(genomes, names):
        p = tmp_path / f"{name}.fa"
        p.write_text(f">{name}\n{g}\n")
        paths.append(str(p))
    return paths


def _run_build(paths, out, extra=()):
    assert cli.main(list(paths) + ["-o", out] + list(extra)) == 0


def _sorted_mum_set(mums_path, num_docs):
    L, S, T = formats.parse_mums(mums_path, num_docs)
    order = np.lexsort((L, S[:, 0]))
    return L[order], S[order], T[order]


def test_anchor_merge_equals_union(rng, tmp_path):
    genomes = _genomes(rng, 5)
    paths = _write_fastas(tmp_path, genomes, [f"g{i}" for i in range(5)])
    p1 = str(tmp_path / "p1")
    p2 = str(tmp_path / "p2")
    union = str(tmp_path / "union")
    # partitions share the anchor (first) genome
    _run_build([paths[0], paths[1], paths[2]], p1, ["-M", "-n"])
    _run_build([paths[0], paths[3], paths[4]], p2, ["-M", "-n"])
    _run_build(paths, union)

    out = str(tmp_path / "merged.mums")
    assert cli.main(["merge", p1 + ".mums", p2 + ".mums", "-o", out]) == 0

    Lm, Sm, Tm = _sorted_mum_set(out, 5)
    Lu, Su, Tu = _sorted_mum_set(union + ".mums", 5)
    assert Lm.tolist() == Lu.tolist()
    assert Sm.tolist() == Su.tolist()
    assert Tm.tolist() == Tu.tolist()
    # merged .athresh + .lengths exist
    assert (tmp_path / "merged.athresh").exists()
    assert (tmp_path / "merged.lengths").exists()


def test_string_merge_equals_union(rng, tmp_path):
    genomes = _genomes(rng, 5)
    paths = _write_fastas(tmp_path, genomes, [f"s{i}" for i in range(5)])
    p1 = str(tmp_path / "p1")
    p2 = str(tmp_path / "p2")
    union = str(tmp_path / "union")
    # disjoint partitions
    _run_build(paths[:3], p1, ["-M"])
    _run_build(paths[3:], p2, ["-M"])
    _run_build(paths, union)

    out = str(tmp_path / "smerged.mums")
    assert cli.main(["merge", p1 + ".mums", p2 + ".mums", "-o", out]) == 0

    Lm, Sm, Tm = _sorted_mum_set(out, 5)
    Lu, Su, Tu = _sorted_mum_set(union + ".mums", 5)
    assert Lm.tolist() == Lu.tolist()
    assert Sm.tolist() == Su.tolist()
    assert Tm.tolist() == Tu.tolist()
    assert (tmp_path / "smerged.thresh").exists()
    assert (tmp_path / "smerged.thresh_rev").exists()


def test_anchor_merge_three_way(rng, tmp_path):
    genomes = _genomes(rng, 7)
    paths = _write_fastas(tmp_path, genomes, [f"t{i}" for i in range(7)])
    parts = []
    for i, grp in enumerate([[0, 1, 2], [0, 3, 4], [0, 5, 6]]):
        pfx = str(tmp_path / f"q{i}")
        _run_build([paths[j] for j in grp], pfx, ["-M", "-n"])
        parts.append(pfx + ".mums")
    union = str(tmp_path / "u7")
    _run_build(paths, union)
    out = str(tmp_path / "m7.mums")
    assert cli.main(["merge"] + parts + ["-o", out]) == 0
    Lm, Sm, Tm = _sorted_mum_set(out, 7)
    Lu, Su, Tu = _sorted_mum_set(union + ".mums", 7)
    assert Lm.tolist() == Lu.tolist()
    assert Sm.tolist() == Su.tolist()
    assert Tm.tolist() == Tu.tolist()


def test_string_merge_boundary_crossing_limitation(tmp_path):
    """Documents sharing an exact terminal k-mer produce a MUM that crosses
    the internal fwd$rc boundary (tail + '$' + mirrored rc head). STRING
    merging cannot round-trip it — extraction reads only the forward FASTA,
    exactly like the reference's extract_mums (extract_mums.cpp:92-116) —
    while ANCHOR merging recovers it. This pins the characterized behavior
    (found by merge-cycle fuzzing, seeds 707/710)."""
    import numpy as np
    from mumemto_tpu import cli, formats
    from mumemto_tpu.parallel import mumemtom

    # the exact fuzz-failing collection shape: mutated copies of one base
    # sequence with a shared un-mutated tail
    from tests.conftest import mutated_collection
    rng = np.random.default_rng(710 * 997 + 11)
    n_docs = int(rng.integers(4, 8))
    docs = mutated_collection(rng, n_docs, base_len=int(rng.integers(300, 800)))
    paths = _write_fastas(tmp_path, [d[0] for d in docs],
                          [f"b{i}" for i in range(n_docs)])
    union = str(tmp_path / "union")
    assert cli.main(paths + ["-o", union]) == 0
    Lu, Su, Tu = formats.parse_mums(union + ".mums", n_docs)
    doc_len = len(docs[0][0])
    crossing = (Su[:, 0] + Lu) > doc_len
    assert crossing.any(), "collection must exhibit a fwd$rc-crossing MUM"

    def sorted_set(L, S):
        o = np.lexsort((L, S[:, 0]))
        return list(zip(L[o].tolist(), map(tuple, S[o].tolist())))

    # anchor merge recovers EVERYTHING including the crossing MUM
    am = mumemtom.run_partitioned_files(
        paths, str(tmp_path / "am"), num_partitions=2, anchor=True)
    La, Sa, _ = formats.parse_mums(am, n_docs)
    assert sorted_set(La, Sa) == sorted_set(Lu, Su)

    # string merge recovers exactly the non-crossing subset
    sm = mumemtom.run_partitioned_files(
        paths, str(tmp_path / "sm"), num_partitions=2, anchor=False)
    Ls, Ss, _ = formats.parse_mums(sm, n_docs)
    assert sorted_set(Ls, Ss) == sorted_set(Lu[~crossing], Su[~crossing])
