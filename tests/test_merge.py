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
