"""One-call MumemtoM orchestration: partitioned run + merge == union run."""

import numpy as np

from mumemto_tpu import cli, formats
from mumemto_tpu.parallel import mumemtom
from tests.test_merge import _genomes, _write_fastas


def _sorted_set(path, num_docs):
    L, S, T = formats.parse_mums(path, num_docs)
    order = np.lexsort((L, S[:, 0]))
    return L[order].tolist(), S[order].tolist(), T[order].tolist()


def test_auto_partition_shapes():
    files = [f"f{i}" for i in range(7)]
    parts = mumemtom.auto_partition(files, 3, anchor=True)
    assert all(p[0] == "f0" for p in parts)
    assert sorted(sum((p[1:] for p in parts), [])) == files[1:]
    parts = mumemtom.auto_partition(files, 3, anchor=False)
    assert sorted(sum(parts, [])) == files
    assert all(len(p) >= 2 for p in parts)


def test_run_partitioned_anchor_equals_union(rng, tmp_path):
    genomes = _genomes(rng, 6)
    paths = _write_fastas(tmp_path, genomes, [f"g{i}" for i in range(6)])
    union = str(tmp_path / "union")
    assert cli.main(paths + ["-o", union]) == 0

    merged = mumemtom.run_partitioned_files(
        paths, str(tmp_path / "merged"), num_partitions=2, anchor=True)
    assert _sorted_set(merged, 6) == _sorted_set(union + ".mums", 6)


def test_run_partitioned_string_equals_union(rng, tmp_path):
    genomes = _genomes(rng, 6)
    paths = _write_fastas(tmp_path, genomes, [f"s{i}" for i in range(6)])
    union = str(tmp_path / "union")
    assert cli.main(paths + ["-o", union]) == 0

    merged = mumemtom.run_partitioned_files(
        paths, str(tmp_path / "smerged"), num_partitions=2, anchor=False)
    assert _sorted_set(merged, 6) == _sorted_set(union + ".mums", 6)


def test_oom_auto_partition_fallback(rng, tmp_path, monkeypatch):
    """Device OOM on the union scan auto-falls back to MumemtoM partitions
    and produces the union-equivalent MUM set (cli._oom_partition_fallback)."""
    from mumemto_tpu import engine

    genomes = _genomes(rng, 5)
    paths = _write_fastas(tmp_path, genomes, [f"o{i}" for i in range(5)])
    union = str(tmp_path / "union")
    assert cli.main(paths + ["-o", union]) == 0

    real = engine.find_matches

    def oom_on_union(rb, opts, **kw):
        if rb.num_docs == 5:
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: Out of memory allocating 123 bytes")
        return real(rb, opts, **kw)

    monkeypatch.setattr(engine, "find_matches", oom_on_union)
    out = str(tmp_path / "oomrun")
    assert cli.main(paths + ["-o", out]) == 0
    assert _sorted_set(out + ".mums", 5) == _sorted_set(union + ".mums", 5)


def test_oom_ineligible_reraises(rng, tmp_path, monkeypatch):
    """MEM mode cannot be partition-merged: the OOM surfaces as the
    advisory error path (exit 137), not a silent wrong fallback."""
    from mumemto_tpu import engine

    genomes = _genomes(rng, 4)
    paths = _write_fastas(tmp_path, genomes, [f"q{i}" for i in range(4)])

    def always_oom(rb, opts, **kw):
        raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory")

    monkeypatch.setattr(engine, "find_matches", always_oom)
    assert cli.main(paths + ["-o", str(tmp_path / "x"), "-f", "3"]) == 137


def test_auto_partition_never_drops_docs():
    """String-mode partitioning with more partitions than len(files)//2
    previously round-robined files into singleton partitions and silently
    DROPPED them (whole documents lost from the merge — fuzz find). The
    partition count is now capped so every partition holds >= 2 docs and
    every file appears exactly once."""
    for n_files in (2, 3, 4, 5, 7):
        files = [f"f{i}" for i in range(n_files)]
        for req in (2, 3, 4, 8):
            parts = mumemtom.auto_partition(files, req, anchor=False)
            assert sorted(sum(parts, [])) == files, (n_files, req, parts)
            assert all(len(p) >= 2 for p in parts), (n_files, req, parts)


def test_run_partitioned_string_3way_4docs(rng, tmp_path):
    """The fuzz-failing shape: 4 docs requested as 3 string partitions
    must still merge to the union's (non-boundary-crossing) MUM set."""
    genomes = _genomes(rng, 4)
    paths = _write_fastas(tmp_path, genomes, [f"w{i}" for i in range(4)])
    union = str(tmp_path / "union")
    assert cli.main(paths + ["-o", union]) == 0
    merged = mumemtom.run_partitioned_files(
        paths, str(tmp_path / "m3"), num_partitions=3, anchor=False)
    assert _sorted_set(merged, 4) == _sorted_set(union + ".mums", 4)
