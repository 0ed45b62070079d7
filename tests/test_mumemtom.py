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
