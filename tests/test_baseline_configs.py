"""BASELINE.json config-shaped correctness tests (scaled to CPU-test size).

Config 1 (strict multi-MUMs, byte-identical) is covered throughout the
suite; these cover the remaining shapes: partial multi-MUMs on a 10-genome
collection, multi-MEMs (-f 3) on 10 genomes, and a 20-genome two-partition
anchor merge against the union run.
"""

import numpy as np

from mumemto_tpu import cli, engine, formats, options, refbuilder
from mumemto_tpu.oracle import naive
from tests.conftest import rand_seq
from tests.test_merge import _genomes, _write_fastas


def _docs(rng, n, base_len=300, n_mut=6):
    base = rand_seq(rng, base_len)
    out = []
    for _ in range(n):
        s = list(base)
        for _ in range(int(rng.integers(1, n_mut))):
            s[int(rng.integers(0, len(s)))] = rng.choice(list("ACGT"))
        out.append(["".join(s)])
    return out


def test_partial_mums_10_genomes(rng):
    """BASELINE config 2: -k -1 partial multi-MUMs, 10 genomes."""
    rb = refbuilder.build_from_sequences(_docs(rng, 10))
    opts = options.normalize(rb.num_docs, num_distinct_docs=-1, quiet=True)
    assert opts.num_distinct == 9
    want = naive.oracle_output(rb, opts)
    got = engine.find_matches(rb, opts).output_bytes()
    assert want == got
    assert want  # partial MUMs must exist on this collection


def test_mems_f3_10_genomes(rng):
    """BASELINE config 3: multi-MEMs -f 3, 10-genome collection."""
    rep = rand_seq(rng, 50)
    docs = _docs(rng, 10, base_len=250)
    # implant a repeated segment so per-doc frequencies 2..3 occur
    for i in range(0, 10, 2):
        cut = int(rng.integers(0, len(docs[i][0])))
        docs[i][0] = docs[i][0][:cut] + rep + docs[i][0][cut:]
    rb = refbuilder.build_from_sequences(docs)
    opts = options.normalize(rb.num_docs, rare_freq=3, quiet=True)
    want = naive.oracle_output(rb, opts)
    got = engine.find_matches(rb, opts).output_bytes()
    assert want == got
    assert want


def test_anchor_merge_20_genomes(rng, tmp_path):
    """BASELINE config 4 shape: 20 genomes, 2 partitions + anchor merge ==
    single run on the union."""
    genomes = _genomes(rng, 20, base_len=260, n_mut=6)
    paths = _write_fastas(tmp_path, genomes, [f"h{i}" for i in range(20)])
    p1 = str(tmp_path / "p1")
    p2 = str(tmp_path / "p2")
    union = str(tmp_path / "union")
    assert cli.main([paths[0]] + paths[1:11] + ["-o", p1, "-M", "-n"]) == 0
    assert cli.main([paths[0]] + paths[11:] + ["-o", p2, "-M", "-n"]) == 0
    assert cli.main(paths + ["-o", union]) == 0
    out = str(tmp_path / "merged20.mums")
    assert cli.main(["merge", p1 + ".mums", p2 + ".mums", "-o", out]) == 0

    def key(path):
        L, S, T = formats.parse_mums(path, 20)
        order = np.lexsort((L, S[:, 0]))
        return L[order].tolist(), S[order].tolist(), T[order].tolist()

    assert key(out) == key(union + ".mums")


def test_chr_shape_20_haplotypes_blocks(rng):
    """BASELINE config 5 shape: 20 haplotypes, full multi-MUM + collinear
    blocks, scaled to CPU-test size. The designated chr-scale execution
    path (block-sharded wide scan) must be byte-equal to the single-device
    engine, and the analysis layer must produce collinear blocks."""
    import jax

    from mumemto_tpu.analysis import mumdata
    from mumemto_tpu.parallel import seqpfp

    docs = _docs(rng, 20, base_len=3000, n_mut=10)
    rb = refbuilder.build_from_sequences(docs)
    opts = options.normalize(rb.num_docs, quiet=True)
    res = engine.find_matches(rb, opts, backend="pfp")
    assert res.output_bytes() == naive.oracle_output(rb, opts)
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), ("seq",))
    sharded = seqpfp.find_matches_seq_sharded(rb, opts, mesh)
    assert sharded.output_bytes() == res.output_bytes()

    import os
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        pfx = os.path.join(td, "c5")
        engine.write_outputs(res, rb, pfx)
        md = mumdata.MUMdata(pfx + ".mums")
    blocks = mumdata.find_coll_blocks(md)
    assert len(blocks) > 0
