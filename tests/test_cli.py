import gzip

import numpy as np
import pytest

from mumemto_tpu import cli, formats
from mumemto_tpu.analysis import dispatch
from tests.conftest import mutated_collection


@pytest.fixture
def fasta_dir(rng, tmp_path):
    docs = mutated_collection(rng, 3)
    paths = []
    for i, d in enumerate(docs):
        p = tmp_path / f"g{i}.fa"
        p.write_text(f">s{i}\n{d[0]}\n")
        paths.append(str(p))
    return tmp_path, paths


def test_build_and_subcommands(fasta_dir, capsys):
    tmp_path, paths = fasta_dir
    out = str(tmp_path / "out")
    assert cli.main(paths + ["-o", out]) == 0
    mums = (tmp_path / "out.mums").read_bytes()
    assert mums
    assert (tmp_path / "out.lengths").exists()

    # convert -> bumbl -> view round trip
    assert cli.main(["convert", "-m", out + ".mums", "-o", out + ".bumbl"]) == 0
    L, S, T, B, flags = formats.parse_bumbl(out + ".bumbl")
    assert len(L) == mums.count(b"\n")
    assert cli.main(["view", out + ".bumbl"]) == 0
    shown = capsys.readouterr().out
    assert len(shown.splitlines()) == len(L)

    # collinear
    assert cli.main(["collinear", "-m", out + ".mums",
                     "-o", out + "_blocks.mums"]) == 0
    lines = (tmp_path / "out_blocks.mums").read_text().splitlines()
    assert all(len(l.split("\t")) == 4 for l in lines)

    # coverage
    assert cli.main(["coverage", "-m", out + ".mums",
                     "-l", out + ".lengths"]) == 0

    # extract
    assert cli.main(["extract", "-m", out + ".mums",
                     "-o", str(tmp_path / "x.fa")]) == 0
    fa = (tmp_path / "x.fa").read_text()
    assert fa.startswith(">mum_0")
    assert fa.count(">") == len(L)

    # lengths
    assert cli.main(["lengths"] + paths + ["-o", str(tmp_path / "lens")]) == 0
    info = formats.parse_lengths(str(tmp_path / "lens.lengths"))
    assert len(info.paths) == 3


def test_build_filelist_and_binary(fasta_dir):
    tmp_path, paths = fasta_dir
    fl = tmp_path / "filelist.txt"
    fl.write_text("\n".join(paths) + "\n")
    out = str(tmp_path / "outb")
    assert cli.main(["-i", str(fl), "-o", out, "-b"]) == 0
    L, S, T, B, flags = formats.parse_bumbl(out + ".bumbl")
    assert len(L) > 0
    assert not (flags & formats.FLAG_PARTIAL)


def test_build_gzip_input(rng, tmp_path):
    docs = mutated_collection(rng, 2)
    p1 = tmp_path / "a.fa"
    p1.write_text(f">a\n{docs[0][0]}\n")
    p2 = tmp_path / "b.fa.gz"
    with gzip.open(p2, "wt") as f:
        f.write(f">b\n{docs[1][0]}\n")
    out = str(tmp_path / "gz")
    assert cli.main([str(p1), str(p2), "-o", out]) == 0
    assert (tmp_path / "gz.mums").read_bytes()


def test_only_parse_then_resume(fasta_dir):
    """-P writes .dict/.parse/.lengths; -p resumes and must produce the
    same .mums as the direct run (pfp_mum.cpp:112-123 checkpoint cycle)."""
    tmp_path, paths = fasta_dir
    full = str(tmp_path / "full")
    assert cli.main(paths + ["-o", full]) == 0
    want = (tmp_path / "full.mums").read_bytes()

    ck = str(tmp_path / "ck")
    assert cli.main(paths + ["-o", ck, "-P"]) == 0
    assert (tmp_path / "ck.dict").exists()
    assert (tmp_path / "ck.parse").exists()
    assert (tmp_path / "ck.lengths").exists()

    out = str(tmp_path / "resumed")
    assert cli.main(["-p", ck, "-o", out]) == 0
    assert (tmp_path / "resumed.mums").read_bytes() == want


def test_arrays_out_then_replay(fasta_dir):
    """-A writes 5-byte .sa/.lcp + RL .bwt; -a replays them and must
    produce the same .mums (pfp_mum.cpp:97-110 checkpoint cycle)."""
    tmp_path, paths = fasta_dir
    out = str(tmp_path / "arr")
    assert cli.main(paths + ["-o", out, "-A"]) == 0
    for ext in (".sa", ".lcp", ".bwt", ".mums", ".lengths"):
        assert (tmp_path / ("arr" + ext)).exists(), ext
    want = (tmp_path / "arr.mums").read_bytes()
    out2 = str(tmp_path / "arr_replayed")
    assert cli.main(["-a", out, "-o", out2]) == 0
    assert (tmp_path / "arr_replayed.mums").read_bytes() == want
    assert want


def test_mori(capsys):
    assert cli.main(["mori"]) == 0
    assert "," in capsys.readouterr().out


def test_cli_degenerate_inputs(tmp_path, capsys):
    """Reference-style clean failures (die(), ref_builder.cpp:249-252):
    empty file, missing file, single doc -> error exit, no traceback;
    zero matches -> success with an empty .mums."""
    empty = tmp_path / "empty.fa"
    empty.write_text("")
    ok = tmp_path / "ok.fa"
    ok.write_text(">a\nACGTACGTACGTACGTACGTACGT\n")
    ok2 = tmp_path / "ok2.fa"
    ok2.write_text(">b\nACGTACGTACGTACGTACGTACGT\n")
    out = str(tmp_path / "o")
    assert cli.main([str(empty), str(ok), "-o", out]) == 1
    assert cli.main([str(tmp_path / "nope.fa"), str(ok), "-o", out]) == 1
    assert cli.main([str(ok), "-o", out]) == 1
    assert cli.main([str(ok), str(ok2), "-o", out, "-l", "200"]) == 0
    assert (tmp_path / "o.mums").read_bytes() == b""


def test_cli_gsacak_routes_direct_backend(rng, tmp_path, monkeypatch):
    """-g must actually run the direct backend (it silently ran PFP once)."""
    from mumemto_tpu.ops import pipeline as ops_pipeline
    calls = []
    real = ops_pipeline.scan_collection

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(ops_pipeline, "scan_collection", spy)
    docs = mutated_collection(np.random.default_rng(5), 3, base_len=300)
    paths = []
    for i, d in enumerate(docs):
        p = tmp_path / f"d{i}.fa"
        p.write_text(f">d{i}\n{d[0]}\n")
        paths.append(str(p))
    assert cli.main(paths + ["-o", str(tmp_path / "pfp")]) == 0
    assert not calls, "default run must NOT use the direct backend"
    assert cli.main(paths + ["-o", str(tmp_path / "direct"), "-g"]) == 0
    assert calls, "-g must route to the direct backend"
    assert (tmp_path / "pfp.mums").read_bytes() == \
        (tmp_path / "direct.mums").read_bytes()


def test_cli_seq_shards_validation(tmp_path):
    ok = tmp_path / "v.fa"
    ok.write_text(">v\nACGTACGTACGTACGTACGTACGT\n")
    ok2 = tmp_path / "v2.fa"
    ok2.write_text(">w\nACGTACGTACGTACGTACGTACGT\n")
    args = [str(ok), str(ok2), "-o", str(tmp_path / "x")]
    assert cli.main(args + ["--seq-shards", "3"]) == 1
    assert cli.main(args + ["--seq-shards", "-1"]) == 1
