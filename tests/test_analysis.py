"""Analysis-layer tools: viz, inversions, label, bed, trim, tabix, density."""

import gzip
import os

import numpy as np
import pytest

from mumemto_tpu import cli, formats
from mumemto_tpu.analysis.mumdata import MUMdata
from mumemto_tpu.refbuilder import revcomp
from tests.conftest import rand_seq


def _rc(s):
    return bytes(revcomp(np.frombuffer(s.encode(), np.uint8))).decode()


@pytest.fixture
def inversion_collection(rng, tmp_path):
    """Genome 2 carries an inversion spanning two collinear blocks.

    The detector (find_inversions.py) flags maximal stretches of collinear
    blocks in REVERSED order with '-' strands, so the inverted region must
    contain >= 2 blocks, each of >= 2 MUMs, separated by a gap larger than
    the block max-gap (1000bp default).
    """
    P, Q = rand_seq(rng, 120), rand_seq(rng, 120)
    # each S splits into two MUMs via a genome-1-only mutation in the middle
    s1a, s1b = rand_seq(rng, 100), rand_seq(rng, 100)
    s2a, s2b = rand_seq(rng, 100), rand_seq(rng, 100)
    gaps = [rand_seq(rng, 1500) for _ in range(3)]  # per-genome junk
    mid = ["A", "C", "A"]  # genome 1 differs -> splits each S into two MUMs
    genomes = []
    for i in range(3):
        S1 = s1a + mid[i] + s1b
        S2 = s2a + mid[i] + s2b
        if i < 2:
            genomes.append(P + S1 + gaps[i] + S2 + Q)
        else:
            genomes.append(P + _rc(S2) + gaps[i] + _rc(S1) + Q)
    paths = []
    for i, g in enumerate(genomes):
        p = tmp_path / f"inv{i}.fa"
        p.write_text(f">inv{i}\n{g}\n")
        paths.append(str(p))
    out = str(tmp_path / "inv")
    assert cli.main(paths + ["-o", out]) == 0
    return tmp_path, out


def test_inversion_detection(inversion_collection, capsys):
    tmp_path, out = inversion_collection
    assert cli.main(["inversion", "-m", out + ".mums"]) == 0
    got = capsys.readouterr().out.splitlines()
    assert got[0].startswith("hap_id")
    assert len(got) >= 2, "inversion not detected"
    row = got[1].split("\t")
    assert row[0] == "inv2.fa"
    # inverted region spans [120, 120+201+1500+201) of genome 2
    start, end = int(row[1]), int(row[2])
    assert 100 <= start <= 400 and 1600 <= end <= 2100


def test_viz_renders_png(inversion_collection):
    tmp_path, out = inversion_collection
    png = str(tmp_path / "synteny.png")
    assert cli.main(["viz", "-m", out + ".mums", "-o", png]) == 0
    data = open(png, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(data) > 2000
    # per-MUM mode
    png2 = str(tmp_path / "synteny2.png")
    assert cli.main(["viz", "-m", out + ".mums", "-o", png2,
                     "--no-coll-block", "-c"]) == 0
    assert open(png2, "rb").read()[:8] == b"\x89PNG\r\n\x1a\n"


def test_viz_interactive_html(inversion_collection):
    tmp_path, out = inversion_collection
    htm = str(tmp_path / "synteny.html")
    assert cli.main(["viz", "-m", out + ".mums", "-o", htm,
                     "--interactive"]) == 0
    data = open(htm).read()
    assert data.startswith("<!DOCTYPE html>")
    assert "<svg" in data and "polygon" in data and "viewBox" in data
    # inversion polygons carry the inversion color
    assert "green" in data


@pytest.fixture
def multirecord_build(rng, tmp_path):
    base1 = rand_seq(rng, 150)
    base2 = rand_seq(rng, 100)
    paths = []
    for i in range(2):
        s1, s2 = list(base1), list(base2)
        for _ in range(3):
            s1[int(rng.integers(0, len(s1)))] = rng.choice(list("ACGT"))
            s2[int(rng.integers(0, len(s2)))] = rng.choice(list("ACGT"))
        p = tmp_path / f"mr{i}.fa"
        p.write_text(f">c1\n{''.join(s1)}\n>c2\n{''.join(s2)}\n")
        paths.append(str(p))
    out = str(tmp_path / "mr")
    assert cli.main(paths + ["-o", out]) == 0
    return tmp_path, out


def test_label(multirecord_build):
    tmp_path, out = multirecord_build
    assert cli.main(["label", "-m", out + ".mums",
                     "-o", out + "_labeled.mums"]) == 0
    lines = open(out + "_labeled.mums").read().splitlines()
    assert lines
    for l in lines:
        parts = l.split("\t")
        assert len(parts) == 6  # len, starts, strands, block, contig, rel
    # contig names mode
    assert cli.main(["label", "-m", out + ".mums", "-n",
                     "-o", out + "_named.mums"]) == 0
    assert any(("c1" in l or "c2" in l)
               for l in open(out + "_named.mums").read().splitlines())


def test_bed(multirecord_build, capsys):
    tmp_path, out = multirecord_build
    assert cli.main(["bed", out + ".mums", "-L", "10"]) == 0
    lines = capsys.readouterr().out.splitlines()
    assert lines
    for l in lines:
        parts = l.split("\t")
        assert len(parts) == 5
        assert parts[0] in ("c1", "c2")
        assert int(parts[2]) > int(parts[1])


def test_bed_with_blocks(multirecord_build, capsys):
    tmp_path, out = multirecord_build
    assert cli.main(["collinear", "-m", out + ".mums",
                     "-o", out + "_blk.mums"]) == 0
    assert cli.main(["bed", out + "_blk.mums", "-l", out + ".lengths"]) == 0
    lines = capsys.readouterr().out.splitlines()
    assert any(l.split("\t")[3].startswith("block_") for l in lines)


def test_trim(multirecord_build):
    tmp_path, out = multirecord_build
    # synthesize a mums file with an overhanging MUM
    md = MUMdata(out + ".mums")
    info = formats.parse_lengths(out + ".lengths")
    big = MUMdata.from_arrays(
        np.array([50, 30], dtype=np.uint32),
        np.array([[info.totals[0] - 10, 5], [0, 0]], dtype=np.int64),
        np.ones((2, 2), dtype=bool))
    big.write_mums(str(tmp_path / "over.mums"))
    (tmp_path / "over.lengths").write_text(
        open(out + ".lengths").read())
    assert cli.main(["trim", "-m", str(tmp_path / "over.mums"),
                     "-o", str(tmp_path / "over_trimmed.mums")]) == 0
    L, S, T = formats.parse_mums(str(tmp_path / "over_trimmed.mums"), 2)
    assert L.tolist() == [30]  # 50-MUM trimmed to 10 -> dropped (<20)


def test_tabix_and_density(multirecord_build):
    tmp_path, out = multirecord_build
    assert cli.main(["tabix", out + ".mums", "--no-tabix"]) == 0
    gz = out + ".mum.bed.gz"
    assert os.path.exists(gz)
    with gzip.open(gz, "rt") as f:
        lines = f.read().splitlines()
    assert lines and len(lines[0].split("\t")) == 6

    # density needs a .mems file
    paths = sorted(str(p) for p in tmp_path.glob("mr*.fa"))
    out2 = str(tmp_path / "memd")
    assert cli.main(paths + ["-o", out2, "-f", "2"]) == 0
    assert cli.main(["density", "-m", out2 + ".mems",
                     "-l", out2 + ".lengths"]) == 0
    cov = np.load(out2 + "_coverage.npy")
    assert cov.shape[0] == 2 and cov.max() >= 1


def test_convert_thresh_roundtrip(rng, tmp_path):
    from tests.conftest import mutated_collection
    docs = mutated_collection(rng, 3)
    ps = []
    for i, d in enumerate(docs):
        p = tmp_path / f"ct{i}.fa"
        p.write_text(f">ct{i}\n{d[0]}\n")
        ps.append(str(p))
    out = str(tmp_path / "ct")
    assert cli.main(ps + ["-o", out, "-M"]) == 0
    # our thresh files are already sorted; converting a sorted file is a no-op
    assert cli.main(["convert-thresh", out + ".mums",
                     "-o", out + "_conv"]) == 0
    md_sorted = MUMdata(out + ".mums", sort=True)
    L, S, T = formats.parse_mums(out + "_conv.mums", 3)
    assert (S[:, 0] == md_sorted.starts[:, 0]).all()


def test_viz_multifasta_modes(multirecord_build):
    """delineated and gapped multi-FASTA viz modes (viz_mums.py:160-296)."""
    tmp_path, out = multirecord_build
    for mode in ("delineated", "gapped"):
        png = str(tmp_path / f"synteny_{mode}.png")
        assert cli.main(["viz", "-m", out + ".mums", "-l", out + ".lengths",
                         "-o", png, "--mode", mode]) == 0
        assert open(png, "rb").read()[:8] == b"\x89PNG\r\n\x1a\n"
