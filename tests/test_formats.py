import numpy as np
import pytest

from mumemto_tpu import formats


def test_bumbl_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n, N = 17, 5
    lengths = rng.integers(20, 1000, n).astype(np.uint32)
    starts = rng.integers(-1, 10000, (n, N)).astype(np.int64)
    strands = rng.integers(0, 2, (n, N)).astype(bool)
    p = str(tmp_path / "x.bumbl")
    formats.write_bumbl(p, lengths, starts, strands, partial=True)
    L, S, T, B, flags = formats.parse_bumbl(p)
    assert (L == lengths).all() and (S == starts).all() and (T == strands).all()
    assert B is None
    assert flags & formats.FLAG_PARTIAL
    assert flags & formats.FLAG_LENGTH32


def test_bumbl_blocks_roundtrip(tmp_path):
    lengths = np.array([30, 40], dtype=np.uint32)
    starts = np.array([[1, 2], [3, 4]], dtype=np.int64)
    strands = np.ones((2, 2), bool)
    blocks = np.array([[0, 1], [1, 1]], dtype=np.uint32)
    p = str(tmp_path / "b.bumbl")
    formats.write_bumbl(p, lengths, starts, strands, blocks=blocks)
    _, _, _, B, flags = formats.parse_bumbl(p)
    assert flags & formats.FLAG_COLL_BLOCKS
    assert (B == blocks).all()


def test_mum_line_format_partial_slots():
    # mem_finder.hpp:406-424: absent docs render as bare commas; absent last
    # doc drops the trailing field entirely
    line = formats.format_mum_line(42, [5, -1, 7], ["+", 0, "-"])
    assert line == b"42\t5,,7\t+,,-\n"
    line = formats.format_mum_line(42, [5, 3, -1], ["+", "-", 0])
    assert line == b"42\t5,3,\t+,-,\n"


def test_parse_mums_roundtrip(tmp_path):
    content = b"42\t5,,7\t+,,-\n30\t1,2,\t+,+,\n"
    p = tmp_path / "a.mums"
    p.write_bytes(content)
    L, S, T = formats.parse_mums(str(p), 3)
    assert L.tolist() == [42, 30]
    assert S.tolist() == [[5, -1, 7], [1, 2, -1]]
    # strand bools are True only for '+' ('-' and absent both False, matching
    # the .bumbl bit packing where only '+' sets the bit)
    assert T.tolist() == [[True, False, False], [True, True, False]]


def test_5byte_roundtrip(tmp_path):
    vals = np.array([0, 1, 2**32 + 5, 2**39, 2**40 - 1], dtype=np.uint64)
    p = str(tmp_path / "x.sa")
    formats.write_5byte(p, vals)
    assert (formats.read_5byte(p) == vals).all()
    import os
    assert os.path.getsize(p) == 5 * len(vals)


def test_rl_bwt_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    bwt = np.repeat(rng.integers(0, 5, 40), rng.integers(1, 9, 40)).astype(np.uint8)
    p = str(tmp_path / "x.bwt")
    formats.write_rl_bwt(p, bwt)
    assert (formats.read_rl_bwt(p) == bwt).all()


def test_lengths_roundtrip(tmp_path):
    f1 = tmp_path / "a.fa"
    f2 = tmp_path / "b.fa"
    f1.write_text(">x\nACGT\n")
    f2.write_text(">y\nAC\n")
    p = str(tmp_path / "out.lengths")
    formats.write_lengths(p, [str(f1), str(f2)], [["x"], ["y", "z"]],
                          [[100], [40, 60]])
    info = formats.parse_lengths(p)
    assert info.totals == [100, 100]
    assert info.contig_names == [["x"], ["y", "z"]]
    assert info.seq_lengths(True) == [202, 202]
    assert info.seq_lengths(False) == [101, 101]


def test_thresh_roundtrip(tmp_path):
    vals = np.array([0, 5, 65535, 20], dtype=np.uint16)
    p = str(tmp_path / "x.thresh")
    formats.write_thresh(p, vals)
    assert (formats.read_thresh(p) == vals).all()


@pytest.mark.parametrize("n_mums,n_seqs,chunk", [(100, 3, 16), (25, 5, 8),
                                                 (1000, 7, 64)])
def test_iter_bumbl_chunks(tmp_path, n_mums, n_seqs, chunk):
    rng = np.random.default_rng(7)
    lengths = rng.integers(20, 4000, n_mums).astype(np.uint32)
    starts = rng.integers(-1, 10**7, (n_mums, n_seqs)).astype(np.int64)
    strands = rng.integers(0, 2, (n_mums, n_seqs)).astype(bool)
    p = str(tmp_path / "x.bumbl")
    formats.write_bumbl(p, lengths, starts, strands)
    Ls, Ss, Ts = zip(*formats.iter_bumbl(p, chunk_size=chunk))
    assert (np.concatenate(Ls) == lengths).all()
    assert (np.concatenate(Ss) == starts).all()
    assert (np.concatenate(Ts) == strands).all()


def test_first_offsets_both_formats(tmp_path):
    rng = np.random.default_rng(8)
    lengths = rng.integers(20, 400, 50).astype(np.uint32)
    starts = rng.integers(0, 10**6, (50, 4)).astype(np.int64)
    starts[3, 0] = -1
    strands = rng.integers(0, 2, (50, 4)).astype(bool)
    pb = str(tmp_path / "x.bumbl")
    formats.write_bumbl(pb, lengths, starts, strands)
    L, O, S = formats.first_offsets(pb)
    assert (L == lengths).all() and (O == starts[:, 0]).all()
    assert (S == strands[:, 0]).all()
    # text format
    pm = str(tmp_path / "x.mums")
    with open(pm, "wb") as f:
        for i in range(50):
            offs = [int(x) for x in starts[i]]
            strs = ["+" if x else "-" for x in strands[i]]
            f.write(formats.format_mum_line(int(lengths[i]), offs, strs))
    L2, O2, S2 = formats.first_offsets(pm)
    assert (L2 == lengths).all()
    want0 = np.where(starts[:, 0] == -1, -1, starts[:, 0])
    assert (O2 == want0).all()
