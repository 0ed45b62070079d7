import gzip

import numpy as np
import pytest

from mumemto_tpu import refbuilder


def test_revcomp():
    seq = np.frombuffer(b"ACGTN", dtype=np.uint8)
    assert bytes(refbuilder.revcomp(seq)) == b"NACGT"


def test_layout_fwd_dollar_rc_dollar():
    rb = refbuilder.build_from_sequences([["ACG"], ["TTA"]], use_revcomp=True)
    assert bytes(rb.text) == b"ACG$CGT$TTA$TAA$"
    assert rb.seq_lengths == [8, 8]
    assert rb.doc_ends.tolist() == [8, 16]


def test_layout_no_revcomp():
    rb = refbuilder.build_from_sequences([["ACG"], ["TTA"]], use_revcomp=False)
    assert bytes(rb.text) == b"ACG$TTA$"


def test_multi_record_doc_rc_is_full_revcomp():
    # ref_builder.cpp:272-291: records reversed in order, each revcomp'd
    rb = refbuilder.build_from_sequences([["ACG", "TT"], ["GGGG"]], use_revcomp=True)
    assert bytes(rb.text).startswith(b"ACGTT$AACGT$")


def test_lowercase_uppercased():
    rb = refbuilder.build_from_sequences([["acgt"], ["gg"]], use_revcomp=False)
    assert bytes(rb.text) == b"ACGT$GG$"


def test_doc_array():
    rb = refbuilder.build_from_sequences([["ACG"], ["TTA"]], use_revcomp=False)
    da = rb.doc_array(np.array([0, 3, 4, 7, 8, 100]))
    assert da.tolist() == [0, 0, 1, 1, 2, 2]


def test_files_gzip_and_dedup(tmp_path):
    f1 = tmp_path / "a.fa"
    f1.write_text(">x desc\nacg\ntt\n>y\nGG\n")
    f2 = tmp_path / "b.fa.gz"
    with gzip.open(f2, "wt") as f:
        f.write(">z\nTTTT\n")
    rb = refbuilder.build_from_files([str(f1), str(f2), str(f1)])
    assert rb.num_docs == 2  # duplicate removed, order preserved
    assert rb.multifasta_names == [["x", "y"], ["z"]]
    assert rb.multifasta_lengths == [[5, 2], [4]]
    assert bytes(rb.text).startswith(b"ACGTTGG$")


def test_single_file_rejected(tmp_path):
    f1 = tmp_path / "a.fa"
    f1.write_text(">x\nACGT\n")
    with pytest.raises(ValueError):
        refbuilder.build_from_files([str(f1)])


def test_empty_file_rejected(tmp_path):
    f1 = tmp_path / "a.fa"
    f2 = tmp_path / "b.fa"
    f1.write_text(">x\nACGT\n")
    f2.write_text(">y\n")
    with pytest.raises(ValueError):
        refbuilder.build_from_files([str(f1), str(f2)])


def test_lengths_file_roundtrip(tmp_path):
    f1 = tmp_path / "a.fa"
    f2 = tmp_path / "b.fa"
    f1.write_text(">x\nACGTACGT\n")
    f2.write_text(">y\nACGT\n>z\nTT\n")
    rb = refbuilder.build_from_files([str(f1), str(f2)])
    rb.write_lengths_file(str(tmp_path / "out"))
    rb2 = refbuilder.build_from_lengths(str(tmp_path / "out"))
    assert rb2.seq_lengths == rb.seq_lengths
    assert rb2.num_docs == rb.num_docs
