"""Native (C++) data-loader vs pure-Python fallback equivalence."""

import gzip

import numpy as np
import pytest

from mumemto_tpu import refbuilder
from mumemto_tpu.native import get_native


@pytest.fixture(scope="module")
def native():
    mod = get_native()
    if mod is None:
        pytest.skip("native extension unavailable (no g++/zlib)")
    return mod


CASES = [
    # multi-record, lowercase, blank lines, comment lines, CRLF
    ">c1 with description\nacgt\nACGT\n\n;comment\n>c2\r\nTTTT\r\n",
    # single record no trailing newline
    ">only\nACGTACGTACGT",
    # record with empty body then another
    ">empty\n>full\nGGGG\n",
    # whitespace right after '>' (name = first word, not empty)
    "> name desc\nACGT\n>\t tabbed\nGGCC\n",
]


@pytest.mark.parametrize("content", CASES)
@pytest.mark.parametrize("use_revcomp", [True, False])
@pytest.mark.parametrize("gz", [False, True])
def test_loader_matches_python(native, tmp_path, content, use_revcomp, gz):
    p = tmp_path / ("x.fa.gz" if gz else "x.fa")
    if gz:
        with gzip.open(p, "wt") as f:
            f.write(content)
    else:
        p.write_text(content)
    doc, names, lens = native.load_fasta_doc(str(p), use_revcomp)
    py_names, py_seqs = refbuilder.read_fasta(str(p))
    assert names == py_names
    assert lens == [int(s.size) for s in py_seqs]
    fwd = (np.concatenate(py_seqs) if len(py_seqs) > 1 else py_seqs[0])
    want = bytes(fwd) + b"$"
    if use_revcomp:
        want += bytes(refbuilder.revcomp(fwd)) + b"$"
    assert doc == want


def test_revcomp_table(native):
    src = bytes(range(256))
    out = native.revcomp(src)
    want = bytes(refbuilder.revcomp(np.frombuffer(src, dtype=np.uint8)))
    assert out == want


def test_build_from_files_native_equals_python(native, tmp_path, monkeypatch, rng):
    from tests.conftest import mutated_collection

    docs = mutated_collection(rng, 3)
    paths = []
    for i, d in enumerate(docs):
        p = tmp_path / f"g{i}.fa"
        p.write_text(f">s{i}\n{d[0]}\n")
        paths.append(str(p))

    rb_native = refbuilder.build_from_files(paths)

    import mumemto_tpu.native as nat
    monkeypatch.setattr(nat, "_native", None)
    monkeypatch.setattr(nat, "_tried", True)
    rb_py = refbuilder.build_from_files(paths)

    assert (rb_native.text == rb_py.text).all()
    assert rb_native.seq_lengths == rb_py.seq_lengths
    assert rb_native.multifasta_names == rb_py.multifasta_names
    assert rb_native.multifasta_lengths == rb_py.multifasta_lengths
