import numpy as np

from swimm_tpu.alphabet import PAD_CODE
from swimm_tpu.db import build_db, load_db, quantize_len
from swimm_tpu.utils.synth import synth_db


def test_quantize_len():
    assert quantize_len(1) == 32
    assert quantize_len(32) == 32
    assert quantize_len(33) == 64
    assert quantize_len(513) == 544   # flat 32-quanta (ragged kernel makes
    # chunk-shape diversity free; see db._LEN_QUANTA)
    assert quantize_len(2049) == 2080
    assert quantize_len(8193) == 8224


def test_roundtrip(tmp_path):
    recs = synth_db(500, seed=3)
    packed = build_db(recs, tmp_path / "db", V=64)
    loaded = load_db(tmp_path / "db")

    assert loaded.n_seqs == 500
    assert loaded.total_residues == sum(r.length for r in recs)
    np.testing.assert_array_equal(loaded.lengths, packed.lengths)
    np.testing.assert_array_equal(loaded.orig_index, packed.orig_index)
    assert loaded.titles == packed.titles

    # lengths sorted ascending (C3 parity: SURVEY.md section 4.1)
    assert (np.diff(loaded.lengths) >= 0).all()

    # every sequence's packed codes match the original record
    for ch in loaded.chunks:
        for k in range(ch.n_seqs):
            blk, lane = divmod(k, ch.V)
            sorted_idx = ch.base + k
            rec = recs[loaded.orig_index[sorted_idx]]
            got = ch.codes[blk, :, lane]
            np.testing.assert_array_equal(got[:rec.length],
                                          rec.codes.astype(np.int8))
            assert (got[rec.length:] == PAD_CODE).all()

    # chunks tile the sorted order exactly, blocks padded with PAD lanes
    covered = sum(ch.n_seqs for ch in loaded.chunks)
    assert covered == 500
    for ch in loaded.chunks:
        assert ch.codes.shape == (ch.n_blocks, ch.L, ch.V)
        # pad lanes are all PAD
        for k in range(ch.n_seqs, ch.n_blocks * ch.V):
            blk, lane = divmod(k, ch.V)
            assert (ch.codes[blk, :, lane] == PAD_CODE).all()


def test_manifest_versioned(tmp_path):
    recs = synth_db(20, seed=1)
    packed = build_db(recs, tmp_path / "db", V=8)
    assert packed.manifest["format_version"] == 1
    assert packed.manifest["n_chunks"] == len(packed.chunks)


def test_build_resume(tmp_path):
    recs = synth_db(60, seed=4)
    p1 = build_db(recs, tmp_path / "db", V=8)
    import os
    mtime = os.path.getmtime(tmp_path / "db" / "chunk_0000.npy")
    p2 = build_db(recs, tmp_path / "db", V=8, resume=True)
    assert os.path.getmtime(tmp_path / "db" / "chunk_0000.npy") == mtime
    assert p2.n_seqs == p1.n_seqs
    # different V must rebuild
    p3 = build_db(recs, tmp_path / "db", V=16, resume=True)
    assert p3.manifest["V"] == 16


def test_native_pack_matches_python(tmp_path):
    # C2/C3 native path (csrc/swpack.c) must produce a byte-identical pack
    pytest = __import__("pytest")
    from swimm_tpu import native
    if not native.available():
        pytest.skip("no cc for native packer")
    from swimm_tpu.fasta import write_fasta
    recs = synth_db(150, seed=9, median_len=70, sigma=0.5, max_len=300)
    fa = tmp_path / "db.fasta"
    write_fasta(fa, recs)
    py = build_db(fa, tmp_path / "py", V=16, use_native=False)
    nat = build_db(fa, tmp_path / "nat", V=16, use_native=True)
    assert nat.n_seqs == py.n_seqs
    assert nat.total_residues == py.total_residues
    np.testing.assert_array_equal(nat.lengths, py.lengths)
    np.testing.assert_array_equal(nat.orig_index, py.orig_index)
    assert nat.titles == py.titles
    assert len(nat.chunks) == len(py.chunks)
    for c1, c2 in zip(nat.chunks, py.chunks):
        assert (c1.L, c1.V, c1.n_blocks, c1.base, c1.n_seqs) == \
               (c2.L, c2.V, c2.n_blocks, c2.base, c2.n_seqs)
        np.testing.assert_array_equal(np.asarray(c1.codes), np.asarray(c2.codes))


def test_native_parse_matches_python(tmp_path):
    pytest = __import__("pytest")
    from swimm_tpu import native
    if not native.available():
        pytest.skip("no cc")
    from swimm_tpu.fasta import read_fasta, write_fasta
    recs = synth_db(40, seed=2, median_len=50, sigma=0.3, max_len=120)
    fa = tmp_path / "x.fasta"
    write_fasta(fa, recs)
    codes, offs, lens, titles = native.parse_fasta(fa)
    py = read_fasta(fa)
    assert len(py) == len(lens)
    for i, r in enumerate(py):
        assert titles[i] == r.title
        np.testing.assert_array_equal(codes[offs[i]:offs[i]+lens[i]], r.codes)


def test_load_db_rejects_unknown_version(tmp_path):
    import json

    from swimm_tpu.db import build_db, load_db
    from swimm_tpu.utils.synth import synth_db

    packed = build_db(synth_db(20, seed=1), tmp_path / "db", V=8)
    mf = tmp_path / "db" / "manifest.json"
    m = json.loads(mf.read_text())
    m["format_version"] = 999
    mf.write_text(json.dumps(m))
    import pytest
    with pytest.raises(ValueError, match="format_version"):
        load_db(tmp_path / "db")


def test_native_parse_matches_python_exotic_whitespace(tmp_path):
    # ADVICE r1: both parsers must strip EXACTLY ' ' and '\t' from sequence
    # lines; any other control char ('\x0b', '\f', ...) encodes through the
    # LUT (to X) identically in both — the 'two encoders cannot disagree'
    # invariant under adversarial whitespace.
    pytest = __import__("pytest")
    from swimm_tpu import native
    if not native.available():
        pytest.skip("no cc")
    from swimm_tpu.fasta import read_fasta
    fa = tmp_path / "w.fasta"
    fa.write_bytes(
        b">  t1 \f\t \nAC\x0bDE FG\tHI\n\fKL\n"
        b"> t2\t\nMN\x0cPQ\r\nRS TV \n")
    codes, offs, lens, titles = native.parse_fasta(fa)
    py = read_fasta(str(fa))
    assert len(py) == len(lens) == 2
    for i, r in enumerate(py):
        assert titles[i] == r.title
        np.testing.assert_array_equal(codes[offs[i]:offs[i] + lens[i]],
                                      r.codes)


def test_resume_rejects_same_shape_different_content(tmp_path):
    # r2 review: the old (n_seqs, V, total_residues) resume check accepted
    # ANY same-shape edit; the manifest input digest must catch content
    # changes (residue swaps between records keep both counts equal)
    from swimm_tpu.fasta import FastaRecord
    recs = synth_db(30, seed=70, median_len=40, sigma=0.3, max_len=80)
    d = tmp_path / "db"
    p1 = build_db(recs, d)
    assert "input_digest" in p1.manifest
    # swap residues between two records: same n_seqs, same lengths
    a, b = recs[0].codes.copy(), recs[1].codes.copy()
    n = min(len(a), len(b))
    a[:n], b[:n] = recs[1].codes[:n], recs[0].codes[:n]
    recs2 = list(recs)
    recs2[0] = FastaRecord(recs[0].title, a)
    recs2[1] = FastaRecord(recs[1].title, b)
    p2 = build_db(recs2, d, resume=True)        # must REBUILD, not reuse
    assert p2.manifest["input_digest"] != p1.manifest["input_digest"]
    # unchanged input DOES reuse
    p3 = build_db(recs2, d, resume=True)
    assert p3.manifest["input_digest"] == p2.manifest["input_digest"]
    # title-only rename also rebuilds
    recs3 = list(recs2)
    recs3[2] = FastaRecord("renamed", recs2[2].codes)
    p4 = build_db(recs3, d, resume=True)
    assert p4.titles != p2.titles


def test_parser_parity_adversarial_fasta(tmp_path):
    # adversarial inputs both parsers must handle IDENTICALLY: no trailing
    # newline, empty sequences between headers, giant titles, CRLF,
    # title-only files, leading/trailing blank lines
    pytest = __import__("pytest")
    from swimm_tpu import native
    if not native.available():
        pytest.skip("no cc")
    from swimm_tpu.fasta import read_fasta

    cases = {
        "no_trailing_newline": b">a\nACDE",
        "empty_seq_between": b">a\nACDE\n>b\n>c\nKLMN\n",
        "title_only": b">only title here\n",
        "giant_title": b">" + b"T" * 5000 + b"\nAC\n",
        "crlf": b">a\r\nAC\r\nDE\r\n>b\r\nKL\r\n",
        "blank_lines": b"\n\n>a\n\nAC\n\n\n>b\nKL\n\n",
        "multiline_seq": b">a\n" + b"ACDEFGHIKL\n" * 30,
    }
    for name, payload in cases.items():
        fa = tmp_path / f"{name}.fasta"
        fa.write_bytes(payload)
        codes, offs, lens, titles = native.parse_fasta(fa)
        py = read_fasta(str(fa))
        assert len(py) == len(lens), name
        for i, r in enumerate(py):
            assert titles[i] == r.title, (name, i)
            np.testing.assert_array_equal(
                codes[offs[i]:offs[i] + lens[i]], r.codes,
                err_msg=f"{name}[{i}]")


def test_gzip_fasta_transparent(tmp_path):
    # Swiss-Prot ships .fasta.gz: reading and preprocessing a gzipped
    # file must give byte-identical results to the plain file (gzip is
    # sniffed by magic, not extension; the native packer is bypassed)
    import gzip

    from swimm_tpu.db import build_db
    from swimm_tpu.fasta import is_gzip, read_fasta, write_fasta
    from swimm_tpu.utils.synth import synth_db

    recs = synth_db(60, seed=77, median_len=50, sigma=0.4, max_len=120)
    plain = tmp_path / "db.fasta"
    write_fasta(plain, recs)
    gz = tmp_path / "renamed.fasta"          # deliberately NOT .gz
    gz.write_bytes(gzip.compress(plain.read_bytes()))
    assert is_gzip(gz) and not is_gzip(plain)

    py_plain = read_fasta(str(plain))
    py_gz = read_fasta(str(gz))
    assert len(py_plain) == len(py_gz) == 60
    for a, b in zip(py_plain, py_gz):
        assert a.title == b.title
        np.testing.assert_array_equal(a.codes, b.codes)

    p1 = build_db(str(plain), tmp_path / "p1", V=8)
    p2 = build_db(str(gz), tmp_path / "p2", V=8)
    assert p1.n_seqs == p2.n_seqs
    t1, _, _ = p1.flat_tiles()
    t2, _, _ = p2.flat_tiles()
    np.testing.assert_array_equal(t1, t2)


def test_parser_rejects_data_before_header(tmp_path):
    pytest = __import__("pytest")
    from swimm_tpu.fasta import read_fasta
    fa = tmp_path / "bad.fasta"
    fa.write_bytes(b"ACDE\n>late header\nKL\n")
    with pytest.raises(ValueError):
        read_fasta(str(fa))
    from swimm_tpu import native
    if native.available():
        with pytest.raises(ValueError):
            native.parse_fasta(fa)
