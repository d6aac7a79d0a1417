import numpy as np

from swimm_tpu.alphabet import PAD_CODE
from swimm_tpu.db import build_db, load_db, quantize_len
from swimm_tpu.utils.synth import synth_db


def test_quantize_len():
    assert quantize_len(1) == 32
    assert quantize_len(32) == 32
    assert quantize_len(33) == 64
    assert quantize_len(513) == 640
    assert quantize_len(2049) == 2560
    assert quantize_len(8193) == 10240


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
