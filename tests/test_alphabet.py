import numpy as np

from swimm_tpu.alphabet import (ALPHABET, ALPHABET_SIZE, NUM_CODES, PAD_CODE,
                                PAD_SCORE, decode, encode)


def test_roundtrip():
    s = "ARNDCQEGHILKMFPSTWYVBZX*"
    assert decode(encode(s)) == s


def test_case_insensitive():
    assert np.array_equal(encode("acdw"), encode("ACDW"))


def test_ambiguity_folding():
    assert np.array_equal(encode("U"), encode("C"))
    assert np.array_equal(encode("O"), encode("K"))
    assert np.array_equal(encode("J"), encode("L"))
    assert np.array_equal(encode("-"), encode("X"))


def test_unknown_maps_to_x():
    assert np.array_equal(encode("1"), encode("X"))


def test_codes_in_range():
    codes = encode(ALPHABET)
    assert codes.max() == ALPHABET_SIZE - 1
    assert codes.min() == 0
    assert PAD_CODE == ALPHABET_SIZE
    assert NUM_CODES == ALPHABET_SIZE + 1
    assert PAD_SCORE < -32  # must dominate any real substitution score


def test_pad_decodes_to_hash():
    assert decode(np.array([PAD_CODE], dtype=np.uint8)) == "#"


def test_ambiguity_codes_end_to_end(tmp_path):
    # SURVEY.md sec. 8 parity trap: B/Z/X/'*' and folded extras (U->C,
    # O->K, J->L) must flow through pack -> kernel with the same scores
    # the oracle computes from the same table
    import numpy as np

    from swimm_tpu.db import build_db
    from swimm_tpu.fasta import FastaRecord
    from swimm_tpu.matrices import get_matrix
    from swimm_tpu.models.engine import SearchConfig, score_db
    from swimm_tpu.ops import reference
    from swimm_tpu.alphabet import encode

    seqs = [
        "ARNDBZXCEQ*GHILKMFPST",          # every ambiguity + stop
        "UUOOJJ--..ARN",                   # folded extras and gaps
        "BZX*BZX*BZX*BZX*",
        "MKVLATRESWYHQDNG",                # plain
    ]
    recs = [FastaRecord(f"s{i}", encode(s)) for i, s in enumerate(seqs)]
    packed = build_db(recs, tmp_path / "db", V=8)
    q = FastaRecord("q", encode("ARNDBZX*UOJMKVLATRES"))
    scores = score_db(packed, q, SearchConfig(backend="xla",
                                              precision="f32"))
    exp = reference.sw_score_many(
        q.codes, [recs[i].codes for i in packed.orig_index],
        get_matrix("BLOSUM62"), 10, 2)
    assert np.array_equal(scores, exp)
    assert scores.max() > 0
