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
