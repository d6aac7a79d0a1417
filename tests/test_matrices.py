import numpy as np
import pytest

from swimm_tpu.alphabet import ALPHABET, ALPHABET_SIZE, PAD_SCORE, TABLE_CODES
from swimm_tpu.matrices import available_matrices, get_matrix, kernel_table


@pytest.mark.parametrize("name", available_matrices())
def test_symmetric(name):
    m = get_matrix(name)
    assert m.shape == (ALPHABET_SIZE, ALPHABET_SIZE)
    np.testing.assert_array_equal(m, m.T)


@pytest.mark.parametrize("name", available_matrices())
def test_diagonal_positive(name):
    m = get_matrix(name)
    # every residue scores itself strictly positive (except X and *, which vary)
    diag = np.diag(m)[:20]
    assert (diag > 0).all()


def test_blosum62_spot_values():
    m = get_matrix("blosum62")
    a = {c: i for i, c in enumerate(ALPHABET)}
    # Canonical, widely published NCBI BLOSUM62 entries.
    assert m[a["W"], a["W"]] == 11
    assert m[a["A"], a["A"]] == 4
    assert m[a["C"], a["C"]] == 9
    assert m[a["R"], a["K"]] == 2
    assert m[a["I"], a["L"]] == 2
    assert m[a["W"], a["G"]] == -2
    assert m[a["D"], a["E"]] == 2
    assert m[a["B"], a["D"]] == 4
    assert m[a["Z"], a["E"]] == 4
    assert m[a["*"], a["*"]] == 1
    assert m[a["A"], a["*"]] == -4


def test_required_set_present():
    names = available_matrices()
    for req in ["BLOSUM45", "BLOSUM50", "BLOSUM62", "BLOSUM80", "BLOSUM90",
                "PAM30", "PAM70", "PAM250"]:
        assert req in names


def test_kernel_table():
    kt = kernel_table("BLOSUM62")
    assert kt.shape == (TABLE_CODES, TABLE_CODES)
    np.testing.assert_array_equal(kt[:24, :24], get_matrix("BLOSUM62"))
    assert (kt[24:, :] == PAD_SCORE).all()
    assert (kt[:, 24:] == PAD_SCORE).all()


def test_unknown_matrix_raises():
    with pytest.raises(ValueError):
        get_matrix("BLOSUM999")
