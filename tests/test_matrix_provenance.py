"""Matrix provenance hardening (VERDICT r2 missing #5 / next-step #4).

The repo's parity tests all read the SAME matrix tables (kernel, NumPy
oracle, C oracle), so a transcription error in matrices.py is invisible to
every one of them. This file is a SECOND, independent transcription of
canonical values from the NCBI data files — re-derived from memory of the
published tables in round 3, separately from the round-1 table entry — so
a wrong cell in either transcription fails here without any shared-table
loop:

- all 20 amino-acid diagonals of every shipped matrix (hard-coded),
- the global min / max of every table (hard-coded),
- famous off-diagonal pairs (hard-coded),
- ambiguity/stop conventions (B/Z/X rows, the * sentinel),
- one golden ALIGNMENT per matrix whose expected score is computed from
  the independent values in this file, not from get_matrix().

Contract: SURVEY.md section 3 C5 ("same tables ..., verified against NCBI
values"). A full-table NCBI diff still needs network access; per-matrix
status is documented in swimm_tpu/matrices.py.
"""

import numpy as np
import pytest

from swimm_tpu.alphabet import ALPHABET, encode
from swimm_tpu.matrices import available_matrices, get_matrix

AA = "ARNDCQEGHILKMFPSTWYV"

# Independent transcription: canonical NCBI diagonals, order ARNDCQEGHILKMFPSTWYV
DIAG = {
    "BLOSUM62": [4, 5, 6, 6, 9, 5, 5, 6, 8, 4, 4, 5, 5, 6, 7, 4, 5, 11, 7, 4],
    "BLOSUM50": [5, 7, 7, 8, 13, 7, 6, 8, 10, 5, 5, 6, 7, 8, 10, 5, 5, 15, 8, 5],
    "BLOSUM45": [5, 7, 6, 7, 12, 6, 6, 7, 10, 5, 5, 5, 6, 8, 9, 4, 5, 15, 8, 5],
    "BLOSUM80": [5, 6, 6, 6, 9, 6, 6, 6, 8, 5, 4, 5, 6, 6, 8, 5, 5, 11, 7, 4],
    "BLOSUM90": [5, 6, 7, 7, 9, 7, 6, 6, 8, 5, 5, 6, 7, 7, 8, 5, 6, 11, 8, 5],
    "PAM250":   [2, 6, 2, 4, 12, 4, 4, 5, 6, 5, 6, 5, 6, 9, 6, 2, 3, 17, 10, 4],
    "PAM70":    [5, 8, 6, 6, 9, 7, 6, 6, 8, 7, 6, 6, 10, 8, 7, 5, 6, 13, 9, 6],
    "PAM30":    [6, 8, 8, 8, 10, 8, 8, 6, 9, 8, 7, 7, 11, 9, 8, 6, 7, 13, 10, 7],
}

# (table min, table max) of the full 24x24 NCBI tables
MINMAX = {
    "BLOSUM62": (-4, 11), "BLOSUM50": (-5, 15), "BLOSUM45": (-5, 15),
    "BLOSUM80": (-6, 11), "BLOSUM90": (-6, 11), "PAM250": (-8, 17),
    "PAM70": (-11, 13), "PAM30": (-17, 13),
}

# famous off-diagonal pairs (independent recall of the NCBI files)
OFFDIAG = [
    ("BLOSUM62", "W", "F", 1), ("BLOSUM62", "Y", "H", 2),
    ("BLOSUM62", "I", "L", 2), ("BLOSUM62", "R", "K", 2),
    ("BLOSUM62", "D", "E", 2), ("BLOSUM62", "S", "T", 1),
    ("BLOSUM62", "V", "I", 3), ("BLOSUM62", "Q", "E", 2),
    ("BLOSUM62", "N", "D", 1), ("BLOSUM62", "A", "S", 1),
    ("BLOSUM62", "F", "Y", 3), ("BLOSUM62", "M", "L", 2),
    ("BLOSUM62", "B", "D", 4), ("BLOSUM62", "Z", "E", 4),
    ("BLOSUM62", "X", "X", -1),
    ("BLOSUM50", "I", "L", 2), ("BLOSUM50", "F", "Y", 4),
    ("BLOSUM50", "R", "K", 3),
    ("BLOSUM45", "R", "K", 3),
    ("BLOSUM80", "I", "L", 1),
    ("BLOSUM90", "F", "Y", 3),
    ("PAM250", "F", "Y", 7), ("PAM250", "W", "R", 2),
    ("PAM250", "C", "W", -8),
    ("PAM70", "W", "R", 0),
    ("PAM30", "W", "R", -2),
]


def _v(mat, a, b):
    return int(mat[ALPHABET.index(a), ALPHABET.index(b)])


def test_every_shipped_matrix_is_covered():
    assert sorted(DIAG) == available_matrices()


@pytest.mark.parametrize("name", sorted(DIAG))
def test_diagonals_match_independent_transcription(name):
    mat = get_matrix(name)
    got = [_v(mat, a, a) for a in AA]
    assert got == DIAG[name], (
        f"{name} diagonal differs from the independent NCBI transcription "
        f"at {[a for a, g, e in zip(AA, got, DIAG[name]) if g != e]}")


@pytest.mark.parametrize("name", sorted(MINMAX))
def test_table_extremes(name):
    mat = get_matrix(name)
    assert (int(mat.min()), int(mat.max())) == MINMAX[name]


@pytest.mark.parametrize("name,a,b,expected", OFFDIAG)
def test_offdiagonal_spot_values(name, a, b, expected):
    mat = get_matrix(name)
    assert _v(mat, a, b) == expected
    assert _v(mat, b, a) == expected          # symmetry at the spot


@pytest.mark.parametrize("name", sorted(DIAG))
def test_stop_and_ambiguity_conventions(name):
    mat = get_matrix(name)
    lo = MINMAX[name][0]
    # the * sentinel scores the table minimum against everything real and
    # +1 against itself, in every NCBI file
    star = ALPHABET.index("*")
    assert int(mat[star, star]) == 1
    assert (mat[star, :star] == lo).all() and (mat[:star, star] == lo).all()
    # diagonals dominate their row over the 20 real residues (identity is
    # never beaten by a substitution in these files)
    sub = mat[:20, :20]
    assert (np.diag(sub) >= sub.max(axis=1)).all()
    assert (mat == mat.T).all()


@pytest.mark.parametrize("name", sorted(DIAG))
def test_golden_alignment_full_residue_sweep(name):
    # full-stack golden: a perfect 20-residue match (all amino acids once)
    # must score the hand-derived sum of this file's independent diagonal
    # values — exercises every diagonal cell through the real DP, with an
    # expected value that never touches get_matrix()
    from swimm_tpu.ops.reference import sw_score
    codes = encode(AA)
    expected = sum(DIAG[name])
    got = sw_score(codes, codes, get_matrix(name), 10, 2)
    assert got == expected, f"{name}: {got} != hand-derived {expected}"


def test_golden_alignment_with_substitution_blosum62():
    # K W K E  vs  K Y K E: 5 + S(W,Y) + 5 + 5 with S(W,Y)=2 — every pair
    # score positive, so no trimming/gapping can beat the direct alignment
    from swimm_tpu.ops.reference import sw_score
    got = sw_score(encode("KWKE"), encode("KYKE"),
                          get_matrix("BLOSUM62"), 10, 2)
    assert got == 5 + 2 + 5 + 5
