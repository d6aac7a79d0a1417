"""Traceback extension (VERDICT r1 #10): the recovered alignment must score
exactly the DP optimum (self-checked in sw_align) and match the oracle."""

import numpy as np
import pytest

from swimm_tpu.matrices import get_matrix
from swimm_tpu.ops import reference
from swimm_tpu.ops.traceback import sw_align
from swimm_tpu.utils.synth import mutate, random_codes


def test_align_score_matches_oracle(rng):
    m62 = get_matrix("BLOSUM62")
    for _ in range(20):
        q = random_codes(rng, int(rng.integers(10, 80)))
        d = random_codes(rng, int(rng.integers(10, 120)))
        a = sw_align(q, d)
        assert a.score == reference.sw_score(q, d, m62, 10, 2)


def test_align_homolog_structure(rng):
    q = random_codes(rng, 120)
    d = mutate(rng, q, sub_rate=0.1, indel_rate=0.03)
    a = sw_align(q, d)
    assert a.score == reference.sw_score(q, d, get_matrix("BLOSUM62"),
                                         10, 2)
    assert a.n_identity / a.length > 0.6      # homolog: mostly identities
    assert len(a.q_aln) == len(a.d_aln) == len(a.midline)
    # aligned residue counts match the coordinate ranges
    assert a.q_end - a.q_start == a.length - a.q_aln.count("-")
    assert a.d_end - a.d_start == a.length - a.d_aln.count("-")
    assert "-" not in (a.q_aln[0], a.q_aln[-1], a.d_aln[0], a.d_aln[-1])


def test_align_gap_conventions(rng):
    # the first gap residue costs open+extend (ops/reference.py contract):
    # identical flanks with a deletion in between
    m62 = get_matrix("BLOSUM62")
    q = random_codes(rng, 40)
    d = np.concatenate([q[:20], q[28:]])      # 8-residue deletion
    a = sw_align(q, d)
    assert a.score == reference.sw_score(q, d, m62, 10, 2)
    assert a.n_gaps >= 1


def test_align_pretty_renders(rng):
    q = random_codes(rng, 80)
    d = mutate(rng, q, sub_rate=0.2, indel_rate=0.02)
    a = sw_align(q, d)
    s = a.pretty(width=40)
    assert "Score =" in s and "Query" in s and "Sbjct" in s


def test_cli_align_flag(tmp_path):
    from swimm_tpu.cli import main
    from swimm_tpu.db import build_db
    from swimm_tpu.fasta import write_fasta
    from swimm_tpu.utils.synth import synth_db, synth_queries

    queries = synth_queries(1, [60], seed=51)
    recs = synth_db(60, seed=52, median_len=60, sigma=0.3, max_len=120,
                    queries=[queries[0].codes], homolog_frac=0.1)
    write_fasta(tmp_path / "db.fasta", recs)
    write_fasta(tmp_path / "q.fasta", queries)
    build_db(tmp_path / "db.fasta", tmp_path / "db", V=8)
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["search", "-d", str(tmp_path / "db"),
                   "-q", str(tmp_path / "q.fasta"),
                   "--backend", "xla", "-r", "3", "--align"])
    assert rc == 0
    out = buf.getvalue()
    assert "Score =" in out and "Sbjct" in out
