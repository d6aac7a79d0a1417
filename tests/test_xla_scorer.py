"""Kernel parity: XLA scan scorer vs CPU oracles (SURVEY.md section 5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from swimm_tpu.alphabet import PAD_CODE
from swimm_tpu.db import build_db
from swimm_tpu.matrices import get_matrix
from swimm_tpu.models.profile import build_query_profile
from swimm_tpu.ops import cref, reference, xla_scorer
from swimm_tpu.utils.synth import random_codes, synth_db, synth_queries


def _pack(rng, n_seqs, V, L, min_len=5):
    codes = np.full((1, L, V), PAD_CODE, dtype=np.int8)
    seqs = []
    for v in range(n_seqs):
        s = random_codes(rng, int(rng.integers(min_len, L + 1)))
        codes[0, :len(s), v] = s
        seqs.append(s)
    return codes, seqs


@pytest.mark.parametrize("gaps", [(10, 2), (12, 1), (0, 4)])
def test_score_chunk_matches_oracle(rng, gaps):
    go, ge = gaps
    m = get_matrix("BLOSUM62")
    q = random_codes(rng, 44)
    qp = jnp.asarray(build_query_profile(q))
    codes, seqs = _pack(rng, 14, V=16, L=96)
    got = np.asarray(xla_scorer.score_chunk(jnp.asarray(codes), qp, go, ge))
    exp = reference.sw_score_many(q, seqs, m, go, ge)
    np.testing.assert_array_equal(got.reshape(-1)[:14], exp)
    # pad lanes score exactly 0
    assert (got.reshape(-1)[14:] == 0).all()


def test_multi_block_chunk(rng):
    m = get_matrix("BLOSUM62")
    q = random_codes(rng, 30)
    qp = jnp.asarray(build_query_profile(q))
    B, V, L = 3, 8, 64
    codes = np.full((B, L, V), PAD_CODE, dtype=np.int8)
    seqs = []
    for k in range(B * V):
        s = random_codes(rng, int(rng.integers(4, L + 1)))
        b, v = divmod(k, V)
        codes[b, :len(s), v] = s
        seqs.append(s)
    got = np.asarray(xla_scorer.score_chunk(jnp.asarray(codes), qp, 10, 2))
    exp = reference.sw_score_many(q, seqs, m, 10, 2)
    np.testing.assert_array_equal(got.reshape(-1), exp)


def test_high_identity_pair(rng):
    # planted homolog: high scores exercise deep H/E/F chains and the gap
    # machinery (overflow-territory scores come in the ladder tests)
    from swimm_tpu.utils.synth import mutate
    m = get_matrix("BLOSUM62")
    q = random_codes(rng, 120)
    hom = mutate(rng, q, sub_rate=0.05, indel_rate=0.03)
    codes = np.full((1, 160, 8), PAD_CODE, dtype=np.int8)
    codes[0, :len(hom), 0] = hom
    codes[0, :len(q), 1] = q
    qp = jnp.asarray(build_query_profile(q))
    got = np.asarray(xla_scorer.score_chunk(jnp.asarray(codes), qp, 10, 2))
    assert got[0, 0] == reference.sw_score(q, hom, m, 10, 2)
    assert got[0, 1] == reference.sw_score(q, q, m, 10, 2)


def test_gap_heavy_case_forces_f_chain(rng):
    # Long query vs short db seq forces deletions (F chains) to matter;
    # also tests queries longer than db sequences.
    m = get_matrix("BLOSUM62")
    q = random_codes(rng, 90)
    s = np.concatenate([q[:20], q[50:80]])  # query with a 30-residue deletion
    codes = np.full((1, 64, 8), PAD_CODE, dtype=np.int8)
    codes[0, :len(s), 0] = s
    qp = jnp.asarray(build_query_profile(q))
    for go, ge in [(10, 2), (5, 1), (2, 1)]:
        got = np.asarray(xla_scorer.score_chunk(jnp.asarray(codes), qp, go, ge))
        assert got[0, 0] == reference.sw_score(q, s, m, go, ge), (go, ge)


def test_score_packed_db_end_to_end(rng):
    recs = synth_db(60, seed=7, median_len=50, sigma=0.4, max_len=200)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        packed = build_db(recs, td, V=16)
        q = synth_queries(1, [35], seed=9)[0]
        scores = xla_scorer.score_packed_db(packed, q.codes, "BLOSUM62", 10, 2)
        m = get_matrix("BLOSUM62")
        exp = cref.sw_score_many(
            q.codes, [recs[i].codes for i in packed.orig_index], m, 10, 2)
        np.testing.assert_array_equal(scores, exp)
