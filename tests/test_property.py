"""Randomized property sweep: every scorer path vs the NumPy oracle.

Random (matrix, gap params, query length, ragged db length mix, packing)
combinations — the parity traps of SURVEY.md section 8 (gap-open
convention, ambiguity rows, padding off-by-ones, segment boundaries) all
fall out of these if anything regresses. CPU interpret mode; compiled-TPU
parity is covered by tests_tpu/.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from swimm_tpu.matrices import get_matrix
from swimm_tpu.models.profile import build_query_profile
from swimm_tpu.models.qpack import build_query_packs
from swimm_tpu.ops import longquery, pallas_scorer, reference, xla_scorer
from swimm_tpu.utils.synth import mutate, random_codes

CASES = [0, 2, 4]  # diverse matrices/gaps; full sweep is slow in interpret mode


def _world(seed):
    rng = np.random.default_rng(1000 + seed)
    matrix = str(rng.choice(["BLOSUM62", "BLOSUM45", "BLOSUM90", "PAM70"]))
    go = int(rng.integers(0, 16))
    ge = int(rng.integers(0, 5)) if go else int(rng.integers(1, 5))
    n_blocks = int(rng.integers(1, 4))
    lengths = [int(rng.integers(1, 5)) * 32 for _ in range(n_blocks)]
    V, jt = 8, 32
    blocks = [rng.integers(0, 24, size=(L, V), dtype=np.int8)
              for L in lengths]
    q = random_codes(rng, int(rng.integers(3, 60)))
    # plant a homolog so scores aren't all near zero
    b, v = int(rng.integers(0, n_blocks)), int(rng.integers(0, V))
    hom = mutate(rng, q, sub_rate=0.1, indel_rate=0.05)[:lengths[b]]
    blocks[b][:len(hom), v] = hom
    tiles = np.concatenate([x.reshape(-1, jt, V) for x in blocks])
    outrow = np.concatenate(
        [[i] * (x.shape[0] // jt) for i, x in enumerate(blocks)]
    ).astype(np.int32)
    db_seqs = [x[:, lane] for x in blocks for lane in range(V)]
    exp = reference.sw_score_many(q, db_seqs, get_matrix(matrix), go, ge
                                  ).reshape(n_blocks, V)
    return rng, matrix, go, ge, q, blocks, tiles, outrow, exp


@pytest.mark.parametrize("seed", CASES)
def test_ragged_paths_random(seed):
    rng, matrix, go, ge, q, blocks, tiles, outrow, exp = _world(seed)
    qp = jnp.asarray(build_query_profile(q, matrix, m_multiple=8))
    got = np.asarray(pallas_scorer.score_tiles(
        jnp.asarray(tiles), outrow, len(blocks), qp, go, ge,
        interpret=True))
    assert np.array_equal(got, exp), (matrix, go, ge, len(q))
    # xla ragged counterpart
    got_x = np.asarray(xla_scorer.score_tiles(
        jnp.asarray(tiles), jnp.asarray(outrow), len(blocks), qp, go, ge))
    assert np.array_equal(got_x, exp)
    # ragged long-query tiling with a tiny tile_m (stresses carries)
    got_l = np.asarray(longquery.score_tiles_long(
        jnp.asarray(tiles), outrow, len(blocks), qp, go, ge, tile_m=16,
        interpret=True))
    assert np.array_equal(got_l, exp)


@pytest.mark.parametrize("seed", [1, 4])
def test_packed_random(seed):
    rng, matrix, go, ge, q, blocks, tiles, outrow, exp = _world(seed)
    extra = [random_codes(rng, int(rng.integers(1, 60))) for _ in range(3)]
    queries = [q] + extra
    packs = build_query_packs(queries, matrix, buckets=(512,))
    assert len(packs) == 1
    p = packs[0]
    out = np.asarray(pallas_scorer.score_tiles_packed(
        jnp.asarray(tiles), outrow, len(blocks), jnp.asarray(p.qp),
        p.seg_of_group, go, ge, interpret=True))
    db_seqs = [x[:, lane] for x in blocks for lane in range(blocks[0].shape[1])]
    for e in p.entries:
        want = reference.sw_score_many(
            queries[e.query_pos], db_seqs, get_matrix(matrix), go, ge
        ).reshape(len(blocks), -1)
        assert np.array_equal(out[:, e.seg // 2, :], want), \
            (matrix, go, ge, e.query_pos)
