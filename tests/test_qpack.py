"""Query packing (models/qpack.py) + segmented packed kernel.

The packed run must return EXACTLY the same scores as one run per query:
segment isolation (separator groups, segmented F carry, per-segment score
extraction) is the contract. CPU interpret mode; the compiled TPU path is
covered in tests_tpu/.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from swimm_tpu.matrices import get_matrix
from swimm_tpu.models.qpack import (N_SEG_CAP, PACK_BUCKETS, build_query_packs,
                                    _rows_needed)
from swimm_tpu.ops import pallas_scorer, reference
from swimm_tpu.utils.synth import mutate, random_codes


def _ragged_db(rng, lengths, V=8, jt=32):
    blocks = [rng.integers(0, 20, size=(L, V), dtype=np.int8)
              for L in lengths]
    tiles = np.concatenate([b.reshape(-1, jt, V) for b in blocks])
    outrow = np.concatenate(
        [[i] * (b.shape[0] // jt) for i, b in enumerate(blocks)]
    ).astype(np.int32)
    return blocks, tiles, outrow


def test_pack_layout():
    rng = np.random.default_rng(0)
    queries = [random_codes(rng, L) for L in (144, 17, 301, 8, 490)]
    packs = build_query_packs(queries)
    got = sorted(e.query_pos for p in packs for e in p.entries)
    assert got == [0, 1, 2, 3, 4]
    for p in packs:
        assert p.M in PACK_BUCKETS
        assert p.qp.shape == (32, p.M)
        assert (np.diff(p.seg_of_group) >= 0).all()   # nondecreasing ids
        for e in p.entries:
            assert e.row_start % 8 == 0 and e.n_rows % 8 == 0
            # separator group right after each query, own segment
            sepg = (e.row_start + e.n_rows) // 8
            assert p.seg_of_group[sepg] == e.seg + 1


def test_packed_scores_equal_per_query_runs():
    rng = np.random.default_rng(1)
    # q0 has a strong homolog planted (big scores right before q1's rows:
    # the adversarial case for F/diagonal leaks across segments)
    queries = [random_codes(rng, L) for L in (40, 16, 61, 24)]
    blocks, tiles, outrow = _ragged_db(rng, [64, 96])
    hom = mutate(rng, queries[0], sub_rate=0.02, indel_rate=0.0)
    blocks[0][:len(hom), 3] = hom
    tiles = np.concatenate([b.reshape(-1, 32, 8) for b in blocks])

    packs = build_query_packs(queries, buckets=(256,))
    assert len(packs) == 1
    p = packs[0]
    out = np.asarray(pallas_scorer.score_tiles_packed(
        jnp.asarray(tiles), outrow, len(blocks), jnp.asarray(p.qp),
        p.seg_of_group, 10, 2, interpret=True))
    db_seqs = [b[:, v] for b in blocks for v in range(b.shape[1])]
    sub = get_matrix("BLOSUM62")
    for e in p.entries:
        exp = reference.sw_score_many(
            queries[e.query_pos], db_seqs, sub, 10, 2
        ).reshape(len(blocks), -1)
        assert np.array_equal(out[:, e.seg // 2, :], exp), e.query_pos
    # unused query planes are all zero
    used = {e.seg // 2 for e in p.entries}
    for s in range(N_SEG_CAP // 2):
        if s not in used:
            assert (out[:, s, :] == 0).all()


@pytest.mark.parametrize("gaps", [(12, 1), (0, 4), (5, 0)])
def test_packed_gap_variants(gaps):
    rng = np.random.default_rng(2)
    queries = [random_codes(rng, L) for L in (33, 50)]
    blocks, tiles, outrow = _ragged_db(rng, [32, 64])
    p = build_query_packs(queries, buckets=(128,))[0]
    out = np.asarray(pallas_scorer.score_tiles_packed(
        jnp.asarray(tiles), outrow, len(blocks), jnp.asarray(p.qp),
        p.seg_of_group, *gaps, interpret=True))
    db_seqs = [b[:, v] for b in blocks for v in range(b.shape[1])]
    sub = get_matrix("BLOSUM62")
    for e in p.entries:
        exp = reference.sw_score_many(
            queries[e.query_pos], db_seqs, sub, *gaps
        ).reshape(len(blocks), -1)
        assert np.array_equal(out[:, e.seg // 2, :], exp)


def test_pack_rejects_overlong_query():
    rng = np.random.default_rng(3)
    with pytest.raises(ValueError):
        build_query_packs([random_codes(rng, PACK_BUCKETS[-1] + 1)])
    assert _rows_needed(PACK_BUCKETS[-1] - 8) == PACK_BUCKETS[-1]


def test_empty_query_list_no_packs():
    # r2 review: the balanced packer must not emit an all-separator pack
    # (a wasted whole-DB dispatch) for an empty batch
    assert build_query_packs([]) == []
