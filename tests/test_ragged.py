"""Ragged whole-DB tile-stream kernel (ops/pallas_scorer.score_tiles).

One kernel dispatch scores every block of every chunk — heterogeneous
lengths ride a flat tile grid with scalar-prefetched block boundaries.
Exactness vs the CPU oracle is the contract (interpret mode on CPU;
tests_tpu/test_tpu_parity.py covers the compiled TPU path).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from swimm_tpu.db import build_db
from swimm_tpu.matrices import get_matrix
from swimm_tpu.models.profile import build_query_profile
from swimm_tpu.ops import pallas_scorer, reference
from swimm_tpu.utils.synth import random_codes, synth_db


def _ragged_case(rng, lengths, V=8, jt=32):
    blocks = [rng.integers(0, 20, size=(L, V), dtype=np.int8)
              for L in lengths]
    tiles = np.concatenate([b.reshape(-1, jt, V) for b in blocks])
    outrow = np.concatenate(
        [[i] * (b.shape[0] // jt) for i, b in enumerate(blocks)]
    ).astype(np.int32)
    return blocks, tiles, outrow


def test_score_tiles_matches_oracle_mixed_lengths():
    rng = np.random.default_rng(11)
    q = random_codes(rng, 53)
    qp = jnp.asarray(build_query_profile(q, "BLOSUM62", m_multiple=8))
    blocks, tiles, outrow = _ragged_case(rng, [32, 96, 32, 160, 64])
    got = np.asarray(pallas_scorer.score_tiles(
        jnp.asarray(tiles), outrow, len(blocks), qp, 10, 2, interpret=True))
    db_seqs = [b[:, v] for b in blocks for v in range(b.shape[1])]
    exp = reference.sw_score_many(q, db_seqs, get_matrix("BLOSUM62"), 10, 2)
    assert np.array_equal(got.reshape(-1), exp)


def test_score_tiles_single_block_and_ceiling():
    rng = np.random.default_rng(12)
    q = random_codes(rng, 24)
    qp = jnp.asarray(build_query_profile(q, "BLOSUM62", m_multiple=8))
    blocks, tiles, outrow = _ragged_case(rng, [64])
    exact = np.asarray(pallas_scorer.score_tiles(
        jnp.asarray(tiles), outrow, 1, qp, 10, 2, interpret=True))
    capped = np.asarray(pallas_scorer.score_tiles(
        jnp.asarray(tiles), outrow, 1, qp, 10, 2, interpret=True,
        ceiling=10))
    # sub-ceiling lanes exact, others flagged at >= ceiling
    low = exact.reshape(-1) < 10
    assert np.array_equal(capped.reshape(-1)[low], exact.reshape(-1)[low])
    assert (capped.reshape(-1)[~low] >= 10).all()


def test_flat_tiles_roundtrip(tmp_path):
    recs = synth_db(700, seed=5)
    packed = build_db(recs, tmp_path / "db", V=8)
    tiles, outrow, n_rows = packed.flat_tiles()
    assert n_rows == sum(ch.n_blocks for ch in packed.chunks)
    assert tiles.shape[0] == outrow.shape[0]
    assert (np.diff(outrow) >= 0).all()
    # tile stream reassembles to the original chunk codes
    pos = 0
    row = 0
    for ch in packed.chunks:
        nt = ch.n_blocks * ch.L // 32
        part = tiles[pos:pos + nt].reshape(ch.n_blocks, ch.L, ch.V)
        assert np.array_equal(part, np.asarray(ch.codes))
        assert (outrow[pos:pos + nt]
                == np.repeat(np.arange(row, row + ch.n_blocks), ch.L // 32)).all()
        pos += nt
        row += ch.n_blocks
    assert pos == tiles.shape[0]
    # per-block upper-bound helper: ascending lengths, last lane is max
    bml = packed.block_max_lengths()
    assert bml.shape == (n_rows,)
    assert (np.diff(bml) >= 0).all()
    assert bml.max() == int(packed.lengths.max())


def test_score_tiles_long_matches_oracle():
    # ragged long-query path: whole-DB tile stream + query tiling with
    # HBM-carried boundary state between query tiles
    from swimm_tpu.ops import longquery
    from swimm_tpu.utils.synth import mutate

    rng = np.random.default_rng(13)
    q = random_codes(rng, 150)          # tile_m=32 -> 5 query tiles
    qp = jnp.asarray(build_query_profile(q, "BLOSUM62", m_multiple=8))
    blocks, tiles, outrow = _ragged_case(rng, [64, 128, 32])
    hom = mutate(rng, q, sub_rate=0.05, indel_rate=0.01)[:128]
    blocks[1][:len(hom), 2] = hom
    tiles = np.concatenate([b.reshape(-1, 32, 8) for b in blocks])
    got = np.asarray(longquery.score_tiles_long(
        jnp.asarray(tiles), outrow, len(blocks), qp, 10, 2, tile_m=32,
        interpret=True))
    db_seqs = [b[:, v] for b in blocks for v in range(b.shape[1])]
    exp = reference.sw_score_many(q, db_seqs, get_matrix("BLOSUM62"),
                                  10, 2).reshape(len(blocks), -1)
    assert np.array_equal(got, exp)
    assert got[1, 2] > 100              # planted homolog
