"""TPU-hardware parity suite (run on a machine with a real TPU chip):

    python -m pytest tests_tpu/ -x -q

Kept out of tests/ because (a) the CPU suite forces the cpu platform and
(b) Pallas interpret mode is impractically slow for these kernels. This
suite is the hardware half of the kernel-parity strategy (SURVEY.md
section 5, implication 3).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from swimm_tpu.alphabet import PAD_CODE
from swimm_tpu.matrices import get_matrix
from swimm_tpu.models.profile import build_query_profile
from swimm_tpu.ops import cref, ladder, longquery, pallas_scorer
from swimm_tpu.utils.synth import mutate, random_codes

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="needs TPU hardware")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

RNG = np.random.default_rng(7)
M62 = get_matrix("BLOSUM62")


def _pack(rng, B, L, V, qcodes=None, homolog_lane=None):
    codes = np.full((B, L, V), PAD_CODE, dtype=np.int8)
    seqs = []
    for k in range(B * V):
        b, v = divmod(k, V)
        if homolog_lane is not None and k == homolog_lane:
            s = mutate(rng, qcodes, sub_rate=0.05, indel_rate=0.01)[:L]
        else:
            s = random_codes(rng, int(rng.integers(10, L + 1)))
        codes[b, :len(s), v] = s
        seqs.append(s)
    return codes, seqs


@pytest.mark.parametrize("gaps", [(10, 2), (12, 1), (0, 4)])
@pytest.mark.parametrize("precision", ["f32", "int32"])
def test_pallas_matches_c_oracle(gaps, precision):
    q = random_codes(RNG, 144)
    qp = jnp.asarray(build_query_profile(q))
    codes, seqs = _pack(RNG, 2, 256, 128, q, homolog_lane=5)
    got = np.asarray(pallas_scorer.score_chunk(
        jnp.asarray(codes), qp, *gaps, precision=precision))
    exp = cref.sw_score_many(q, seqs, M62, *gaps)
    np.testing.assert_array_equal(got.reshape(-1), exp)


def test_longquery_tiled_matches_c_oracle():
    q = random_codes(RNG, 200)
    qp = jnp.asarray(build_query_profile(q, m_multiple=8))
    codes, seqs = _pack(RNG, 2, 128, 128, q, homolog_lane=9)
    got = np.asarray(longquery.score_chunk_long(
        jnp.asarray(codes), qp, 10, 2, tile_m=64))     # 25 tiny tiles
    exp = cref.sw_score_many(q, seqs, M62, 10, 2)
    np.testing.assert_array_equal(got.reshape(-1), exp)


def test_longquery_5k_titin_stress():
    # BASELINE config 3
    q = random_codes(RNG, 5478)
    qp = jnp.asarray(build_query_profile(q))
    codes, seqs = _pack(RNG, 1, 512, 128, q, homolog_lane=7)
    got = np.asarray(longquery.score_chunk_long(
        jnp.asarray(codes), qp, 10, 2))
    spot = [0, 7, 60]
    exp = cref.sw_score_many(q, [seqs[i] for i in spot], M62, 10, 2)
    np.testing.assert_array_equal(got.reshape(-1)[spot], exp)
    assert got.reshape(-1)[7] > 1000  # the homolog must score high


def test_ladder_pallas_equals_exact():
    q = random_codes(RNG, 144)
    qp = jnp.asarray(build_query_profile(q))
    codes, _ = _pack(RNG, 2, 256, 128, q, homolog_lane=3)
    exact = np.asarray(pallas_scorer.score_chunk(
        jnp.asarray(codes), qp, 10, 2))
    scores, stats = ladder.score_chunk_adaptive(codes, qp, 10, 2,
                                                backend="pallas")
    np.testing.assert_array_equal(scores, exact)
    assert exact.max() > ladder.INT8_CEIL  # homolog saturates tier 1
    assert stats["tier_blocks"][1] >= 1


def test_ragged_tiles_matches_c_oracle():
    # mixed block lengths through ONE ragged kernel dispatch
    q = random_codes(RNG, 144)
    qp = jnp.asarray(build_query_profile(q, m_multiple=16))
    blocks, seqs = [], []
    for L in (96, 256, 96, 512, 32):
        codes, s = _pack(RNG, 1, L, 128, q, homolog_lane=4)
        blocks.append(codes[0])
        seqs.extend(s)
    tiles = np.concatenate([b.reshape(-1, 32, 128) for b in blocks])
    outrow = np.concatenate(
        [[i] * (b.shape[0] // 32) for i, b in enumerate(blocks)]
    ).astype(np.int32)
    got = np.asarray(pallas_scorer.score_tiles(
        jnp.asarray(tiles), outrow, len(blocks), qp, 10, 2))
    exp = cref.sw_score_many(q, seqs, M62, 10, 2)
    np.testing.assert_array_equal(got.reshape(-1), exp)


def test_fused_tiles_search_equals_ladder_serial():
    import tempfile

    from swimm_tpu.db import build_db
    from swimm_tpu.models.engine import SearchConfig, search
    from swimm_tpu.utils.synth import synth_db, synth_queries

    queries = synth_queries(3, [60, 144, 300], seed=6)
    recs = synth_db(800, seed=13, median_len=130, sigma=0.5, max_len=700,
                    queries=[q.codes for q in queries], homolog_frac=0.03)
    with tempfile.TemporaryDirectory() as td:
        packed = build_db(recs, td, V=128)
        fast, _ = search(packed, queries,
                         SearchConfig(backend="pallas", precision="adaptive",
                                      top_k=10))
        slow, _ = search(packed, queries,
                         SearchConfig(backend="pallas", precision="ladder",
                                      top_k=10))
        for r1, r2 in zip(fast, slow):
            assert [(h.score, h.sorted_idx) for h in r1.hits] == \
                   [(h.score, h.sorted_idx) for h in r2.hits]


def test_packed_large_batch_vs_serial():
    # 12 queries of widely mixed lengths through the packed serving path
    # (multiple packs, many segments) vs the exact serial driver
    import tempfile

    from swimm_tpu.db import build_db
    from swimm_tpu.models.engine import (SearchConfig, score_db,
                                         search, top_k_hits)
    from swimm_tpu.utils.synth import synth_db, synth_queries

    lens = [9, 24, 61, 88, 144, 200, 256, 301, 388, 450, 512, 700]
    queries = synth_queries(12, lens, seed=17)
    recs = synth_db(1000, seed=18, median_len=150, sigma=0.6, max_len=900,
                    queries=[q.codes for q in queries], homolog_frac=0.02)
    with tempfile.TemporaryDirectory() as td:
        packed = build_db(recs, td, V=128)
        fast, _ = search(packed, queries,
                         SearchConfig(top_k=8, precision="adaptive"))
        cfg = SearchConfig(top_k=8, precision="f32")
        for q, res in zip(queries, fast):
            exp = top_k_hits(packed, score_db(packed, q, cfg), 8)
            assert [(h.score, h.sorted_idx) for h in res.hits] == \
                   [(h.score, h.sorted_idx) for h in exp], q.title


def test_sharded_search_on_tpu_mesh():
    import tempfile

    from swimm_tpu.db import build_db
    from swimm_tpu.models.engine import SearchConfig, search
    from swimm_tpu.parallel.mesh import make_mesh
    from swimm_tpu.parallel.sharded_search import sharded_search
    from swimm_tpu.utils.synth import synth_db, synth_queries

    queries = synth_queries(2, [60, 144], seed=5)
    recs = synth_db(600, seed=11, median_len=120, sigma=0.4, max_len=400,
                    queries=[q.codes for q in queries], homolog_frac=0.03)
    with tempfile.TemporaryDirectory() as td:
        packed = build_db(recs, td, V=128)
        cfg = SearchConfig(backend="pallas", precision="f32", top_k=10)
        serial, _ = search(packed, queries, cfg)
        mesh = make_mesh()  # all local devices (1 chip here)
        shard, _ = sharded_search(packed, queries, cfg, mesh=mesh)
        for r1, r2 in zip(serial, shard):
            assert [(h.score, h.sorted_idx) for h in r1.hits] == \
                   [(h.score, h.sorted_idx) for h in r2.hits]
