"""Adaptive-precision ladder invariant (SURVEY.md section 4.4):
ladder final scores must be IDENTICAL to an all-exact run, and saturated
lanes must actually escalate."""

import jax.numpy as jnp
import numpy as np

from swimm_tpu.alphabet import PAD_CODE
from swimm_tpu.models.profile import build_query_profile
from swimm_tpu.ops import xla_scorer
from swimm_tpu.ops.ladder import INT8_CEIL, score_chunk_adaptive
from swimm_tpu.utils.synth import mutate, random_codes


def _world(rng, with_homolog=True):
    q = random_codes(rng, 120)
    qp = jnp.asarray(build_query_profile(q))
    B, L, V = 3, 160, 8
    codes = np.full((B, L, V), PAD_CODE, dtype=np.int8)
    for k in range(B * V):
        b, v = divmod(k, V)
        if with_homolog and k in (2, 9):
            s = mutate(rng, q, sub_rate=0.02, indel_rate=0.0)  # score >> 127
        else:
            s = random_codes(rng, int(rng.integers(20, L)))
        codes[b, :min(len(s), L), v] = s[:L]
    return q, qp, codes


def test_ladder_equals_exact(rng):
    q, qp, codes = _world(rng)
    exact = np.asarray(xla_scorer.score_chunk(jnp.asarray(codes), qp, 10, 2))
    scores, stats = score_chunk_adaptive(codes, qp, 10, 2, backend="xla")
    np.testing.assert_array_equal(scores, exact)
    # homolog lanes saturate int8 tier -> at least one block escalated
    assert exact.max() > INT8_CEIL
    assert stats["tier_blocks"][1] >= 1


def test_ladder_no_saturation_short_circuits(rng):
    q, qp, codes = _world(rng, with_homolog=False)
    exact = np.asarray(xla_scorer.score_chunk(jnp.asarray(codes), qp, 10, 2))
    assert exact.max() < INT8_CEIL  # random seqs never reach 127
    scores, stats = score_chunk_adaptive(codes, qp, 10, 2, backend="xla")
    np.testing.assert_array_equal(scores, exact)
    assert stats["tier_blocks"][1] == 0  # nothing escalated


def test_narrow_tier_clamps_at_ceiling(rng):
    q, qp, codes = _world(rng)
    clamped = np.asarray(xla_scorer.score_chunk(jnp.asarray(codes), qp, 10, 2,
                                                ceiling=INT8_CEIL))
    exact = np.asarray(xla_scorer.score_chunk(jnp.asarray(codes), qp, 10, 2))
    assert clamped.max() == INT8_CEIL
    # unsaturated lanes are exact
    mask = exact < INT8_CEIL
    np.testing.assert_array_equal(clamped[mask], exact[mask])
    assert (clamped[~mask] == INT8_CEIL).all()


def test_length_bucketed_tier_truncation(rng):
    from swimm_tpu.ops.ladder import max_possible_score
    q, qp, codes = _world(rng)
    exact = np.asarray(xla_scorer.score_chunk(jnp.asarray(codes), qp, 10, 2))
    # bound below int8 ceiling -> single narrow pass, no recheck
    scores, stats = score_chunk_adaptive(codes, qp, 10, 2, backend="xla",
                                         upper_bound=100)
    assert stats["tier_ceilings"] == [INT8_CEIL]
    # (scores may clamp at 127 in this artificial case; the invariant only
    # holds when the bound is genuinely valid)
    # valid bound: min(L, m)*max_diag
    bound = max_possible_score(qp.shape[1], codes.shape[1])
    scores, stats = score_chunk_adaptive(codes, qp, 10, 2, backend="xla",
                                         upper_bound=bound)
    np.testing.assert_array_equal(scores, exact)
    # int16 ceiling covers the bound here, so the exact (None) tier is cut
    assert stats["tier_ceilings"][-1] == 32767


def test_max_possible_score():
    from swimm_tpu.ops.ladder import max_possible_score
    # BLOSUM62 best diagonal is W:W = 11
    assert max_possible_score(10, 100) == 110
    assert max_possible_score(100, 10) == 110


def test_score_db_adaptive_equals_exact(tmp_path):
    # whole-DB block-granular ladder (interpret mode): scores identical to
    # an exact pass; saturated blocks escalate, provably-narrow ones don't
    import jax.numpy as jnp

    from swimm_tpu.db import build_db
    from swimm_tpu.models.profile import build_query_profile
    from swimm_tpu.ops import ladder, pallas_scorer
    from swimm_tpu.utils.synth import synth_db, synth_queries

    queries = synth_queries(1, [48], seed=9)
    q = queries[0]
    recs = synth_db(150, seed=10, median_len=50, sigma=0.5, max_len=160,
                    queries=[q.codes], homolog_frac=0.08)
    packed = build_db(recs, tmp_path / "db", V=8)
    qp = jnp.asarray(build_query_profile(q.codes, m_multiple=8))
    scores, stats = ladder.score_db_adaptive(
        packed, qp, q.length, 10, 2, interpret=True)
    tiles, outrow, n_rows = packed.flat_tiles()
    exact = np.asarray(pallas_scorer.score_tiles(
        jnp.asarray(tiles), outrow, n_rows, qp, 10, 2, interpret=True))
    assert np.array_equal(scores, exact)
    # homologs force int8-tier saturation and a tier-2 recompute
    assert exact.max() > ladder.INT8_CEIL
    assert stats["tier_blocks"][1] >= 1


def test_score_db_adaptive_batch_equals_exact(tmp_path):
    # batched whole-DB ladder (VERDICT r1 #4): per-query scores identical
    # to per-query exact passes; union recompute escalates only flagged
    # blocks; queries that saturate nothing stay tier-1-only
    import jax.numpy as jnp

    from swimm_tpu.db import build_db
    from swimm_tpu.models.profile import build_query_profile
    from swimm_tpu.ops import ladder, xla_scorer
    from swimm_tpu.utils.synth import synth_db, synth_queries

    queries = synth_queries(3, [48, 48, 48], seed=21)
    recs = synth_db(120, seed=22, median_len=50, sigma=0.5, max_len=160,
                    queries=[queries[0].codes], homolog_frac=0.1)
    packed = build_db(recs, tmp_path / "db", V=8)
    qps = np.stack([build_query_profile(q.codes, m_multiple=8)
                    for q in queries])
    scores, stats = ladder.score_db_adaptive_batch(
        packed, qps, [q.length for q in queries], 10, 2, backend="xla")
    tiles, outrow, n_rows = packed.flat_tiles()
    saturated = False
    for i, q in enumerate(queries):
        exact = np.asarray(xla_scorer.score_tiles(
            jnp.asarray(tiles), outrow, n_rows,
            jnp.asarray(qps[i]), 10, 2))
        assert np.array_equal(scores[i], exact), f"query {i}"
        saturated = saturated or exact.max() > ladder.INT8_CEIL
    assert saturated                      # homologs of query 0 escalate
    assert stats["tier_blocks"][1] >= 1


def test_search_ladder_batch_equals_serial(tmp_path):
    # the serving entry: search(precision='ladder') now runs the batched
    # fused control flow and must rank exactly like precision='f32'
    from swimm_tpu.db import build_db
    from swimm_tpu.models.engine import SearchConfig, search
    from swimm_tpu.utils.synth import synth_db, synth_queries

    queries = synth_queries(4, [40, 64, 100, 30], seed=31)
    recs = synth_db(150, seed=32, median_len=60, sigma=0.4, max_len=200,
                    queries=[q.codes for q in queries], homolog_frac=0.08)
    packed = build_db(recs, tmp_path / "db", V=16)
    exact, _ = search(packed, queries,
                      SearchConfig(backend="xla", precision="f32", top_k=8))
    ladder_r, _ = search(packed, queries,
                         SearchConfig(backend="xla", precision="ladder",
                                      top_k=8))
    for r1, r2 in zip(exact, ladder_r):
        assert [(h.score, h.sorted_idx) for h in r1.hits] == \
               [(h.score, h.sorted_idx) for h in r2.hits]


def test_pallas_ceiling_reports_exactly_ceiling(rng):
    # r2 fuzz finding (benchmarks/fuzz_tpu.py): the pallas ceilinged pass
    # tracked PRE-clamp ht in Smax, so saturated lanes reported up to
    # ceiling + max_diag (e.g. 140 @ 127) — diverging from the xla
    # scorer. Saturated lanes must report EXACTLY the ceiling; unsaturated
    # lanes stay exact.
    from swimm_tpu.ops import pallas_scorer
    q, qp, codes = _world(rng)
    exact = np.asarray(xla_scorer.score_chunk(jnp.asarray(codes), qp, 10, 2))
    clamped = np.asarray(pallas_scorer.score_chunk(
        jnp.asarray(codes), qp, 10, 2, ceiling=INT8_CEIL, interpret=True))
    np.testing.assert_array_equal(clamped, np.minimum(exact, INT8_CEIL))
    # and via the ragged whole-DB kernel path too
    B, L, V = codes.shape
    tiles = codes.reshape(-1, 32, V) if L % 32 == 0 else None
    if tiles is not None:
        outrow = np.repeat(np.arange(B, dtype=np.int32), L // 32)
        ragged = np.asarray(pallas_scorer.score_tiles(
            jnp.asarray(tiles), jnp.asarray(outrow), B, qp, 10, 2,
            ceiling=INT8_CEIL, interpret=True))
        np.testing.assert_array_equal(ragged, np.minimum(exact, INT8_CEIL))
