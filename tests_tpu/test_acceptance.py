"""BASELINE acceptance configs run end-to-end on real TPU hardware vs the
C reference path (exact ranked-hit-list equality — SURVEY.md section 5,
implication 5).

Config 2/3/4/5 counterparts live in test_tpu_parity.py (fused vs ladder,
long query, sharded mesh) and benchmarks/; this file holds the config-1
acceptance run at its stated scale: a ~144-aa query vs a 10k-sequence DB,
BLOSUM62 10/2, every score checked against the C oracle.
"""

import tempfile

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="needs TPU hardware")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def test_config1_144aa_vs_10k_db_exact_vs_c_path():
    from swimm_tpu.db import build_db
    from swimm_tpu.matrices import get_matrix
    from swimm_tpu.models.engine import SearchConfig, score_db, search
    from swimm_tpu.ops import cref
    from swimm_tpu.utils.synth import synth_db, synth_queries

    queries = synth_queries(1, [144], seed=21)
    q = queries[0]
    recs = synth_db(10_000, seed=22, queries=[q.codes], homolog_frac=0.002)
    with tempfile.TemporaryDirectory() as td:
        packed = build_db(recs, td, V=128)
        cfg = SearchConfig(top_k=16, backend="pallas", precision="f32")

        # every score, not just the top-k
        got = score_db(packed, q, cfg)
        exp_sorted = cref.sw_score_many(
            q.codes, [recs[i].codes for i in packed.orig_index],
            get_matrix("BLOSUM62"), 10, 2)
        assert np.array_equal(got, exp_sorted), (
            f"{(got != exp_sorted).sum()} score mismatches")

        # ranked hit list through the full serving path (packed by default)
        results, met = search(packed, queries, SearchConfig(top_k=16))
        order = np.lexsort((np.arange(len(exp_sorted)), -exp_sorted))[:16]
        assert [h.sorted_idx for h in results[0].hits] == [int(i) for i in order]
        assert [h.score for h in results[0].hits] == \
            [int(exp_sorted[i]) for i in order]
        assert results[0].hits[0].score > 100  # planted homolog on top
        assert met.gcups > 0
