"""Multi-device sharding tests on the 8-device virtual CPU mesh
(SURVEY.md section 5, implication 4)."""

import numpy as np
import pytest

from swimm_tpu.db import build_db
from swimm_tpu.models.engine import SearchConfig, search
from swimm_tpu.parallel.mesh import balanced_2d, make_mesh
from swimm_tpu.parallel.sharded_search import sharded_search
from swimm_tpu.utils.synth import synth_db, synth_queries


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    queries = synth_queries(4, [40, 64, 100, 30], seed=5)
    recs = synth_db(200, seed=11, median_len=60, sigma=0.4, max_len=200,
                    queries=[q.codes for q in queries], homolog_frac=0.05)
    td = tmp_path_factory.mktemp("db")
    packed = build_db(recs, td, V=16)
    cfg = SearchConfig(backend="xla", top_k=8)
    serial, _ = search(packed, queries, cfg)
    return packed, queries, cfg, serial


def test_balanced_2d():
    assert balanced_2d(8) == (4, 2)
    assert balanced_2d(16) == (4, 4)
    assert balanced_2d(7) == (7, 1)
    assert balanced_2d(1) == (1, 1)


@pytest.mark.parametrize("query_axis", [1, 2, 4])
def test_sharded_matches_serial(world, query_axis):
    packed, queries, cfg, serial = world
    mesh = make_mesh(8, query_axis=query_axis)
    shard, metrics = sharded_search(packed, queries, cfg, mesh=mesh)
    for r1, r2 in zip(serial, shard):
        h1 = [(h.score, h.sorted_idx) for h in r1.hits]
        h2 = [(h.score, h.sorted_idx) for h in r2.hits]
        assert h1 == h2, (r1.query_title, h1, h2)
    assert metrics.n_queries == len(queries)
    assert metrics.gcups > 0


def test_single_device_mesh(world):
    packed, queries, cfg, serial = world
    mesh = make_mesh(1)
    shard, _ = sharded_search(packed, queries, cfg, mesh=mesh)
    for r1, r2 in zip(serial, shard):
        assert [(h.score, h.sorted_idx) for h in r1.hits] == \
               [(h.score, h.sorted_idx) for h in r2.hits]


def test_uneven_blocks_padding(world):
    # a chunk whose block count doesn't divide the data axis must pad
    packed, queries, cfg, serial = world
    mesh = make_mesh(8, query_axis=1)  # data axis 8; chunks have few blocks
    shard, _ = sharded_search(packed, queries, cfg, mesh=mesh)
    assert [(h.score, h.sorted_idx) for h in shard[0].hits] == \
           [(h.score, h.sorted_idx) for h in serial[0].hits]


def test_global_tile_shards_matches_local(world):
    # multi-host assembly path (make_array_from_callback) must produce the
    # same globally-sharded arrays + identical search results
    from swimm_tpu.parallel.distributed import global_tile_shards
    from swimm_tpu.parallel.sharded_search import (build_tile_shards,
                                                   plan_tile_shards,
                                                   sharded_tiles_topk)
    packed, queries, cfg, serial = world
    mesh = make_mesh(4, query_axis=1)
    loc = build_tile_shards(packed, mesh)
    glo = global_tile_shards(packed, mesh)
    assert loc[4] == glo[4]
    for a, b in zip(loc[:4], glo[:4]):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    # plan: every real tile appears exactly once across shards
    shapes, build = plan_tile_shards(packed, 4)
    total_real = sum(int((build(d)[1] != shapes["R_loc"] - 1).sum())
                     for d in range(4))
    assert total_real == packed.flat_tiles()[0].shape[0]


def test_split_score_merge_matches_fused(world):
    # the split two-dispatch form (local top-k, then the merge collective
    # as its own timed dispatch) must rank identically to the fused form
    # and must report the merge latency (BASELINE north-star metric #3)
    packed, queries, cfg, serial = world
    mesh = make_mesh(8, query_axis=2)
    shard, metrics = sharded_search(packed, queries, cfg, mesh=mesh,
                                    measure_merge=True)
    for r1, r2 in zip(serial, shard):
        assert [(h.score, h.sorted_idx) for h in r1.hits] == \
               [(h.score, h.sorted_idx) for h in r2.hits]
    assert "merge" in metrics.timers and "score" in metrics.timers
    assert metrics.timers["merge"] > 0


def test_sharded_empty_query_batch(world):
    packed, _queries, cfg, _serial = world
    mesh = make_mesh(4)
    results, metrics = sharded_search(packed, [], cfg, mesh=mesh)
    assert results == [] and metrics.n_queries == 0


def test_sharded_randomized_worlds():
    # randomized differential sweep: random DB sizes (incl. fewer blocks
    # than data shards), V widths, batch mixes, mesh shapes — sharded must
    # rank exactly like the serial driver in every draw
    import tempfile

    rng = np.random.default_rng(99)
    for trial in range(4):
        n_seqs = int(rng.integers(10, 400))
        V = int(rng.choice([8, 16, 32]))
        nq = int(rng.integers(1, 6))
        qlens = [int(rng.integers(5, 200)) for _ in range(nq)]
        queries = synth_queries(nq, qlens, seed=200 + trial)
        recs = synth_db(n_seqs, seed=300 + trial, median_len=60, sigma=0.6,
                        max_len=300, queries=[q.codes for q in queries],
                        homolog_frac=0.05)
        with tempfile.TemporaryDirectory() as td:
            packed = build_db(recs, td, V=V)
            cfg = SearchConfig(backend="xla", top_k=8)
            serial, _ = search(packed, queries, cfg)
            qa = int(rng.choice([1, 2, 4]))
            mesh = make_mesh(8, query_axis=qa)
            shard, _ = sharded_search(packed, queries, cfg, mesh=mesh)
            for a, b in zip(serial, shard):
                assert [(h.score, h.sorted_idx) for h in a.hits] == \
                       [(h.score, h.sorted_idx) for h in b.hits], \
                    (trial, n_seqs, V, qlens, qa)
