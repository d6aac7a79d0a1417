"""Sharded x streaming posture combination (round 3).

The reference's hybrid mode composes streaming with multi-device execution
(SURVEY.md section 4.3); parallel/sharded_stream.py implements the TPU
analog. Exactness bar: hit lists bit-identical to the resident fused path
in score, index, and order, on every mesh shape.
"""

import numpy as np
import pytest

from swimm_tpu.db import build_db
from swimm_tpu.models.engine import SearchConfig, search
from swimm_tpu.parallel.mesh import make_mesh
from swimm_tpu.parallel.sharded_stream import search_streaming_sharded
from swimm_tpu.utils.synth import synth_db, synth_queries


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    queries = synth_queries(5, [24, 40, 40, 64, 100], seed=81)
    recs = synth_db(300, seed=82, median_len=60, sigma=0.5, max_len=220,
                    queries=[q.codes for q in queries], homolog_frac=0.06)
    packed = build_db(recs, tmp_path_factory.mktemp("db"), V=8)
    return recs, queries, packed


def _key(results):
    return [[(h.score, h.sorted_idx) for h in r.hits] for r in results]


@pytest.mark.parametrize("n_dev,query_axis", [(1, 1), (4, 1), (8, 1),
                                              (8, 2)])
def test_sharded_stream_equals_resident(world, n_dev, query_axis):
    _, queries, packed = world
    cfg = SearchConfig(top_k=10, backend="xla")
    ref, _ = search(packed, queries, cfg)

    scfg = SearchConfig(top_k=10, backend="xla", db_stream=True,
                        window_tiles=64, max_in_flight=3)
    mesh = make_mesh(n_dev, query_axis=query_axis)
    got, met = search_streaming_sharded(packed, queries, scfg, mesh=mesh)
    assert _key(got) == _key(ref)
    assert met.timers.get("stream", 0) > 0


def test_sharded_stream_window_sweep(world):
    # window size changes the span plan but never the hit lists; also
    # covers n_spans not divisible by n_data (all-PAD tail spans)
    _, queries, packed = world
    cfg = SearchConfig(top_k=10, backend="xla")
    ref = _key(search(packed, queries, cfg)[0])
    mesh = make_mesh(4)
    for wt in (32, 128, 4096):
        scfg = SearchConfig(top_k=10, backend="xla", db_stream=True,
                            window_tiles=wt)
        got, _ = search_streaming_sharded(packed, queries, scfg, mesh=mesh)
        assert _key(got) == ref, f"window_tiles={wt}"


def test_sharded_stream_ladder_rejected(world):
    _, queries, packed = world
    scfg = SearchConfig(top_k=10, backend="xla", db_stream=True,
                        precision="ladder", window_tiles=64)
    with pytest.raises(ValueError, match="ladder"):
        search_streaming_sharded(packed, queries, scfg, mesh=make_mesh(2))
