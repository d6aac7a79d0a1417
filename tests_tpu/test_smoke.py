"""Fast TPU smoke gate (`-m smoke`): every BASELINE config + ragged-kernel
parity + the streaming posture at deliberately small, FIXED shapes, so a
warm compilation cache makes the whole gate runnable in well under 3
minutes through the dev tunnel (VERDICT r2 weak #4: the full tests_tpu/
suite is too slow to routinely gate — this subset is the routine gate;
`make test-tpu-smoke`).

Shapes are pinned (sequence counts, query lengths, V, window size) so
repeat runs hit the persistent compile cache at /root/repo/.jax_cache.
"""

import tempfile

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = [
    pytest.mark.smoke,
    pytest.mark.skipif(jax.default_backend() == "cpu",
                       reason="needs TPU hardware"),
]

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


@pytest.fixture(scope="module")
def world():
    from swimm_tpu.db import build_db
    from swimm_tpu.utils.synth import synth_db, synth_queries

    queries = synth_queries(3, [144, 144, 320], seed=7)
    recs = synth_db(1500, seed=8, queries=[q.codes for q in queries],
                    homolog_frac=0.01)
    with tempfile.TemporaryDirectory() as td:
        yield build_db(recs, td, V=128), recs, queries


def _hit_keys(results):
    return [[(h.score, h.sorted_idx) for h in r.hits] for r in results]


def _check_hits_vs_oracle(packed, recs, q, hits):
    from swimm_tpu.matrices import get_matrix
    from swimm_tpu.ops import cref
    seqs = [recs[int(packed.orig_index[h.sorted_idx])].codes for h in hits]
    exp = cref.sw_score_many(q.codes, seqs, get_matrix("BLOSUM62"), 10, 2)
    assert list(exp) == [h.score for h in hits]


def test_smoke_config1_serving_exact(world):
    # config 1: single query through the default serving path, every
    # reported hit re-scored by the C oracle
    from swimm_tpu.models.engine import SearchConfig, search
    packed, recs, queries = world
    results, met = search(packed, queries[:1], SearchConfig(top_k=8))
    _check_hits_vs_oracle(packed, recs, queries[0], results[0].hits)
    assert results[0].hits[0].score > 100        # planted homolog on top
    assert met.gcups > 0


def test_smoke_config2_batch_and_config5_ladder(world):
    # config 2 (query batch) and config 5 (ladder == exact) in one pass
    from swimm_tpu.models.engine import SearchConfig, search
    packed, recs, queries = world
    exact, _ = search(packed, queries, SearchConfig(top_k=8))
    lad, _ = search(packed, queries,
                    SearchConfig(top_k=8, precision="ladder"))
    assert _hit_keys(exact) == _hit_keys(lad)
    _check_hits_vs_oracle(packed, recs, queries[2], exact[2].hits)


def test_smoke_config3_long_query(world):
    # config 3: a query over max_query_pad() routes through the tiled
    # long-query kernel (fixed 2560 aa -> one cached compile)
    from swimm_tpu.models.engine import SearchConfig, search
    from swimm_tpu.utils.synth import synth_queries
    packed, recs, _ = world
    q = synth_queries(1, [2560], seed=9)[0]
    results, _ = search(packed, [q], SearchConfig(top_k=4))
    _check_hits_vs_oracle(packed, recs, q, results[0].hits)


def test_smoke_config4_sharded(world):
    # config 4: the sharded collective-merge path on the local mesh
    from swimm_tpu.models.engine import SearchConfig, search
    from swimm_tpu.parallel.mesh import make_mesh
    from swimm_tpu.parallel.sharded_search import sharded_search
    packed, _recs, queries = world
    cfg = SearchConfig(top_k=8, precision="f32")
    serial, _ = search(packed, queries[:2], cfg)
    shard, met = sharded_search(packed, queries[:2], cfg, mesh=make_mesh(),
                                measure_merge=True)
    assert _hit_keys(serial) == _hit_keys(shard)
    assert met.timers.get("merge_collectives", {}).get("count", 0) >= 1


def test_smoke_streaming_matches_resident(world):
    # the window-major batch streaming posture (r3) on real hardware,
    # under BOTH merge strategies (persistent device score buffers /
    # per-window candidates): hit lists bit-identical to the resident
    # path
    from swimm_tpu.models.engine import SearchConfig, search
    packed, _recs, queries = world
    resident, _ = search(packed, queries, SearchConfig(top_k=8))
    for merge in ("buffer", "candidates"):
        streamed, _ = search(packed, queries,
                             SearchConfig(top_k=8, db_stream=True,
                                          window_tiles=256,
                                          stream_scores=merge))
        assert _hit_keys(streamed) == _hit_keys(resident), merge


def test_smoke_evalue_postures_agree(world):
    # E-value statistics (r3 extension) on real hardware: the on-device
    # MXU histogram (resident fused), the per-window variant (streaming)
    # and the psum'd variant (sharded) must produce identical E-values,
    # and the planted homolog must be overwhelmingly significant
    from swimm_tpu.models.engine import SearchConfig, search
    from swimm_tpu.parallel.mesh import make_mesh
    from swimm_tpu.parallel.sharded_search import sharded_search
    packed, _recs, queries = world
    res, _ = search(packed, queries[:2],
                    SearchConfig(top_k=8, evalue=True))
    strm, _ = search(packed, queries[:2],
                     SearchConfig(top_k=8, evalue=True, db_stream=True,
                                  window_tiles=256))
    shd, _ = sharded_search(packed, queries[:2],
                            SearchConfig(top_k=8, evalue=True),
                            mesh=make_mesh())
    assert _hit_keys(res) == _hit_keys(strm) == _hit_keys(shd)
    for rr, rs, rh in zip(res, strm, shd):
        for a, b, c in zip(rr.hits, rs.hits, rh.hits):
            assert a.evalue is not None
            assert abs(a.evalue - b.evalue) <= 1e-6 * max(a.evalue, 1e-12)
            assert abs(a.evalue - c.evalue) <= 1e-6 * max(a.evalue, 1e-12)
    assert res[0].hits[0].evalue < 1e-4          # planted homolog


def test_smoke_ragged_kernel_parity(world):
    # the ragged tile kernel vs the C oracle on every lane (small shapes)
    from swimm_tpu.matrices import get_matrix
    from swimm_tpu.models.engine import SearchConfig, score_db
    from swimm_tpu.ops import cref
    packed, recs, queries = world
    q = queries[1]
    got = score_db(packed, q, SearchConfig(backend="pallas",
                                           precision="f32"))
    rng = np.random.default_rng(11)
    sample = rng.integers(0, packed.n_seqs, 64)
    exp = cref.sw_score_many(
        q.codes, [recs[int(packed.orig_index[i])].codes for i in sample],
        get_matrix("BLOSUM62"), 10, 2)
    assert np.array_equal(got[sample], exp)


def test_smoke_serve_surface(world):
    """r4 serving surface on hardware: the resident SearchServer answers
    a JSON request (incl. m8 + align) with hits equal to a direct search,
    and the batcher coalesces concurrent requests to the same answers."""
    import threading

    from swimm_tpu.alphabet import decode
    from swimm_tpu.models.engine import SearchConfig, search
    from swimm_tpu.server import Batcher, SearchServer

    packed, recs, queries = world
    cfg = SearchConfig(top_k=8)
    srv = SearchServer(packed, cfg)
    req = {"id": 1, "queries": [{"title": queries[0].title,
                                 "seq": decode(queries[0].codes)}],
           "format": "m8", "align": True}
    resp = srv.handle(req)
    assert "error" not in resp
    direct, _ = search(packed, queries[:1], cfg)
    assert [(h["score"], h["title"]) for h in resp["results"][0]["hits"]] \
        == [(h.score, h.title) for h in direct[0].hits]
    assert len(resp["m8"]) == 8
    a0 = resp["results"][0]["hits"][0]["alignment"]
    assert a0["identity"] > 0 and a0["length"] >= a0["identity"]

    # concurrent coalescing on the chip
    b = Batcher(srv)
    out = [None, None]
    reqs = [{"id": i, "queries": [{"title": q.title,
                                   "seq": decode(q.codes)}]}
            for i, q in enumerate(queries[1:3])]
    ts = [threading.Thread(target=lambda i=i: out.__setitem__(
        i, b.submit(reqs[i]))) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    b.stop()
    direct2, _ = search(packed, queries[1:3], cfg)
    for i in range(2):
        assert [(h["score"], h["title"]) for h in out[i]["results"][0]["hits"]] \
            == [(h.score, h.title) for h in direct2[i].hits], f"req {i}"
