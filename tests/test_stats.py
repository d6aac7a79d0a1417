"""E-value statistics (utils/stats.py) — extension beyond the reference.

Covers: parameter recovery on synthetic Gumbel draws, censoring
robustness against planted homologs, the calibration property E[#hits
with E <= x] ~= x on a real engine search over random sequences, and the
CLI surface (--evalue column/JSON + posture-conflict validation).
"""

import json

import numpy as np
import pytest

from swimm_tpu.db import build_db
from swimm_tpu.fasta import write_fasta
from swimm_tpu.models.engine import SearchConfig, search
from swimm_tpu.utils.stats import fit_evalue_model
from swimm_tpu.utils.synth import synth_db, synth_queries


def _gumbel_scores(rng, n, a=5.0, b=8.0, beta=4.0):
    lengths = rng.integers(40, 2000, size=n)
    mu_gumbel = 0.0
    scores = (a + b * np.log(lengths)
              + rng.gumbel(mu_gumbel, beta, size=n))
    return np.round(scores), lengths


def test_fit_recovers_parameters():
    rng = np.random.default_rng(7)
    scores, lengths = _gumbel_scores(rng, 6000, a=5.0, b=8.0, beta=4.0)
    m = fit_evalue_model(scores, lengths)
    # the right-tail censoring clips ~1-2% of legitimate Gumbel draws,
    # biasing beta slightly low — accept 15% on scale, absolute on slope
    assert abs(m.b - 8.0) < 1.0
    assert abs(m.beta - 4.0) / 4.0 < 0.15
    # location: E[gumbel(0, beta)] folds into a + mu; check the combined
    # predicted mean score at a reference length
    pred = m.a + m.b * np.log(500.0) + m.mu + 0.5772 * m.beta
    true = 5.0 + 8.0 * np.log(500.0) + 0.5772 * 4.0
    assert abs(pred - true) < 2.0


def test_fit_censors_planted_homologs():
    rng = np.random.default_rng(11)
    scores, lengths = _gumbel_scores(rng, 4000, a=5.0, b=8.0, beta=4.0)
    dirty = scores.copy()
    dirty[:80] += 400.0          # 2% planted strong homologs
    clean = fit_evalue_model(scores, lengths)
    m = fit_evalue_model(dirty, lengths)
    assert m.n_censored >= 80    # every plant censored (plus tail noise)
    # null model essentially unchanged by the plants
    assert abs(m.b - clean.b) < 0.5
    assert abs(m.beta - clean.beta) / clean.beta < 0.10
    # and the plants are judged significant under the fit
    e_plant = m.evalue(dirty[0], lengths[0])
    assert e_plant < 1e-6


def test_hist_fit_matches_full_fit():
    # the binned estimator (device-side sufficient statistics) must agree
    # with the full-vector fit up to ln-length discretization
    from swimm_tpu.utils.stats import (N_LEN_BINS, SCORE_CAP,
                                       fit_evalue_model_hist, length_bins)
    rng = np.random.default_rng(13)
    scores, lengths = _gumbel_scores(rng, 5000, a=5.0, b=8.0, beta=4.0)
    scores = np.clip(scores, 0, SCORE_CAP)
    full = fit_evalue_model(scores, lengths)
    ids, centers = length_bins(lengths)
    hist = np.zeros((N_LEN_BINS, SCORE_CAP + 1))
    np.add.at(hist, (ids, scores.astype(int)), 1.0)
    binned = fit_evalue_model_hist(hist, centers)
    assert binned.n_db == full.n_db
    assert abs(binned.b - full.b) < 0.3
    assert abs(binned.beta - full.beta) / full.beta < 0.05
    # E-values agree within a few % in log space at a probe point
    e_f = full.evalue(120, 400)
    e_b = binned.evalue(120, 400)
    assert abs(np.log(e_b) - np.log(e_f)) < 0.25


def test_hist_fit_rejects_saturation():
    # clipping at the table edge is only safe while the clipped mass
    # would have been censored anyway; a null distribution that reaches
    # the top bin must fail loudly, not report anti-conservative
    # E-values (r3 review finding — reachable with zero gap penalties)
    from swimm_tpu.utils.stats import (N_LEN_BINS, SCORE_CAP,
                                       fit_evalue_model_hist, length_bins)
    rng = np.random.default_rng(17)
    lengths = rng.integers(40, 2000, size=4000)
    # null scores centered far beyond the cap: most mass clips
    scores = np.clip(
        np.round(600 + 80 * np.log(lengths)
                 + rng.gumbel(0, 40, size=4000)), 0, SCORE_CAP)
    ids, centers = length_bins(lengths)
    hist = np.zeros((N_LEN_BINS, SCORE_CAP + 1))
    np.add.at(hist, (ids, scores.astype(int)), 1.0)
    with pytest.raises(ValueError, match="saturated"):
        fit_evalue_model_hist(hist, centers)


def test_ladder_evalue_via_fused_api(evalue_world):
    # the fused batch API must serve the ladder x evalue fallback itself
    # (not only the top-level search()) — no silent evalue=None
    from swimm_tpu.models.engine import search_fused_batch
    _, queries, packed = evalue_world
    out, _ = search_fused_batch(
        packed, queries, SearchConfig(backend="xla", top_k=5,
                                      evalue=True, precision="ladder"))
    for hits in out:
        assert hits and all(h.evalue is not None for h in hits)


def test_evalue_analytic_properties():
    # invariants of the fitted model's arithmetic (guards the stable
    # expm1/exp formulation): E monotone nonincreasing in score,
    # nondecreasing in subject length (b > 0), bounded by [0, n_db],
    # and deep tails neither under- nor overflow
    rng = np.random.default_rng(23)
    scores, lengths = _gumbel_scores(rng, 3000)
    m = fit_evalue_model(scores, lengths)
    s_grid = np.arange(0, 2000, dtype=float)
    e = m.evalue(s_grid, 300)
    assert np.all(np.diff(e) <= 1e-12)
    assert np.all((e >= 0) & (e <= m.n_db))
    e_len = m.evalue(120, np.array([50.0, 500.0, 5000.0]))
    assert e_len[0] <= e_len[1] <= e_len[2]
    assert np.isfinite(m.evalue(1e6, 100))       # deep right tail -> 0
    assert m.evalue(0, 5000) <= m.n_db           # deep left tail -> n_db


def test_fit_input_validation():
    with pytest.raises(ValueError, match=">= 8"):
        fit_evalue_model(np.arange(4), np.arange(4) + 30)
    with pytest.raises(ValueError, match="scores"):
        fit_evalue_model(np.arange(20), np.arange(10) + 30)


@pytest.fixture(scope="module")
def evalue_world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("evalue")
    queries = synth_queries(2, [64, 120], seed=91)
    recs = synth_db(600, seed=92, median_len=120, sigma=0.6, max_len=900,
                    queries=[queries[0].codes], homolog_frac=0.01)
    packed = build_db(recs, tmp / "db", V=16)
    return tmp, queries, packed


def test_engine_evalue_calibration(evalue_world):
    _, queries, packed = evalue_world
    cfg = SearchConfig(backend="xla", top_k=600, evalue=True)
    results, _ = search(packed, queries, cfg)
    # query 0 has planted homologs: the top hit must be overwhelmingly
    # significant; its score dwarfs the null
    top = results[0].hits[0]
    assert top.evalue is not None and top.evalue < 1e-4
    # query 1 is random vs a random DB: calibration says the expected
    # number of hits with E <= 1 is ~1 — allow Poisson + fit slack
    e1 = sum(1 for h in results[1].hits if h.evalue <= 1.0)
    assert e1 <= 8
    # E-values are monotone nonincreasing in rank order at fixed length
    # regime: at least globally the minimum E belongs to the top score
    assert min(h.evalue for h in results[0].hits) == results[0].hits[0].evalue


def test_engine_evalue_matches_plain_hits(evalue_world):
    # the statistics posture must not change WHAT is reported — same
    # ranked (score, title) lists as the default fused path
    _, queries, packed = evalue_world
    plain, _ = search(packed, queries, SearchConfig(backend="xla", top_k=10))
    withe, _ = search(packed, queries,
                      SearchConfig(backend="xla", top_k=10, evalue=True))
    for rp, re_ in zip(plain, withe):
        assert [(h.score, h.title) for h in rp.hits] == \
               [(h.score, h.title) for h in re_.hits]
        assert all(h.evalue is not None for h in re_.hits)


def test_fused_evalue_close_to_full_vector(evalue_world):
    # default statistics posture (fused path + device histogram) vs the
    # ladder fallback (per-query full vector + unbinned fit): same hit
    # lists, E-values within discretization tolerance in log space
    _, queries, packed = evalue_world
    fused, _ = search(packed, queries,
                      SearchConfig(backend="xla", top_k=8, evalue=True))
    full, _ = search(packed, queries,
                     SearchConfig(backend="xla", top_k=8, evalue=True,
                                  precision="ladder"))
    for rf, rl in zip(fused, full):
        assert [(h.score, h.title) for h in rf.hits] == \
               [(h.score, h.title) for h in rl.hits]
        for hf, hl in zip(rf.hits, rl.hits):
            assert abs(np.log(max(hf.evalue, 1e-300))
                       - np.log(max(hl.evalue, 1e-300))) < 0.5, \
                (hf.evalue, hl.evalue)


def test_sharded_evalue_matches_resident(evalue_world):
    # per-shard histograms psum to exactly the whole-DB histogram (counts
    # are integers in f32: exact in any reduction order), so the sharded
    # statistics postures — resident AND streamed super-windows —
    # reproduce the resident E-values
    from swimm_tpu.parallel.mesh import make_mesh
    from swimm_tpu.parallel.sharded_search import sharded_search
    from swimm_tpu.parallel.sharded_stream import search_streaming_sharded
    _, queries, packed = evalue_world
    res, _ = search(packed, queries,
                    SearchConfig(backend="xla", top_k=8, evalue=True))
    shd, _ = sharded_search(packed, queries,
                            SearchConfig(backend="xla", top_k=8,
                                         evalue=True),
                            mesh=make_mesh(4, query_axis=2))
    sst, _ = search_streaming_sharded(
        packed, queries,
        SearchConfig(backend="xla", top_k=8, evalue=True, db_stream=True,
                     window_tiles=64),
        mesh=make_mesh(4, query_axis=1))
    for rr, rs, rt in zip(res, shd, sst):
        assert [(h.score, h.title) for h in rr.hits] == \
               [(h.score, h.title) for h in rs.hits] == \
               [(h.score, h.title) for h in rt.hits]
        for hr, hs, ht in zip(rr.hits, rs.hits, rt.hits):
            assert hs.evalue == pytest.approx(hr.evalue, rel=1e-6), \
                (hr.evalue, hs.evalue)
            assert ht.evalue == pytest.approx(hr.evalue, rel=1e-6), \
                (hr.evalue, ht.evalue)


def test_config_rejects_evalue_combinations():
    with pytest.raises(ValueError, match="evalue"):
        SearchConfig(evalue=True, query_pack=True)


@pytest.mark.parametrize("merge", ["buffer", "candidates"])
def test_streaming_evalue_matches_resident(evalue_world, merge):
    # windowed histograms sum to exactly the whole-DB histogram, so the
    # streaming statistics posture must reproduce the resident one —
    # identical hit lists AND (near-)identical E-values — under BOTH
    # merge strategies (the buffer finalize computes the histogram in
    # one whole-DB pass; candidates mode sums per-window histograms)
    _, queries, packed = evalue_world
    res, _ = search(packed, queries,
                    SearchConfig(backend="xla", top_k=8, evalue=True))
    strm, _ = search(packed, queries,
                     SearchConfig(backend="xla", top_k=8, evalue=True,
                                  db_stream=True, window_tiles=64,
                                  stream_scores=merge))
    for rr, rs in zip(res, strm):
        assert [(h.score, h.title) for h in rr.hits] == \
               [(h.score, h.title) for h in rs.hits]
        for hr, hs in zip(rr.hits, rs.hits):
            assert hs.evalue == pytest.approx(hr.evalue, rel=1e-5), \
                (hr.evalue, hs.evalue)


def test_cli_evalue(tmp_path, capsys):
    from swimm_tpu.cli import main
    queries = synth_queries(1, [50], seed=95)
    recs = synth_db(80, seed=96, median_len=60, sigma=0.4, max_len=150,
                    queries=[queries[0].codes], homolog_frac=0.1)
    write_fasta(tmp_path / "db.fa", recs)
    write_fasta(tmp_path / "q.fa", queries)
    assert main(["preprocess", "-i", str(tmp_path / "db.fa"),
                 "-o", str(tmp_path / "db"), "--lanes", "8"]) == 0
    capsys.readouterr()
    base = ["search", "-d", str(tmp_path / "db"),
            "-q", str(tmp_path / "q.fa"), "--backend", "xla", "-r", "5"]
    assert main(base + ["--evalue"]) == 0
    out = capsys.readouterr().out
    assert "E-value" in out
    assert main(base + ["--evalue", "--json"]) == 0
    payload = json.loads(capsys.readouterr().out)
    hits = payload["results"][0]["hits"]
    assert all("evalue" in h for h in hits)
    # every serving posture carries the statistics
    for extra in (["--stream", "--window-tiles", "32"],
                  ["--sharded"],
                  ["--sharded", "--stream", "--window-tiles", "32"]):
        assert main(base + ["--evalue"] + extra) == 0, extra
        assert "E-value" in capsys.readouterr().out, extra
    # conflicts error loudly
    assert main(base + ["--evalue", "--query-pack"]) == 2


def test_cli_max_evalue(tmp_path, capsys):
    from swimm_tpu.cli import main
    queries = synth_queries(1, [50], seed=95)
    recs = synth_db(80, seed=96, median_len=60, sigma=0.4, max_len=150,
                    queries=[queries[0].codes], homolog_frac=0.1)
    write_fasta(tmp_path / "db.fa", recs)
    write_fasta(tmp_path / "q.fa", queries)
    assert main(["preprocess", "-i", str(tmp_path / "db.fa"),
                 "-o", str(tmp_path / "db"), "--lanes", "8"]) == 0
    capsys.readouterr()
    base = ["search", "-d", str(tmp_path / "db"),
            "-q", str(tmp_path / "q.fa"), "--backend", "xla", "-r", "10",
            "--evalue", "--json"]
    assert main(base) == 0
    all_hits = json.loads(capsys.readouterr().out)["results"][0]["hits"]
    cut = sorted(h["evalue"] for h in all_hits)[len(all_hits) // 2]
    assert main(base + ["--max-evalue", str(cut)]) == 0
    kept = json.loads(capsys.readouterr().out)["results"][0]["hits"]
    expect = [h for h in all_hits if h["evalue"] <= cut]
    assert [(h["score"], h["title"]) for h in kept] == \
           [(h["score"], h["title"]) for h in expect]
    assert [h["rank"] for h in kept] == list(range(1, len(kept) + 1))
    assert 0 < len(kept) < len(all_hits)
    # requires --evalue; must be positive
    noe = [a for a in base if a != "--evalue"]
    assert main(noe + ["--max-evalue", "1"]) == 2
    assert main(base + ["--max-evalue", "0"]) == 2
