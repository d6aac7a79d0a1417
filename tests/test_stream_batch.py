"""Window-major batch streaming + device-side ladder candidates (round 3).

Covers VERDICT r2 next-steps #1 (batch-amortized streaming), #2 (ladder
candidate return), #3 (out-of-core window assembly), #5 (posture
validation). Exactness bar: hit lists bit-identical to the resident fused
path in score, index, and order.
"""

import subprocess
import sys
import textwrap

import numpy as np
import pytest

from swimm_tpu.db import build_db
from swimm_tpu.models.engine import SearchConfig, search
from swimm_tpu.utils.synth import synth_db, synth_queries


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    queries = synth_queries(5, [24, 40, 40, 64, 100], seed=51)
    recs = synth_db(300, seed=52, median_len=60, sigma=0.5, max_len=220,
                    queries=[q.codes for q in queries], homolog_frac=0.06)
    packed = build_db(recs, tmp_path_factory.mktemp("db"), V=8)
    return recs, queries, packed


def _key(results):
    return [[(h.score, h.sorted_idx) for h in r.hits] for r in results]


def test_windows_reassemble_flat_tiles(world):
    # the out-of-core window assembler must reproduce flat_tiles() content
    # (tiles, local rows) exactly, window by window
    from swimm_tpu.models.stream import iter_windows, plan_windows, \
        stream_layout
    _, _, packed = world
    tiles, outrow, n_rows = packed.flat_tiles()
    layout = stream_layout(packed)
    assert layout["n_rows"] == n_rows
    assert layout["T"] == tiles.shape[0]
    for wt in (8, 17, 64, 4096):
        spans, r_cap = plan_windows(layout, wt)
        seen_rows = 0
        for win, orow, g0, n_w, rc in iter_windows(packed, wt):
            t0, t1 = int(layout["cum"][g0]), int(layout["cum"][g0 + n_w])
            assert np.array_equal(win[:t1 - t0], tiles[t0:t1])
            assert np.array_equal(orow[:t1 - t0], outrow[t0:t1] - g0)
            assert (orow[t1 - t0:] == rc).all()       # trash row
            assert rc == r_cap
            seen_rows += n_w
        assert seen_rows == n_rows


def test_plan_windows_balanced(world):
    # spans are balanced (r3): same window count as greedy fill, every
    # span covers contiguous blocks exactly once, every fill fits the
    # window_tiles cap, and the dispatched width (effective_window_tiles)
    # bounds total padding by ~n_win * largest_block instead of greedy's
    # nearly-empty tail window
    from swimm_tpu.models.stream import (effective_window_tiles,
                                         plan_windows, stream_layout)
    _, _, packed = world
    layout = stream_layout(packed)
    cum, n_rows, T = layout["cum"], layout["n_rows"], layout["T"]
    biggest = int((cum[1:] - cum[:-1]).max())
    for wt in (biggest, 64, 512, 4096):
        spans, r_cap = plan_windows(layout, wt)
        assert spans[0][0] == 0 and spans[-1][1] == n_rows
        assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))
        fills = [int(cum[g1] - cum[g0]) for g0, g1 in spans]
        assert max(fills) <= wt
        eff = effective_window_tiles(layout, spans)
        assert max(fills) <= eff <= max(fills) + 63   # quantum roundup
        assert r_cap == max(g1 - g0 for g0, g1 in spans)
        if wt >= 8 * biggest:
            # roomy windows: balanced plan keeps greedy's window count
            # and bounds total padding by n_win * (biggest + quantum),
            # far below greedy's worst case of one nearly-empty window
            assert len(spans) == -(-T // wt)
            assert len(spans) * eff - T < len(spans) * (biggest + 64)


@pytest.mark.parametrize("merge", ["buffer", "candidates"])
def test_stream_batch_matches_resident_multi_mpad(world, merge):
    # several padded-length groups share each uploaded window; hit lists
    # must match the resident fused path bit-for-bit, under BOTH merge
    # strategies (persistent device score buffers / per-window candidates)
    _, queries, packed = world
    resident, _ = search(packed, queries,
                         SearchConfig(backend="xla", top_k=12))
    for wt in (32, 512):
        streamed, m = search(packed, queries,
                             SearchConfig(backend="xla", top_k=12,
                                          db_stream=True, window_tiles=wt,
                                          stream_scores=merge))
        assert _key(streamed) == _key(resident), f"window_tiles={wt}"
        assert m.n_queries == len(queries)


@pytest.mark.parametrize("merge", ["buffer", "candidates"])
def test_stream_batch_pallas_interpret(world, merge):
    # the TPU kernel path (interpret mode) through the window step
    _, queries, packed = world
    resident, _ = search(packed, queries[:2],
                         SearchConfig(backend="xla", top_k=8))
    streamed, _ = search(packed, queries[:2],
                         SearchConfig(backend="pallas", top_k=8,
                                      db_stream=True, window_tiles=64,
                                      stream_scores=merge))
    assert _key(streamed) == _key(resident)


def test_stream_mixed_modes_long_query(world, monkeypatch):
    # a query group past the single-pass kernel's VMEM budget routes
    # through the tiled long-query kernel INSIDE the same fused window
    # step as the short groups (per-group modes in one jitted program) —
    # exercised by shrinking the mode threshold instead of paying a
    # 5k-aa interpret run; hit lists stay bit-identical under both merge
    # strategies
    from swimm_tpu.models.stream import select_mode
    from swimm_tpu.ops import longquery, pallas_scorer
    _, queries, packed = world
    pair = [queries[0], queries[4]]              # 24 aa + 100 aa
    resident, _ = search(packed, pair,
                         SearchConfig(backend="xla", top_k=8))
    monkeypatch.setattr(pallas_scorer, "max_query_pad", lambda: 64)
    monkeypatch.setattr(longquery, "LONG_TILE_M", 32)
    m_pads = {-(-max(q.length, 1) // 16) * 16 for q in pair}
    assert {select_mode("pallas", m) for m in m_pads} == \
        {"tiles", "tiles_long"}                  # genuinely mixed
    # buffer mode only: candidates shares span_topk (tested at length
    # elsewhere) and interpret-mode long-kernel runs cost ~4 min each
    streamed, _ = search(packed, pair,
                         SearchConfig(backend="pallas", top_k=8,
                                      db_stream=True, window_tiles=4096,
                                      stream_scores="buffer"))
    assert _key(streamed) == _key(resident)


def test_resident_cap_autoroutes_to_streaming(world, monkeypatch):
    # a DB whose tile stream exceeds the ragged kernel's scalar-prefetch
    # SMEM capacity cannot run as one resident dispatch (found for real
    # at a 4M-seq / 356k-tile DB on v5e) — engine.search must route it
    # through the streaming path with identical hits, warn, and reject
    # the posture combinations streaming cannot serve
    from swimm_tpu.models import stream as S
    from swimm_tpu.ops import pallas_scorer
    _, queries, packed = world
    resident, _ = search(packed, queries,
                         SearchConfig(backend="xla", top_k=8))
    # cap chosen so the whole stream exceeds it but one 64-tile window
    # fits: the auto-routed streaming search must itself stay legal
    layout = S.stream_layout(packed)
    spans, _ = S.plan_windows(layout, 64)
    cap = S.effective_window_tiles(layout, spans)
    assert layout["T"] > cap          # precondition: guard triggers
    monkeypatch.setattr(pallas_scorer, "RESIDENT_TILE_CAP", cap)
    with pytest.warns(UserWarning, match="scalar-prefetch capacity"):
        routed, _ = search(packed, queries,
                           SearchConfig(backend="pallas", top_k=8,
                                        window_tiles=64))
    assert _key(routed) == _key(resident)
    with pytest.raises(ValueError, match="query_pack"):
        search(packed, queries, SearchConfig(backend="pallas",
                                             query_pack=True))
    with pytest.raises(ValueError, match="ladder"):
        search(packed, queries, SearchConfig(backend="pallas",
                                             precision="ladder"))
    # oversized windows on the pallas backend are rejected, not compiled
    with pytest.raises(ValueError, match="window_tiles"):
        search(packed, queries,
               SearchConfig(backend="pallas", db_stream=True,
                            window_tiles=4096))


def test_stream_scores_auto_resolution(world):
    # auto picks 'buffer' when the score buffers fit STREAM_BUFFER_CAP and
    # 'candidates' when they would not (huge-DB fallback)
    from swimm_tpu.models import stream as S
    _, queries, packed = world
    layout = S.stream_layout(packed)
    _, r_cap = S.plan_windows(layout, 512)
    cfg = SearchConfig(db_stream=True)
    assert S.resolve_stream_scores(cfg, 5, layout["n_rows"], r_cap,
                                   layout["V"]) == "buffer"
    huge_rows = S.STREAM_BUFFER_CAP // (4 * layout["V"]) + 1
    assert S.resolve_stream_scores(cfg, 5, huge_rows, r_cap,
                                   layout["V"]) == "candidates"
    forced = SearchConfig(db_stream=True, stream_scores="candidates")
    assert S.resolve_stream_scores(forced, 1, 1, 1, 128) == "candidates"
    with pytest.raises(ValueError, match="stream_scores"):
        SearchConfig(stream_scores="bogus")


def test_stream_single_window_whole_db(world):
    # window larger than the DB: one upload, still exact
    _, queries, packed = world
    resident, _ = search(packed, queries[:3],
                         SearchConfig(backend="xla", top_k=6))
    streamed, _ = search(packed, queries[:3],
                         SearchConfig(backend="xla", top_k=6,
                                      db_stream=True, window_tiles=1 << 16))
    assert _key(streamed) == _key(resident)


def test_stream_rejects_ladder(world):
    # posture validation (VERDICT r2 weak #3): asking for the ladder under
    # streaming must error loudly, not silently serve the exact pass
    _, queries, packed = world
    with pytest.raises(ValueError, match="ladder"):
        search(packed, queries[:1],
               SearchConfig(backend="xla", precision="ladder",
                            db_stream=True))


def test_cli_posture_conflicts(tmp_path):
    # every unsupported flag combination errors with a message naming the
    # conflicting flags (exit code 2 via the friendly ValueError path)
    from swimm_tpu.cli import main
    from swimm_tpu.fasta import write_fasta
    recs = synth_db(40, seed=60, median_len=30, sigma=0.3, max_len=60)
    fa = tmp_path / "db.fa"
    write_fasta(fa, recs)
    qf = tmp_path / "q.fa"
    write_fasta(qf, synth_queries(1, [24], seed=61))
    db = tmp_path / "db"
    assert main(["preprocess", "-i", str(fa), "-o", str(db)]) == 0
    base = ["search", "-d", str(db), "-q", str(qf), "--backend", "xla"]
    for extra in (["--sharded", "--query-pack"],
                  ["--sharded", "--window-tiles", "64"],
                  ["--sharded", "--max-in-flight", "4"],
                  ["--stream", "--query-pack"],
                  ["--stream", "--precision", "ladder"],
                  ["--sharded", "--stream", "--precision", "ladder"],
                  ["--stream-scores", "buffer"],              # no --stream
                  ["--sharded", "--stream",
                   "--stream-scores", "buffer"]):             # collective
        rc = main(base + extra)
        assert rc == 2, f"{extra} should be rejected, got rc={rc}"
    # an explicit --query-axis 0 must error loudly, not silently coerce
    # to the default mesh (regression: `or 1` swallowed the falsy 0)
    assert main(base + ["--sharded", "--query-axis", "0"]) == 2
    # the supported forms still run (sharded x stream implemented in r3)
    assert main(base) == 0
    assert main(base + ["--stream", "--window-tiles", "64"]) == 0
    assert main(base + ["--stream", "--stream-scores", "candidates"]) == 0
    assert main(base + ["--sharded", "--stream",
                        "--window-tiles", "64"]) == 0


def test_ladder_topk_candidates_equal_exact(tmp_path):
    # device-side candidate merge across tiers == exact-path hit lists,
    # including multi-tier escalation (forced tiny tiers) and candidates
    # another query escalated (dedupe path)
    from swimm_tpu.models.profile import build_query_profile
    from swimm_tpu.ops import ladder, xla_scorer

    import jax.numpy as jnp

    queries = synth_queries(3, [48, 48, 48], seed=71)
    recs = synth_db(120, seed=72, median_len=50, sigma=0.5, max_len=160,
                    queries=[queries[0].codes], homolog_frac=0.1)
    packed = build_db(recs, tmp_path / "db", V=8)
    qps = np.stack([build_query_profile(q.codes, m_multiple=8)
                    for q in queries])
    lens = [q.length for q in queries]
    k = 10
    tiles, outrow, n_rows = packed.flat_tiles()
    mask, l2s = packed.lane_maps()
    for tiers in (ladder.DEFAULT_TIERS, (20, 60, None), (5, None)):
        cand, stats = ladder.topk_db_adaptive_batch(
            packed, qps, lens, k, 10, 2, tiers=tiers, backend="xla")
        for i in range(len(queries)):
            exact = np.asarray(xla_scorer.score_tiles(
                jnp.asarray(tiles), outrow, n_rows,
                jnp.asarray(qps[i]), 10, 2)).reshape(-1)
            flat = np.where(mask, exact, -1)
            order = np.lexsort((np.arange(len(flat)), -flat))[:k]
            exp = [(int(flat[j]), int(l2s[j])) for j in order]
            got = [(int(v), int(s)) for v, s in zip(*cand[i])]
            assert got == exp, f"tiers={tiers} query {i}"
        if tiers == (20, 60, None):
            assert stats["tier_blocks"][1] >= 1     # escalation happened


def test_stream_out_of_core_rss(tmp_path):
    # SURVEY.md section 3 C4 / VERDICT r2 missing #2: streaming search must
    # not materialize the DB on the host — peak RSS growth while streaming
    # stays O(window), a small fraction of the DB's packed bytes. Runs in a
    # subprocess so this suite's own allocations don't pollute ru_maxrss.
    from swimm_tpu.utils.synth import synth_fasta_fast
    fa = tmp_path / "big.fa"
    synth_fasta_fast(fa, 150_000, seed=80, median_len=300, sigma=0.3,
                     max_len=900)
    db = tmp_path / "db"
    packed = build_db(str(fa), db, V=128)
    db_bytes = sum(int(c["n_blocks"]) * int(c["L"]) * int(c["V"])
                   for c in packed.manifest["chunks"])
    assert db_bytes > 45e6           # big enough for the check to mean much
    del packed
    from swimm_tpu.fasta import write_fasta
    qf = tmp_path / "q.fa"
    write_fasta(qf, synth_queries(2, [40, 72], seed=81))
    script = textwrap.dedent(f"""
        import resource, json
        import jax
        jax.config.update("jax_platforms", "cpu")
        from swimm_tpu.db import load_db
        from swimm_tpu.fasta import read_fasta
        from swimm_tpu.models.engine import SearchConfig, search
        packed = load_db({str(db)!r})            # memmap-backed
        queries = read_fasta({str(qf)!r})
        rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        results, _ = search(packed, queries,
                            SearchConfig(backend="xla", db_stream=True,
                                         window_tiles=512, top_k=5))
        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        assert all(len(r.hits) == 5 for r in results)
        print(json.dumps({{"delta_kb": rss1 - rss0}}))
    """)
    out = subprocess.run([sys.executable, "-c", script], cwd="/root/repo",
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    import json
    delta_kb = json.loads(out.stdout.strip().splitlines()[-1])["delta_kb"]
    # window = 512 tiles * 32 * 128 = 2 MB; allow jit-compile + runtime
    # buffer slack, but stay far under the DB bytes the materialized tile
    # stream (plus its chunk concat temporaries) would cost
    assert delta_kb * 1024 < db_bytes / 2, (
        f"streaming search grew RSS by {delta_kb} kB "
        f"(DB is {db_bytes >> 20} MB) — looks like the DB was "
        "materialized on the host")


def test_stream_truncated_chunk_file_raises(tmp_path):
    # a chunk file shorter than the manifest promises must fail loudly
    # at window assembly (short readinto), never silently score
    # zero-filled garbage (r3: readinto path error handling)
    from swimm_tpu.db import load_db
    recs = synth_db(120, seed=85, median_len=60, sigma=0.4, max_len=150)
    db = tmp_path / "db"
    build_db(recs, db, V=8)
    qf = synth_queries(1, [40], seed=86)
    # truncate the largest chunk file
    chunk_files = sorted(db.glob("chunk_*.npy"),
                         key=lambda p: p.stat().st_size)
    big = chunk_files[-1]
    big.write_bytes(big.read_bytes()[:-4096])
    with pytest.raises((IOError, ValueError)):
        packed = load_db(db)                     # memmap-backed
        search(packed, qf,
               SearchConfig(backend="xla", db_stream=True,
                            window_tiles=64, top_k=3))


def test_prefetch_abandon_stops_producer():
    # abandoning a half-consumed prefetch generator (consumer exception,
    # GC) must stop the producer thread and its blocked q.put instead of
    # leaking both for the process lifetime (review finding, round 3)
    import threading
    import time

    from swimm_tpu.models.stream import _prefetch_iter

    produced = []

    def src():
        for i in range(100_000):
            produced.append(i)
            yield i

    before = set(threading.enumerate())
    it = _prefetch_iter(src(), depth=2)
    assert next(it) == 0
    it.close()                          # GeneratorExit -> finally path
    deadline = time.time() + 10.0
    extra = True
    while time.time() < deadline:
        extra = [t for t in threading.enumerate() if t not in before]
        if not extra:
            break
        time.sleep(0.05)
    assert not extra, f"producer thread leaked: {extra}"
    assert len(produced) < 100_000      # stopped early, not run to completion


def test_prefetch_forwards_producer_exception():
    from swimm_tpu.models.stream import _prefetch_iter

    def src():
        yield 1
        raise RuntimeError("boom in producer")

    it = _prefetch_iter(src(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom in producer"):
        for _ in it:
            pass
