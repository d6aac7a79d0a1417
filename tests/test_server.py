"""Persistent search server (swimm_tpu/server.py + `swtpu serve`).

The SearchServer handler is driven in-process (hits must equal a direct
engine.search of the same queries — the server is a thin resident shell,
not a second scoring path), and the stdio loop is driven end-to-end
through serve_stdio with StringIO pipes: protocol framing, per-request
error isolation, shutdown, and EOF behavior.
"""

import io
import json

import numpy as np
import pytest

from swimm_tpu.alphabet import decode
from swimm_tpu.db import build_db
from swimm_tpu.fasta import write_fasta
from swimm_tpu.models.engine import SearchConfig, search
from swimm_tpu.server import SearchServer, serve_stdio
from swimm_tpu.utils.synth import synth_db, synth_queries


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("srvdb")
    recs = synth_db(150, seed=21)
    dbfa = tmp / "db.fasta"
    write_fasta(dbfa, recs)
    return build_db(str(dbfa), tmp / "packed", V=16)


def _cfg(**kw):
    return SearchConfig(backend="xla", top_k=4, **kw)


def test_handle_matches_direct_search(packed):
    srv = SearchServer(packed, _cfg())
    queries = synth_queries(2, [35, 70], seed=9)
    req = {"id": 1, "queries": [
        {"title": q.title, "seq": decode(q.codes)} for q in queries]}
    resp = srv.handle(req)
    assert resp["id"] == 1 and "error" not in resp
    direct, _ = search(packed, queries, _cfg())
    assert len(resp["results"]) == 2
    for got, want in zip(resp["results"], direct):
        assert got["query"] == want.query_title
        assert [(h["rank"], h["score"], h["title"]) for h in got["hits"]] \
            == [(h.rank, h.score, h.title) for h in want.hits]
    assert resp["metrics"]["gcups"] > 0
    assert srv.n_requests == 1


def test_handle_top_k_override_and_fasta_form(packed):
    srv = SearchServer(packed, _cfg())
    q = synth_queries(1, [40], seed=10)[0]
    fasta = f">{q.title}\n{decode(q.codes)}\n"
    resp = srv.handle({"query_fasta": fasta, "top_k": 2})
    assert len(resp["results"][0]["hits"]) == 2
    # override must not leak into the server default
    resp2 = srv.handle({"query_fasta": fasta})
    assert len(resp2["results"][0]["hits"]) == 4


def test_handle_evalue_posture(packed):
    srv = SearchServer(packed, _cfg(evalue=True))
    q = synth_queries(1, [50], seed=12)[0]
    resp = srv.handle({"queries": [{"title": "t", "seq": decode(q.codes)}]})
    h0 = resp["results"][0]["hits"][0]
    assert "evalue" in h0 and "bits" in h0 and h0["evalue"] >= 0


def test_handle_align(packed):
    srv = SearchServer(packed, _cfg())
    # a db sequence as the query: rank-1 is the exact self-hit, whose
    # alignment must be full-length 100% identity
    codes = packed.seq_codes(0)
    resp = srv.handle({"queries": [{"title": "self",
                                    "seq": decode(codes)}],
                       "align": True, "top_k": 2})
    hits = resp["results"][0]["hits"]
    a = hits[0]["alignment"]
    assert a["identity"] == a["length"] == len(codes)
    assert a["gaps"] == 0
    assert a["q_range"] == [1, len(codes)]
    assert "-" not in a["q_aln"]
    # align off by default
    resp2 = srv.handle({"queries": [{"title": "self",
                                     "seq": decode(codes)}]})
    assert "alignment" not in resp2["results"][0]["hits"][0]


def test_handle_request_errors(packed):
    srv = SearchServer(packed, _cfg())
    assert "error" in srv.handle({"id": 3})                  # no queries
    assert srv.handle({"id": 3})["id"] == 3
    assert "error" in srv.handle({"queries": [{"title": "x", "seq": ""}]})
    assert "error" in srv.handle({"query_fasta": ""})
    assert "error" in srv.handle({"queries": [{"seq": "ACD"}],
                                  "top_k": 0})
    assert "empty" in srv.handle(
        {"queries": [{"title": "x", "seq": ""}]})["error"]
    assert srv.n_requests == 0                # failures don't count
    assert srv.handle({"cmd": "ping"}) == {"ok": True}
    info = srv.handle({"cmd": "info"})["info"]
    assert info["n_seqs"] == packed.n_seqs
    assert info["default_top_k"] == 4


def test_serve_stdio_loop(packed):
    q = synth_queries(1, [45], seed=13)[0]
    lines = [
        json.dumps({"cmd": "ping", "id": 0}),
        "not json at all {",
        json.dumps({"id": 1,
                    "queries": [{"title": "q", "seq": decode(q.codes)}]}),
        json.dumps({"cmd": "shutdown", "id": 2}),
        json.dumps({"cmd": "ping"}),         # after shutdown: never read
    ]
    out, err = io.StringIO(), io.StringIO()
    rc = serve_stdio(packed, _cfg(), stdin=io.StringIO("\n".join(lines)),
                     stdout=out, stderr=err)
    assert rc == 0
    resp = [json.loads(l) for l in out.getvalue().splitlines()]
    assert resp[0] == {"ok": True, "id": 0}
    assert "bad request line" in resp[1]["error"]
    assert resp[2]["id"] == 1 and len(resp[2]["results"]) == 1
    assert resp[3] == {"ok": True, "served": 1, "id": 2}
    assert len(resp) == 4                    # nothing served post-shutdown
    assert "ready" in err.getvalue()


def test_serve_stdio_eof(packed):
    out, err = io.StringIO(), io.StringIO()
    rc = serve_stdio(packed, _cfg(), stdin=io.StringIO(""),
                     stdout=out, stderr=err)
    assert rc == 0 and out.getvalue() == ""
    assert "EOF" in err.getvalue()


def test_serve_warm_lengths(packed):
    # warm compiles must not affect results or counters
    srv = SearchServer(packed, _cfg(), warm_lengths=(32, 64))
    assert srv.n_requests == 0
    q = synth_queries(1, [32], seed=14)[0]
    resp = srv.handle({"queries": [{"title": "w", "seq": decode(q.codes)}]})
    assert "results" in resp


def test_cli_serve_subprocess(tmp_path):
    """End-to-end through the real CLI entry point as a subprocess."""
    import subprocess
    import sys
    recs = synth_db(60, seed=22)
    dbfa = tmp_path / "db.fasta"
    write_fasta(dbfa, recs)
    from swimm_tpu.cli import main
    assert main(["preprocess", "-i", str(dbfa),
                 "-o", str(tmp_path / "p"), "--lanes", "8"]) == 0
    q = synth_queries(1, [30], seed=15)[0]
    reqs = "\n".join([
        json.dumps({"cmd": "ping"}),
        json.dumps({"id": 5, "queries": [{"title": "sq",
                                          "seq": decode(q.codes)}]}),
        json.dumps({"cmd": "shutdown"}),
    ]) + "\n"
    import os
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    p = subprocess.run(
        [sys.executable, "-m", "swimm_tpu.cli", "serve",
         "-d", str(tmp_path / "p"), "--backend", "xla", "-r", "3"],
        input=reqs, capture_output=True, text=True, timeout=300, env=env,
        cwd="/root/repo")
    assert p.returncode == 0, p.stderr
    resp = [json.loads(l) for l in p.stdout.splitlines()]
    assert resp[0] == {"ok": True}
    assert resp[1]["id"] == 5 and len(resp[1]["results"][0]["hits"]) == 3
    assert resp[2]["ok"] is True
    assert "ready" in p.stderr


def test_socket_server_roundtrip(packed):
    """TCP front end: same protocol, results equal the stdio handler's."""
    import socket
    import threading

    from swimm_tpu.server import make_socket_server

    Server, Handler, srv, batcher = make_socket_server(packed, _cfg())
    tcp = Server(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=tcp.serve_forever,
                         kwargs={"poll_interval": 0.05}, daemon=True)
    t.start()
    try:
        port = tcp.server_address[1]
        q = synth_queries(1, [38], seed=16)[0]
        req = {"id": 7, "queries": [{"title": q.title,
                                     "seq": decode(q.codes)}]}

        def drive(lines):
            with socket.create_connection(("127.0.0.1", port),
                                          timeout=30) as s:
                f = s.makefile("rw", encoding="utf-8")
                out = []
                for line in lines:
                    f.write(line + "\n")
                    f.flush()
                    out.append(json.loads(f.readline()))
                return out

        # connection 1: ping, malformed line, search
        r = drive([json.dumps({"cmd": "ping"}), "{nope",
                   json.dumps(req)])
        assert r[0] == {"ok": True}
        assert "bad request line" in r[1]["error"]
        assert r[2]["id"] == 7
        direct = SearchServer(packed, _cfg()).handle(req)
        assert r[2]["results"] == direct["results"]
        # connection 2: the same resident server answers a second client
        r2 = drive([json.dumps({"cmd": "info"})])
        assert r2[0]["info"]["n_requests"] == 1
        # shutdown from a client stops serve_forever
        r3 = drive([json.dumps({"cmd": "shutdown", "id": 9})])
        assert r3[0] == {"ok": True, "served": 1, "id": 9}
        t.join(timeout=10)
        assert not t.is_alive()
    finally:
        tcp.shutdown()
        tcp.server_close()


def test_cli_listen_flag_validation(tmp_path):
    from swimm_tpu.cli import main
    recs = synth_db(30, seed=23)
    dbfa = tmp_path / "db.fasta"
    write_fasta(dbfa, recs)
    assert main(["preprocess", "-i", str(dbfa),
                 "-o", str(tmp_path / "p"), "--lanes", "8"]) == 0
    for bad in ["8080x", "localhost", "host:port"]:
        rc = main(["serve", "-d", str(tmp_path / "p"),
                   "--backend", "xla", "--listen", bad])
        assert rc == 2
    # r5 flags: each names its conflict/constraint and exits 2
    for extra in (["--request-timeout", "5"],        # requires --listen
                  ["--allow-remote-shutdown"],       # requires --listen
                  ["--listen", "127.0.0.1:0", "--request-timeout", "-1"]):
        rc = main(["serve", "-d", str(tmp_path / "p"),
                   "--backend", "xla"] + extra)
        assert rc == 2, extra


def test_handle_m8_format(packed):
    srv = SearchServer(packed, _cfg())
    codes = packed.seq_codes(0)
    resp = srv.handle({"queries": [{"title": "self q", "seq": decode(codes)}],
                       "format": "m8", "top_k": 3})
    rows = resp["m8"]
    assert len(rows) == 3
    # rank-1 self-hit: 100% identity over the full length, E/bits absent
    cols = rows[0].split("\t")
    assert cols[0] == "self" and cols[2] == "100.00"
    assert int(cols[3]) == len(codes) and cols[4] == "0" and cols[5] == "0"
    assert cols[10] == "*" and cols[11] == "*"
    # m8 alone must not attach JSON alignment blocks
    assert "alignment" not in resp["results"][0]["hits"][0]
    # and the rows match the CLI formatter exactly
    from swimm_tpu.formats import m8_rows
    from swimm_tpu.models.engine import SearchConfig, search
    from swimm_tpu.fasta import FastaRecord
    from swimm_tpu.server import _alignments
    direct, _ = search(packed, [FastaRecord("self q", codes)],
                       SearchConfig(backend="xla", top_k=3))
    scoring = {"matrix": "BLOSUM62", "gap_open": 10, "gap_extend": 2}
    want = m8_rows(direct[0], _alignments(direct[0], packed,
                                          FastaRecord("self q", codes),
                                          scoring))
    assert rows == want
    assert "error" in srv.handle({"queries": [{"title": "x", "seq": "MKV"}],
                                  "format": "tsv"})


def test_batcher_coalesces_and_truncates(packed):
    """3 concurrent requests (mixed top_k) -> ONE search dispatch; each
    response equals a direct per-request search (prefix-stability of
    the ranked list in k)."""
    import threading

    from swimm_tpu.server import Batcher

    srv = SearchServer(packed, _cfg())
    b = Batcher(srv, autostart=False)          # manual stepping
    qs = synth_queries(3, [30, 44, 44], seed=17)
    reqs = [
        {"id": 0, "queries": [{"title": qs[0].title,
                               "seq": decode(qs[0].codes)}], "top_k": 2},
        {"id": 1, "queries": [{"title": qs[1].title,
                               "seq": decode(qs[1].codes)}]},      # k=4
        {"id": 2, "queries": [{"title": qs[2].title,
                               "seq": decode(qs[2].codes)},
                              {"title": "x2", "seq": decode(qs[0].codes)}],
         "top_k": 3},
    ]
    out = [None] * 3
    threads = [threading.Thread(target=lambda i=i: out.__setitem__(
        i, b.submit(reqs[i]))) for i in range(3)]
    for t in threads:
        t.start()
    # wait until all three are queued, then dispatch once
    for _ in range(500):
        with b._cv:
            if len(b._pending) == 3:
                break
        import time
        time.sleep(0.01)
    b._drain_once()
    for t in threads:
        t.join(timeout=30)
    assert b.n_dispatches == 1
    assert srv.n_requests == 3
    for i, req in enumerate(reqs):
        assert out[i]["id"] == i and "error" not in out[i]
        assert out[i]["metrics"]["batched_requests"] == 3
        assert out[i]["metrics"]["batched_queries"] == 4
        direct = SearchServer(packed, _cfg()).handle(req)
        assert out[i]["results"] == direct["results"], f"request {i}"


def test_batcher_error_and_oversize(packed):
    from swimm_tpu.server import Batcher

    srv = SearchServer(packed, _cfg())
    b = Batcher(srv, max_batch_queries=1, autostart=False)
    # parse errors answer immediately, never queue
    assert "error" in b.submit({"id": 9})
    with b._cv:
        assert not b._pending
    # an oversized single request still serves (alone)
    import threading
    qs = synth_queries(2, [25, 33], seed=18)
    req = {"queries": [{"title": q.title, "seq": decode(q.codes)}
                       for q in qs]}
    out = {}
    t = threading.Thread(target=lambda: out.setdefault(
        "r", b.submit(req)))
    t.start()
    for _ in range(500):
        with b._cv:
            if b._pending:
                break
        import time
        time.sleep(0.01)
    b._drain_once()
    t.join(timeout=30)
    assert len(out["r"]["results"]) == 2
    assert b.n_dispatches == 1


def test_batcher_autostart_socket_path(packed):
    """Through the real TCP server (autostarted dispatcher): serial
    requests still serve correctly batch-of-1."""
    import socket
    import threading

    from swimm_tpu.server import make_socket_server

    Server, Handler, srv, batcher = make_socket_server(packed, _cfg())
    tcp = Server(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=tcp.serve_forever,
                         kwargs={"poll_interval": 0.05}, daemon=True)
    t.start()
    try:
        port = tcp.server_address[1]
        q = synth_queries(1, [28], seed=19)[0]
        with socket.create_connection(("127.0.0.1", port), timeout=30) as s:
            f = s.makefile("rw", encoding="utf-8")
            for rep in range(2):
                f.write(json.dumps({"id": rep, "queries": [
                    {"title": q.title, "seq": decode(q.codes)}]}) + "\n")
                f.flush()
                r = json.loads(f.readline())
                assert r["id"] == rep and "error" not in r
                assert r["metrics"]["batched_requests"] >= 1
        assert srv.n_requests == 2
    finally:
        tcp.shutdown()
        tcp.server_close()
        batcher.stop()


def test_server_streaming_posture_matches_resident(packed):
    """A serve process started with --stream must rank identically to the
    resident posture (the server is posture-transparent)."""
    q = synth_queries(2, [26, 41], seed=20)
    req = {"queries": [{"title": x.title, "seq": decode(x.codes)}
                       for x in q]}
    res = SearchServer(packed, _cfg()).handle(req)
    stream = SearchServer(
        packed, _cfg(db_stream=True, window_tiles=64)).handle(req)
    assert [(h["score"], h["title"]) for r in res["results"]
            for h in r["hits"]] == \
           [(h["score"], h["title"]) for r in stream["results"]
            for h in r["hits"]]


def test_batcher_preserves_evalues(packed):
    """Coalescing requests must not change E-values/bits: the Gumbel fit
    is per query, so a batched dispatch equals a direct search."""
    import threading

    from swimm_tpu.server import Batcher

    srv = SearchServer(packed, _cfg(evalue=True))
    b = Batcher(srv, autostart=False)
    qs = synth_queries(2, [31, 47], seed=24)
    reqs = [{"id": i, "queries": [{"title": q.title,
                                   "seq": decode(q.codes)}],
             "format": "m8"} for i, q in enumerate(qs)]
    out = [None, None]
    ts = [threading.Thread(target=lambda i=i: out.__setitem__(
        i, b.submit(reqs[i]))) for i in range(2)]
    for t in ts:
        t.start()
    for _ in range(500):
        with b._cv:
            if len(b._pending) == 2:
                break
        import time
        time.sleep(0.01)
    b._drain_once()
    for t in ts:
        t.join(timeout=30)
    assert b.n_dispatches == 1
    for i, req in enumerate(reqs):
        direct = SearchServer(packed, _cfg(evalue=True)).handle(req)
        assert out[i]["results"] == direct["results"], f"request {i}"
        assert out[i]["m8"] == direct["m8"]
        h0 = out[i]["results"][0]["hits"][0]
        assert "evalue" in h0 and "bits" in h0


def test_info_accounting_and_sigterm(packed, tmp_path):
    """info reports serving totals; SIGTERM drains a --listen server."""
    srv = SearchServer(packed, _cfg())
    q = synth_queries(1, [36], seed=25)[0]
    srv.handle({"queries": [{"title": q.title, "seq": decode(q.codes)}]})
    info = srv.handle({"cmd": "info"})["info"]
    assert info["n_requests"] == 1 and info["n_queries"] == 1
    assert info["total_cells"] > 0 and info["uptime_s"] >= 0
    assert info["search_seconds"] > 0

    # SIGTERM: subprocess CLI server exits 0 after the signal
    import os
    import signal
    import subprocess
    import sys
    recs = synth_db(40, seed=26)
    dbfa = tmp_path / "db.fasta"
    write_fasta(dbfa, recs)
    from swimm_tpu.cli import main
    assert main(["preprocess", "-i", str(dbfa),
                 "-o", str(tmp_path / "p"), "--lanes", "8"]) == 0
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    p = subprocess.Popen(
        [sys.executable, "-m", "swimm_tpu.cli", "serve",
         "-d", str(tmp_path / "p"), "--backend", "xla",
         "--listen", "127.0.0.1:0"],
        stderr=subprocess.PIPE, text=True, bufsize=1, env=env,
        cwd="/root/repo")
    try:
        for line in p.stderr:
            if "serving" in line:
                break
        p.send_signal(signal.SIGTERM)
        assert p.wait(timeout=60) == 0
        rest = p.stderr.read()
        assert "shutting down" in rest and "shutdown after" in rest
    finally:
        if p.poll() is None:
            p.kill()


def test_socket_server_concurrent_stress(packed):
    """16 clients x 3 requests each, small batch cap: every response
    routes to its own request (ids and scores match a direct search),
    across many coalesced dispatches."""
    import socket
    import threading

    from swimm_tpu.server import make_socket_server

    Server, Handler, srv, batcher = make_socket_server(
        packed, _cfg(), max_batch_queries=4)
    tcp = Server(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=tcp.serve_forever,
                         kwargs={"poll_interval": 0.05}, daemon=True)
    t.start()
    try:
        port = tcp.server_address[1]
        n_clients, n_reqs = 16, 3
        qs = synth_queries(n_clients, [20 + 3 * i
                                       for i in range(n_clients)], seed=27)
        # expected scores per client, from a direct search
        direct, _ = search(packed, qs, _cfg())
        want = [[(h.rank, h.score, h.title) for h in r.hits]
                for r in direct]
        errors = []

        def client(ci):
            try:
                with socket.create_connection(("127.0.0.1", port),
                                              timeout=120) as s:
                    f = s.makefile("rw", encoding="utf-8")
                    for ri in range(n_reqs):
                        rid = ci * 100 + ri
                        f.write(json.dumps(
                            {"id": rid, "queries": [
                                {"title": qs[ci].title,
                                 "seq": decode(qs[ci].codes)}]}) + "\n")
                        f.flush()
                        r = json.loads(f.readline())
                        assert r["id"] == rid, r
                        got = [(h["rank"], h["score"], h["title"])
                               for h in r["results"][0]["hits"]]
                        assert got == want[ci], f"client {ci} req {ri}"
            except Exception as e:   # noqa: BLE001 — collected for the
                errors.append(f"client {ci}: {e!r}")   # main assert

        threads = [threading.Thread(target=client, args=(ci,))
                   for ci in range(n_clients)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert not errors, errors
        assert srv.n_requests == n_clients * n_reqs
        # coalescing actually happened AND the cap held
        assert batcher.n_dispatches < n_clients * n_reqs
        assert batcher.n_dispatches >= (n_clients * n_reqs) // 4
    finally:
        tcp.shutdown()
        tcp.server_close()
        batcher.stop()


def test_http_server_routes(packed):
    """HTTP front end: /health, /info, POST /search (parity with the
    line-protocol handler), 400/404 paths, concurrent coalescing."""
    import threading
    import urllib.error
    import urllib.request

    from swimm_tpu.server import make_http_server

    Server, Handler, srv, batcher = make_http_server(packed, _cfg())
    httpd = Server(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever,
                         kwargs={"poll_interval": 0.05}, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"

        def get(path):
            try:
                with urllib.request.urlopen(base + path, timeout=30) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        def post(path, obj):
            req = urllib.request.Request(
                base + path, data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        assert get("/health") == (200, {"ok": True})
        code, info = get("/info")
        assert code == 200 and info["info"]["n_seqs"] == packed.n_seqs
        assert get("/nope")[0] == 404

        q = synth_queries(1, [37], seed=28)[0]
        sreq = {"queries": [{"title": q.title, "seq": decode(q.codes)}],
                "top_k": 3}
        code, resp = post("/search", sreq)
        assert code == 200
        direct = SearchServer(packed, _cfg()).handle(sreq)
        assert resp["results"] == direct["results"]

        assert post("/search", {"no": "queries"})[0] == 400
        assert post("/elsewhere", sreq)[0] == 404

        # two concurrent POSTs coalesce through the shared batcher
        before = batcher.n_dispatches
        out = [None, None]
        ts = [threading.Thread(target=lambda i=i: out.__setitem__(
            i, post("/search", sreq))) for i in range(2)]
        for th in ts:
            th.start()
        for th in ts:
            th.join(timeout=120)
        assert all(o[0] == 200 for o in out)
        assert out[0][1]["results"] == out[1][1]["results"] \
            == direct["results"]
        assert batcher.n_dispatches - before <= 2
    finally:
        httpd.shutdown()
        httpd.server_close()
        batcher.stop()


def test_unknown_cmd_errors(packed):
    srv = SearchServer(packed, _cfg())
    resp = srv.handle({"cmd": "restart", "id": 4})
    assert resp["id"] == 4 and "unknown cmd" in resp["error"]


# ---------------------------------------------------------------------------
# ADVICE r4 hardening: typed-but-malformed requests, error kinds, top_k
# ceiling + power-of-two dispatch bucketing, loopback-gated TCP shutdown.

MALFORMED = [
    {"queries": [{"seq": 5}]},          # non-string seq
    {"queries": "MKV"},                 # queries not a list
    {"queries": [5]},                   # element not an object
    {"query_fasta": 5},                 # fasta not a string
    {"queries": [{"seq": "ACD"}], "top_k": [4]},    # top_k not an int
    {"queries": [{"seq": "ACD"}], "top_k": True},   # bool is not a k
]


def test_handle_malformed_types_stay_up(packed):
    """Every typed-but-malformed request gets an {"error": ...} reply
    with error_kind bad_request — never an exception that would kill a
    transport loop — and the server keeps serving afterwards."""
    srv = SearchServer(packed, _cfg())
    for req in MALFORMED:
        resp = srv.handle(dict(req, id=7))
        assert resp.get("error_kind") == "bad_request", req
        assert resp["id"] == 7 and "error" in resp, req
    assert srv.n_requests == 0
    q = synth_queries(1, [33], seed=31)[0]
    ok = srv.handle({"queries": [{"title": "q", "seq": decode(q.codes)}]})
    assert "error" not in ok and len(ok["results"]) == 1


def test_batcher_malformed_types_answer_immediately(packed):
    from swimm_tpu.server import Batcher
    srv = SearchServer(packed, _cfg())
    b = Batcher(srv, autostart=False)
    for req in MALFORMED:
        resp = b.submit(dict(req, id=8))
        assert resp.get("error_kind") == "bad_request", req
        assert resp["id"] == 8 and "error" in resp, req
    with b._cv:
        assert not b._pending        # nothing queued, nothing to hang on


def test_stdio_malformed_types_stay_up(packed):
    """End-to-end through serve_stdio: a malformed line must not crash
    the resident process (the r4 advisory's stdio failure mode)."""
    import io
    q = synth_queries(1, [29], seed=32)[0]
    lines = [json.dumps(dict(m, id=i)) for i, m in enumerate(MALFORMED)]
    lines.append(json.dumps({"id": 99, "queries": [
        {"title": "q", "seq": decode(q.codes)}]}))
    out, err = io.StringIO(), io.StringIO()
    rc = serve_stdio(packed, _cfg(), stdin=io.StringIO("\n".join(lines)),
                     stdout=out, stderr=err)
    assert rc == 0
    resps = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(resps) == len(MALFORMED) + 1
    for r in resps[:-1]:
        assert "error" in r and r["error_kind"] == "bad_request"
    assert resps[-1]["id"] == 99 and len(resps[-1]["results"]) == 1


def test_handle_internal_fault_answers_and_stays_up(packed):
    """A fault INSIDE the search (past validation) answers the request
    with error_kind internal instead of killing the server."""
    srv = SearchServer(packed, _cfg())

    def boom(*a, **kw):
        raise RuntimeError("synthetic device fault")

    real = srv._search
    srv._search = boom
    q = synth_queries(1, [30], seed=33)[0]
    req = {"id": 5, "queries": [{"title": "q", "seq": decode(q.codes)}]}
    resp = srv.handle(req)
    assert resp["id"] == 5 and resp["error_kind"] == "internal"
    assert "synthetic device fault" in resp["error"]
    srv._search = real
    assert "error" not in srv.handle(req)


def test_handle_shutdown_explicit_message(packed):
    srv = SearchServer(packed, _cfg())
    resp = srv.handle({"cmd": "shutdown", "id": 6})
    assert resp["id"] == 6 and resp["error_kind"] == "bad_request"
    assert "SIGTERM" in resp["error"]
    assert "unknown cmd" not in resp["error"]


def test_top_k_ceiling_and_bucketing(packed):
    from swimm_tpu.server import _bucket_k
    # unit: default passes through, others round up to pow2 capped
    assert _bucket_k(4, 4, 1024) == 4
    assert _bucket_k(5, 4, 1024) == 8
    assert _bucket_k(3, 4, 1024) == 4
    assert _bucket_k(1, 4, 1024) == 1
    assert _bucket_k(1000, 4, 1024) == 1024
    assert _bucket_k(1024, 4, 1024) == 1024

    srv = SearchServer(packed, _cfg(), max_top_k=8)
    q = synth_queries(1, [41], seed=34)[0]
    qd = [{"title": "q", "seq": decode(q.codes)}]
    resp = srv.handle({"queries": qd, "top_k": 9})
    assert resp["error_kind"] == "bad_request" and "maximum 8" in resp["error"]
    # k=5 dispatches at the 8-bucket and truncates: must equal the
    # 8-prefix of a direct k=8 run (prefix stability)
    r5 = srv.handle({"queries": qd, "top_k": 5})
    r8 = srv.handle({"queries": qd, "top_k": 8})
    assert len(r5["results"][0]["hits"]) == 5
    assert r5["results"][0]["hits"] == r8["results"][0]["hits"][:5]
    # ceiling below the server default is a config error
    with pytest.raises(ValueError, match="below the server default"):
        SearchServer(packed, _cfg(), max_top_k=2)


def test_shutdown_loopback_gate():
    from swimm_tpu.server import shutdown_allowed
    assert shutdown_allowed("127.0.0.1", False)
    assert shutdown_allowed("127.0.0.53", False)
    assert shutdown_allowed("::1", False)
    assert shutdown_allowed("::ffff:127.0.0.1", False)
    assert not shutdown_allowed("10.0.0.5", False)
    assert not shutdown_allowed("192.168.1.9", False)
    assert shutdown_allowed("10.0.0.5", True)


def test_http_error_status_mapping(packed):
    """HTTP front end maps error_kind -> status: 400 for bad input,
    500 for an internal dispatch fault (load balancers must be able to
    tell them apart — ADVICE r4)."""
    import threading
    import urllib.error
    import urllib.request

    from swimm_tpu.server import make_http_server

    Server, Handler, srv, batcher = make_http_server(packed, _cfg())
    httpd = Server(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever,
                         kwargs={"poll_interval": 0.05}, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"

        def post(obj):
            req = urllib.request.Request(
                base + "/search", data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        for m in MALFORMED:
            code, resp = post(m)
            assert code == 400 and resp["error_kind"] == "bad_request", m
        # shutdown has no HTTP route-through: explicit 400, not "unknown"
        code, resp = post({"cmd": "shutdown"})
        assert code == 400 and "SIGTERM" in resp["error"]
        # internal fault -> 500
        real = srv._search

        def boom(*a, **kw):
            raise RuntimeError("synthetic dispatch fault")

        srv._search = boom
        q = synth_queries(1, [26], seed=35)[0]
        good = {"queries": [{"title": "q", "seq": decode(q.codes)}]}
        code, resp = post(good)
        assert code == 500 and resp["error_kind"] == "internal"
        srv._search = real
        code, resp = post(good)
        assert code == 200 and "error" not in resp
    finally:
        httpd.shutdown()
        httpd.server_close()
        batcher.stop()


def test_request_timeout_cancels_queued(packed):
    """With no dispatcher running, a timed-out request is withdrawn
    from the queue (true cancellation) and answered error_kind timeout."""
    import time

    from swimm_tpu.server import Batcher
    srv = SearchServer(packed, _cfg())
    b = Batcher(srv, autostart=False, request_timeout=0.25)
    q = synth_queries(1, [30], seed=36)[0]
    req = {"id": 1, "queries": [{"title": "q", "seq": decode(q.codes)}]}
    t0 = time.perf_counter()
    resp = b.submit(req)
    assert time.perf_counter() - t0 < 5
    assert resp["id"] == 1 and resp["error_kind"] == "timeout"
    assert "cancelled while queued" in resp["error"]
    with b._cv:
        assert not b._pending         # withdrawn, not left to dispatch


def test_request_timeout_in_flight_discards(packed):
    """A request already dispatched when the timeout fires answers the
    client immediately; the (uncancellable) search result is discarded
    and the server keeps serving."""
    import time

    from swimm_tpu.server import Batcher
    srv = SearchServer(packed, _cfg())
    real = srv._search

    def slow(*a, **kw):
        time.sleep(1.2)
        return real(*a, **kw)

    srv._search = slow
    b = Batcher(srv, request_timeout=0.3)      # autostarted dispatcher
    try:
        q = synth_queries(1, [28], seed=37)[0]
        req = {"id": 2, "queries": [{"title": "q", "seq": decode(q.codes)}]}
        t0 = time.perf_counter()
        resp = b.submit(req)
        dt = time.perf_counter() - t0
        assert resp["error_kind"] == "timeout", resp
        assert "discarded" in resp["error"]
        assert dt < 1.0                        # answered before the search
        srv._search = real
        for _ in range(100):                   # let the slow dispatch drain
            time.sleep(0.05)
            if b.n_dispatches >= 1:
                break
        ok = b.submit(req)
        assert "error" not in ok and ok["id"] == 2
    finally:
        b.stop()


def test_http_status_map_has_timeout():
    from swimm_tpu.server import _HTTP_STATUS
    assert _HTTP_STATUS["timeout"] == 504


def test_max_query_len_guard(packed):
    srv = SearchServer(packed, _cfg(), max_query_len=50)
    q = synth_queries(1, [80], seed=38)[0]
    resp = srv.handle({"id": 1, "queries": [
        {"title": "long", "seq": decode(q.codes)}]})
    assert resp["error_kind"] == "bad_request"
    assert "80 aa" in resp["error"] and "maximum 50" in resp["error"]
    short = synth_queries(1, [40], seed=38)[0]
    ok = srv.handle({"queries": [{"title": "s", "seq": decode(short.codes)}]})
    assert "error" not in ok
    # default: unlimited
    srv2 = SearchServer(packed, _cfg())
    assert "error" not in srv2.handle(
        {"queries": [{"title": "long", "seq": decode(q.codes)}]})


def test_info_reports_rss(packed):
    srv = SearchServer(packed, _cfg())
    info = srv.handle({"cmd": "info"})["info"]
    assert info["rss_mb"] is None or info["rss_mb"] > 0


def test_protocol_fuzz_handler_never_raises(packed):
    """Seeded random-request fuzz of the full handler: any JSON object a
    client could send must produce a dict reply ('results' or 'error'),
    never an exception — the invariant every transport loop relies on
    to keep the resident server up."""
    rng = np.random.default_rng(99)

    def rand_value(depth=0):
        kind = rng.integers(0, 9 if depth < 2 else 6)
        if kind == 0:
            return int(rng.integers(-(10**9), 10**9))
        if kind == 1:
            return float(rng.normal())
        if kind == 2:
            return bool(rng.integers(0, 2))
        if kind == 3:
            return None
        if kind == 4:
            n = int(rng.integers(0, 12))
            alpha = "ACDEFGHIKLMNPQRSTVWY>*\n\x00é🧬 {}[]"
            return "".join(alpha[i] for i in
                           rng.integers(0, len(alpha), size=n))
        if kind == 5:
            return ""
        if kind == 6:
            return [rand_value(depth + 1)
                    for _ in range(int(rng.integers(0, 4)))]
        if kind == 7:
            return {str(rand_value(2)): rand_value(depth + 1)
                    for _ in range(int(rng.integers(0, 4)))}
        return {"seq": rand_value(depth + 1),
                "title": rand_value(depth + 1)}

    srv = SearchServer(packed, _cfg(), max_top_k=8, max_query_len=64)
    keys = ["queries", "query_fasta", "top_k", "align", "format", "cmd",
            "id", "bogus"]
    served = 0
    for i in range(300):
        req = {k: rand_value() for k in
               rng.choice(keys, size=rng.integers(1, 5), replace=False)}
        resp = srv.handle(req)      # must never raise
        assert isinstance(resp, dict)
        assert "error" in resp or "results" in resp \
            or "ok" in resp or "info" in resp, req
        if "results" in resp:
            served += 1
    # the server must still work after the barrage
    q = synth_queries(1, [30], seed=40)[0]
    ok = srv.handle({"queries": [{"title": "q", "seq": decode(q.codes)}]})
    assert "error" not in ok


def test_bucket_k_properties():
    """For every (k, default, max) in range: bucket >= k (prefix
    truncation exact), bucket <= max, and the set of distinct buckets a
    full k sweep can produce is O(log max) + the default."""
    from swimm_tpu.server import _bucket_k
    for default in (1, 4, 16, 100):
        for max_k in (default, 64, 1000):
            if max_k < default:
                continue
            seen = set()
            for k in range(1, max_k + 1):
                b = _bucket_k(k, default, max_k)
                assert k <= b <= max_k, (k, default, max_k, b)
                seen.add(b)
            import math
            assert len(seen) <= math.ceil(math.log2(max_k)) + 2, \
                (default, max_k, sorted(seen))


def test_socket_mixed_traffic_stress(packed):
    """8 concurrent TCP connections interleaving good searches,
    malformed typed requests, oversized top_k, and unknown cmds: every
    line gets a JSON reply on its own connection (no drops, no
    cross-talk), and good requests still return correct results."""
    import socket
    import threading

    from swimm_tpu.server import make_socket_server

    Server, Handler, srv, batcher = make_socket_server(
        packed, _cfg(), max_top_k=8)
    tcp = Server(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=tcp.serve_forever,
                         kwargs={"poll_interval": 0.05}, daemon=True)
    t.start()
    port = tcp.server_address[1]
    q = synth_queries(1, [36], seed=41)[0]
    good = {"queries": [{"title": "g", "seq": decode(q.codes)}]}
    bads = MALFORMED + [{"queries": [{"seq": "ACD"}], "top_k": 9999},
                        {"cmd": "restart"}]
    results = [None] * 8

    def client(i):
        with socket.create_connection(("127.0.0.1", port), timeout=120) as s:
            f = s.makefile("rw", encoding="utf-8")
            got = []
            for j in range(6):
                req = dict(good if (i + j) % 2 == 0 else
                           bads[(i + j) % len(bads)])
                req["id"] = i * 100 + j
                f.write(json.dumps(req) + "\n")
                f.flush()
                got.append(json.loads(f.readline()))
            results[i] = got

    try:
        ts = [threading.Thread(target=client, args=(i,)) for i in range(8)]
        for th in ts:
            th.start()
        for th in ts:
            th.join(timeout=180)
        direct = SearchServer(packed, _cfg()).handle(good)
        for i, got in enumerate(results):
            assert got is not None, f"client {i} hung"
            for j, resp in enumerate(got):
                assert resp["id"] == i * 100 + j        # no cross-talk
                if (i + j) % 2 == 0:
                    assert "error" not in resp, resp
                    assert resp["results"] == direct["results"]
                else:
                    assert "error" in resp and "error_kind" in resp
    finally:
        tcp.shutdown()
        tcp.server_close()
        batcher.stop()
