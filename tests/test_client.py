"""`swtpu query` client (swimm_tpu/client.py) against an in-process
TCP server: output parity with local search rendering, per-request
options, connection-failure UX, and the no-JAX import guarantee."""

import json
import subprocess
import sys
import threading

import pytest

from swimm_tpu.alphabet import decode
from swimm_tpu.db import build_db
from swimm_tpu.fasta import write_fasta
from swimm_tpu.models.engine import SearchConfig
from swimm_tpu.utils.synth import synth_db, synth_queries


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """A live TCP server over a tiny packed DB; yields (packed, port)."""
    from swimm_tpu.server import make_socket_server
    tmp = tmp_path_factory.mktemp("clidb")
    write_fasta(tmp / "db.fasta", synth_db(120, seed=31))
    packed = build_db(str(tmp / "db.fasta"), tmp / "packed", V=16)
    Server, Handler, srv, batcher = make_socket_server(
        packed, SearchConfig(backend="xla", top_k=4, evalue=True))
    tcp = Server(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=tcp.serve_forever,
                         kwargs={"poll_interval": 0.05}, daemon=True)
    t.start()
    yield packed, tcp.server_address[1]
    tcp.shutdown()
    tcp.server_close()
    batcher.stop()


@pytest.fixture()
def qfasta(tmp_path):
    qs = synth_queries(2, [34, 52], seed=32)
    path = tmp_path / "q.fasta"
    write_fasta(path, qs)
    return path


def test_client_module_never_imports_jax():
    # this machine's sitecustomize preloads some jax modules at
    # interpreter start, so assert on the DELTA: importing the client
    # (and the CLI shell it rides in) must add no jax modules
    out = subprocess.run(
        [sys.executable, "-c",
         "import sys; base = set(sys.modules); "
         "import swimm_tpu.client, swimm_tpu.cli; "
         "bad = [m for m in set(sys.modules) - base if m == 'jax' or "
         "m.startswith('jax.')]; print(bad); sys.exit(1 if bad else 0)"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stdout + out.stderr


def test_query_table_output(served, qfasta, capsys):
    from swimm_tpu.cli import main
    _, port = served
    rc = main(["query", "-q", str(qfasta),
               "--server", f"127.0.0.1:{port}"])
    assert rc == 0
    out = capsys.readouterr()
    assert out.out.count("Query: ") == 2
    assert "E-value" in out.out            # server posture carries --evalue
    assert "(34 aa)" in out.out            # client-side length annotation
    assert "GCUPS" in out.err


def test_query_m8_and_topk(served, qfasta, capsys):
    from swimm_tpu.cli import main
    _, port = served
    rc = main(["query", "-q", str(qfasta), "-r", "2", "--format", "m8",
               "--server", f"127.0.0.1:{port}"])
    assert rc == 0
    rows = [l for l in capsys.readouterr().out.splitlines() if l]
    assert len(rows) == 4                  # 2 queries x top-2
    assert all(len(r.split("\t")) == 12 for r in rows)


def test_query_align_blocks(served, tmp_path, capsys):
    from swimm_tpu.cli import main
    from swimm_tpu.fasta import FastaRecord
    packed, port = served
    # a db sequence as the query: the self-hit alignment is all-identity
    codes = packed.seq_codes(0)
    path = tmp_path / "self.fasta"
    write_fasta(path, [FastaRecord("selfq", codes)])
    rc = main(["query", "-q", str(path), "-r", "1", "--align",
               "--server", f"127.0.0.1:{port}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert f"Identities = {len(codes)}/{len(codes)} (100%)" in out
    assert "Query      1 " in out and "Sbjct      1 " in out


def test_query_json_output(served, qfasta, capsys):
    from swimm_tpu.cli import main
    _, port = served
    rc = main(["query", "-q", str(qfasta), "--format", "json",
               "--server", f"127.0.0.1:{port}"])
    assert rc == 0
    resp = json.loads(capsys.readouterr().out)
    assert len(resp["results"]) == 2
    assert resp["metrics"]["n_queries"] == 2


def test_query_connection_errors(qfasta, capsys):
    from swimm_tpu.cli import main
    # no server on this port
    rc = main(["query", "-q", str(qfasta), "--server", "127.0.0.1:1",
               "--timeout", "5"])
    assert rc == 2
    assert "cannot reach server" in capsys.readouterr().err
    rc = main(["query", "-q", str(qfasta), "--server", "nonsense"])
    assert rc == 2
    assert "HOST:PORT" in capsys.readouterr().err


def test_query_lengths_parser():
    from swimm_tpu.client import _query_lengths
    text = ">a one\nMKV LM\nACD\n>b\n\n>c two\nWWWW*\n"
    assert _query_lengths(text) == {"a one": 8, "b": 0, "c two": 5}


def test_query_cmd_ping_and_info(served, capsys):
    from swimm_tpu.cli import main
    packed, port = served
    rc = main(["query", "--cmd", "ping", "--server", f"127.0.0.1:{port}"])
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["ok"] is True
    rc = main(["query", "--cmd", "info", "--server", f"127.0.0.1:{port}"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out)["info"]
    assert info["n_seqs"] == packed.n_seqs
    assert info["rss_mb"] is None or info["rss_mb"] > 0


def test_query_requires_fasta_or_cmd(served):
    from swimm_tpu.cli import main
    _, port = served
    rc = main(["query", "--server", f"127.0.0.1:{port}"])
    assert rc == 2     # friendly error, not a traceback
