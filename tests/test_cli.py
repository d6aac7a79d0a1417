import json

from swimm_tpu.cli import main
from swimm_tpu.fasta import write_fasta
from swimm_tpu.utils.synth import synth_db, synth_queries


def test_cli_pipeline(tmp_path, capsys):
    dbfa = tmp_path / "db.fasta"
    qfa = tmp_path / "q.fasta"
    dbdir = tmp_path / "packed"

    # synth
    assert main(["synth", "-o", str(dbfa), "-n", "120", "--seed", "2"]) == 0
    write_fasta(qfa, synth_queries(2, [30, 50], seed=4))

    # preprocess
    assert main(["preprocess", "-i", str(dbfa), "-o", str(dbdir),
                 "--lanes", "16"]) == 0
    out = capsys.readouterr().out
    assert "packed 120 sequences" in out

    # search (human output)
    assert main(["search", "-d", str(dbdir), "-q", str(qfa),
                 "--backend", "xla", "-r", "5"]) == 0
    out = capsys.readouterr().out
    assert "GCUPS" in out and "rank" in out

    # search (JSON output)
    assert main(["search", "-d", str(dbdir), "-q", str(qfa),
                 "--backend", "xla", "-r", "5", "--json"]) == 0
    payload = json.loads(capsys.readouterr().out)
    assert len(payload["results"]) == 2
    assert len(payload["results"][0]["hits"]) == 5
    assert payload["metrics"]["gcups"] > 0


def test_cli_clean_errors(tmp_path, capsys):
    qfa = tmp_path / "q.fasta"
    write_fasta(qfa, synth_queries(1, [30], seed=4))
    # missing DB dir
    assert main(["search", "-d", str(tmp_path / "nope"), "-q", str(qfa)]) == 2
    err = capsys.readouterr().err
    assert err.startswith("swtpu: error:") and "manifest.json" in err
    # unknown matrix
    dbfa = tmp_path / "db.fasta"
    dbdir = tmp_path / "packed"
    assert main(["synth", "-o", str(dbfa), "-n", "40", "--seed", "1"]) == 0
    assert main(["preprocess", "-i", str(dbfa), "-o", str(dbdir),
                 "--lanes", "8"]) == 0
    capsys.readouterr()
    assert main(["search", "-d", str(dbdir), "-q", str(qfa),
                 "-s", "BLOSUM63", "--backend", "xla"]) == 2
    err = capsys.readouterr().err
    assert "unknown substitution matrix" in err and "BLOSUM62" in err


def test_cli_info(tmp_path, capsys):
    dbfa = tmp_path / "db.fasta"
    dbdir = tmp_path / "packed"
    assert main(["synth", "-o", str(dbfa), "-n", "60", "--seed", "3"]) == 0
    assert main(["preprocess", "-i", str(dbfa), "-o", str(dbdir),
                 "--lanes", "8"]) == 0
    capsys.readouterr()
    assert main(["info", "-d", str(dbdir)]) == 0
    out = capsys.readouterr().out
    assert "sequences       60" in out and "tile stream" in out


def test_cli_selfcheck(tmp_path):
    from swimm_tpu.cli import main
    from swimm_tpu.db import build_db
    from swimm_tpu.fasta import write_fasta
    from swimm_tpu.utils.synth import synth_db, synth_queries

    queries = synth_queries(1, [50], seed=61)
    recs = synth_db(50, seed=62, median_len=60, sigma=0.3, max_len=120,
                    queries=[queries[0].codes], homolog_frac=0.1)
    write_fasta(tmp_path / "db.fasta", recs)
    write_fasta(tmp_path / "q.fasta", queries)
    build_db(tmp_path / "db.fasta", tmp_path / "db", V=8)
    assert main(["search", "-d", str(tmp_path / "db"),
                 "-q", str(tmp_path / "q.fasta"),
                 "--backend", "xla", "-r", "3", "--selfcheck"]) == 0
