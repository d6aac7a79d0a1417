"""m8 (BLAST tabular) output format: swimm_tpu/formats.py + CLI wiring.

Column semantics are checked against hand-derivable cases (a planted
self-hit: 100% identity, full-length coordinates, zero mismatches/gaps)
and against the traceback's own counters; the CLI tests assert the
--format flag surface, its conflicts (posture-combination validation,
VERDICT r2 weak #3 convention), and that m8 mode keeps stdout pure TSV.
"""

import numpy as np
import pytest

from swimm_tpu.cli import main
from swimm_tpu.fasta import FastaRecord, write_fasta
from swimm_tpu.formats import _count_gap_opens, _seqid, m8_rows
from swimm_tpu.models.engine import SearchConfig, search
from swimm_tpu.ops.traceback import sw_align
from swimm_tpu.utils.synth import synth_db, synth_queries


def test_count_gap_opens():
    assert _count_gap_opens("ABC") == 0
    assert _count_gap_opens("A-BC") == 1
    assert _count_gap_opens("A--B-C") == 2
    assert _count_gap_opens("-AB-") == 2


def test_seqid_first_token():
    assert _seqid("sp|P02232|HBB desc here") == "sp|P02232|HBB"
    assert _seqid("plain") == "plain"
    assert _seqid("") == ""


def _mini_search(tmp_path, evalue: bool):
    from swimm_tpu.db import build_db
    recs = synth_db(80, seed=11)
    q = FastaRecord("q0 myquery", recs[17].codes.copy())  # exact self-hit
    dbfa = tmp_path / "db.fasta"
    write_fasta(dbfa, recs)
    packed = build_db(str(dbfa), tmp_path / "packed", V=16)
    cfg = SearchConfig(top_k=5, backend="xla", evalue=evalue)
    results, _ = search(packed, [q], cfg)
    return packed, q, results[0]


def test_m8_rows_self_hit_geometry(tmp_path):
    packed, q, result = _mini_search(tmp_path, evalue=False)
    aligns = [sw_align(q.codes, packed.seq_codes(h.sorted_idx))
              for h in result.hits]
    rows = m8_rows(result, aligns)
    assert len(rows) == len(result.hits)
    top = rows[0].split("\t")
    assert len(top) == 12
    n = len(q.codes)
    # the planted identical sequence: full-length 100% identity alignment
    assert top[0] == "q0"
    assert float(top[2]) == 100.0           # pident
    assert int(top[3]) == n                 # alignment length
    assert int(top[4]) == 0 and int(top[5]) == 0   # mismatch, gapopen
    assert (int(top[6]), int(top[7])) == (1, n)    # qstart, qend (1-based)
    assert (int(top[8]), int(top[9])) == (1, n)
    assert top[10] == "*" and top[11] == "*"       # no statistics posture
    # internal consistency on every row: mismatch + identity + gaps = length
    for row, a in zip(rows, aligns):
        c = row.split("\t")
        assert int(c[4]) == a.length - a.n_identity - a.n_gaps
        assert int(c[7]) - int(c[6]) + 1 == a.length - a.q_aln.count("-")
        assert int(c[9]) - int(c[8]) + 1 == a.length - a.d_aln.count("-")


def test_m8_rows_evalue_and_bits(tmp_path):
    packed, q, result = _mini_search(tmp_path, evalue=True)
    aligns = [sw_align(q.codes, packed.seq_codes(h.sorted_idx))
              for h in result.hits]
    rows = m8_rows(result, aligns)
    evs = [float(r.split("\t")[10]) for r in rows]
    bits = [float(r.split("\t")[11]) for r in rows]
    # self-hit must be overwhelmingly significant; E = n_db * 2^-bits'
    # tail relation means huge bits <-> tiny E
    assert evs[0] < 1e-6
    assert bits[0] > 20
    # bits must agree with the attached hit annotations (one source)
    for r, h in zip(rows, result.hits):
        assert float(r.split("\t")[11]) == pytest.approx(h.bits, abs=0.05)


def test_cli_m8(tmp_path, capsys):
    dbfa = tmp_path / "db.fasta"
    qfa = tmp_path / "q.fasta"
    dbdir = tmp_path / "packed"
    assert main(["synth", "-o", str(dbfa), "-n", "100", "--seed", "5"]) == 0
    write_fasta(qfa, synth_queries(2, [40, 60], seed=6))
    assert main(["preprocess", "-i", str(dbfa), "-o", str(dbdir),
                 "--lanes", "16"]) == 0
    capsys.readouterr()
    assert main(["search", "-d", str(dbdir), "-q", str(qfa),
                 "--backend", "xla", "-r", "4", "--format", "m8"]) == 0
    cap = capsys.readouterr()
    lines = [l for l in cap.out.splitlines() if l]
    assert len(lines) == 8                   # 2 queries x top 4, TSV only
    for line in lines:
        cols = line.split("\t")
        assert len(cols) == 12
        float(cols[10])                      # --format m8 implies --evalue
        float(cols[11])
    assert "GCUPS" in cap.err                # summary moved to stderr


def test_cli_m8_conflicts(tmp_path, capsys):
    dbfa = tmp_path / "db.fasta"
    qfa = tmp_path / "q.fasta"
    dbdir = tmp_path / "packed"
    assert main(["synth", "-o", str(dbfa), "-n", "40", "--seed", "5"]) == 0
    write_fasta(qfa, synth_queries(1, [30], seed=6))
    assert main(["preprocess", "-i", str(dbfa), "-o", str(dbdir),
                 "--lanes", "8"]) == 0
    capsys.readouterr()
    base = ["search", "-d", str(dbdir), "-q", str(qfa), "--backend", "xla"]
    assert main(base + ["--format", "m8", "--align"]) == 2
    assert "--align" in capsys.readouterr().err
    assert main(base + ["--format", "m8", "--query-pack"]) == 2
    assert "--query-pack" in capsys.readouterr().err
    assert main(base + ["--format", "table", "--json"]) == 2
    assert "--json" in capsys.readouterr().err
    # --json alone and --format json are the same thing, no conflict
    assert main(base + ["--format", "json", "--json"]) == 0
