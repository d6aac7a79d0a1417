"""Hit-list output formats (L0 reporting, reference component C13).

The reference prints one human table per query (scores + titles,
SURVEY.md section 3 C13). This module adds the interchange formats a
production search service is expected to emit alongside that table:

- ``m8`` — the BLAST tabular format (``blastp -outfmt 6`` / legacy
  ``-m 8`` / SSEARCH ``-m 8``), 12 tab-separated columns:
      qseqid sseqid pident length mismatch gapopen
      qstart qend sstart send evalue bitscore
  One row per (query, hit). Coordinates are 1-based inclusive, the
  universal m8 convention. Rows need alignment geometry, so the engine
  runs the host-side traceback on each reported hit (O(top_k * mn),
  same cost as --align; ops/traceback.py) — and inherits its full-stack
  exactness probe (traceback score must equal the device hit score).

  evalue: the empirical Gumbel fit (utils/stats.py). bitscore: the
  standard relation E = N * 2^(-bits) inverted on the SAME fitted null
  model — bits = surprise / ln 2 where E = n_db * exp(-surprise) — the
  empirical analog of BLAST's (lambda*S - ln K)/ln 2, exact under the
  fitted model instead of a precomputed K/lambda table. When statistics
  are off (no --evalue), both columns print ``*`` (the NCBI convention
  for not-computed fields).

m8 identifier columns use the first whitespace-delimited token of each
FASTA title (qseqid/sseqid), matching BLAST's Seq-id handling.
"""

from __future__ import annotations


def _seqid(title: str) -> str:
    tok = title.split()
    return tok[0] if tok else title


def _count_gap_opens(aln: str) -> int:
    """Number of gap RUNS in one aligned string ('-' runs)."""
    n = 0
    prev = False
    for c in aln:
        g = c == "-"
        if g and not prev:
            n += 1
        prev = g
    return n


def m8_rows(result, aligns) -> list:
    """Format one QueryResult + its per-hit Alignments as m8 rows.

    Args:
      result: engine.QueryResult (hits carry .evalue/.bits when the
        statistics posture ran — utils/stats.attach_evalues).
      aligns: list of ops.traceback.Alignment, parallel to result.hits.
    """
    rows = []
    qid = _seqid(result.query_title)
    for h, a in zip(result.hits, aligns):
        length = a.length
        mism = length - a.n_identity - a.n_gaps
        gapopen = (_count_gap_opens(a.q_aln)
                   + _count_gap_opens(a.d_aln))
        pident = 100.0 * a.n_identity / max(length, 1)
        ev = f"{h.evalue:.2g}" if h.evalue is not None else "*"
        bit_s = f"{h.bits:.1f}" if h.bits is not None else "*"
        rows.append("\t".join([
            qid, _seqid(h.title), f"{pident:.2f}", str(length),
            str(mism), str(gapopen),
            str(a.q_start + 1), str(a.q_end),
            str(a.d_start + 1), str(a.d_end),
            ev, bit_s]))
    return rows
