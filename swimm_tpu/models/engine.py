"""Search driver (L4) + top-k results (L0).

Parity targets (SURVEY.md sections 3 and 4.2): the reference's ``search``
mode loads the packed DB, builds query profiles, dispatches the hot kernel
per (query, chunk) work item, merges per-chunk scores, and prints a ranked
top-k hit list with total GCUPS (components C11, C13, C14). On TPU the
OpenMP chunk scheduler collapses into the XLA grid — chunks are dispatched
sequentially from Python while XLA pipelines each dispatch on-device; the
per-thread score buffers become a single (n_seqs,) score vector.

Deliberate divergence from the reference (SURVEY.md section 4.5): queries
can be batched into one launch via the sharded path (parallel/); this serial
driver remains the bit-exactness anchor.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from swimm_tpu.db import PackedDb
from swimm_tpu.fasta import FastaRecord
from swimm_tpu.models.profile import build_query_profile
from swimm_tpu.utils.metrics import PhaseTimer, SearchMetrics


@dataclass
class SearchConfig:
    matrix: str = "BLOSUM62"
    gap_open: int = 10
    gap_extend: int = 2
    top_k: int = 16
    backend: str = "auto"       # auto | xla | pallas
    precision: str = "adaptive"  # adaptive (int16 first + int32 recheck) | int32
    m_multiple: int = 128        # query-length padding granularity

    def resolve_backend(self) -> str:
        if self.backend != "auto":
            return self.backend
        return "pallas" if jax.default_backend() == "tpu" else "xla"


@dataclass
class Hit:
    rank: int
    score: int
    sorted_idx: int
    orig_idx: int
    title: str


@dataclass
class QueryResult:
    query_title: str
    query_length: int
    hits: list

    def as_table(self) -> str:
        lines = [f"Query: {self.query_title} ({self.query_length} aa)",
                 f"{'rank':>4} {'score':>7}  title"]
        for h in self.hits:
            lines.append(f"{h.rank:>4} {h.score:>7}  {h.title}")
        return "\n".join(lines)


def _chunk_scorer(config: SearchConfig):
    backend = config.resolve_backend()
    if backend == "xla":
        from swimm_tpu.ops import xla_scorer
        return lambda codes, qp: xla_scorer.score_chunk(
            codes, qp, config.gap_open, config.gap_extend)
    elif backend == "pallas":
        from swimm_tpu.ops import ladder, longquery, pallas_scorer

        def dispatch(codes, qp):
            if qp.shape[1] > pallas_scorer.max_query_pad():
                # long-query tiled path (M5); always exact
                return longquery.score_chunk_long(
                    codes, qp, config.gap_open, config.gap_extend)
            if config.precision == "adaptive":
                return ladder.score_chunk_adaptive(
                    codes, qp, config.gap_open, config.gap_extend)[0]
            return pallas_scorer.score_chunk(
                codes, qp, config.gap_open, config.gap_extend,
                precision=config.precision)

        return dispatch
    raise ValueError(f"unknown backend {backend!r}")


def score_db(packed: PackedDb, query: FastaRecord,
             config: SearchConfig) -> np.ndarray:
    """All-lane scores for one query, in sorted-db order (n_seqs,)."""
    scorer = _chunk_scorer(config)
    qp = jnp.asarray(build_query_profile(query.codes, config.matrix,
                                         config.m_multiple))
    out = np.zeros(packed.n_seqs, dtype=np.int32)
    for ch in packed.chunks:
        scores = scorer(jnp.asarray(np.ascontiguousarray(ch.codes)), qp)
        flat = np.asarray(scores).reshape(-1)[:ch.n_seqs]
        out[ch.base:ch.base + ch.n_seqs] = flat
    return out


def top_k_hits(packed: PackedDb, scores: np.ndarray, k: int) -> list:
    """Component C13: rank scores descending, resolve titles.

    Ties broken by sorted index ascending (deterministic)."""
    k = min(k, len(scores))
    if k < len(scores):
        # include ALL candidates tied with the k-th score so the final
        # (score desc, index asc) order is deterministic at the boundary
        kth = np.partition(scores, len(scores) - k)[len(scores) - k]
        cand = np.nonzero(scores >= kth)[0]
    else:
        cand = np.arange(len(scores))
    idx = cand[np.lexsort((cand, -scores[cand]))][:k]
    return [Hit(r + 1, int(scores[i]), int(i), int(packed.orig_index[i]),
                packed.title_of_sorted(int(i)))
            for r, i in enumerate(idx)]


def search(packed: PackedDb, queries, config: SearchConfig | None = None):
    """Serial per-query search (reference call stack, SURVEY.md section 4.2).

    Returns (list[QueryResult], SearchMetrics).
    """
    config = config or SearchConfig()
    timer = PhaseTimer()
    results = []
    t0 = time.perf_counter()
    for q in queries:
        with timer.phase("score"):
            scores = score_db(packed, q, config)
        with timer.phase("topk"):
            hits = top_k_hits(packed, scores, config.top_k)
        results.append(QueryResult(q.title, q.length, hits))
    seconds = time.perf_counter() - t0

    total_q = sum(q.length for q in queries)
    m_pads = {q.title: -(-max(q.length, 1) // config.m_multiple) * config.m_multiple
              for q in queries}
    padded = sum(ch.n_blocks * ch.L * ch.V for ch in packed.chunks) * \
        sum(m_pads.values())
    metrics = SearchMetrics(
        cells=int(packed.total_residues) * total_q,
        padded_cells=padded,
        n_db_seqs=packed.n_seqs,
        n_queries=len(queries),
        seconds=seconds,
        timers=timer.report(),
    )
    return results, metrics
