"""Data-parallel sharded search with collective top-k merge (L3).

Parity target: reference component C12 + C13 (SURVEY.md sections 3, 4.3,
6.8). The reference's hybrid mode dynamically ships DB chunks over PCIe to
Xeon Phis and collects per-device score buffers; the TPU-native design
inverts this: DB blocks are *resident*, sharded over the mesh 'data' axis,
query profiles are replicated (or sharded over 'query' for batches), and the
merge is ``per-shard lax.top_k -> all_gather -> final top_k`` so only
k candidates per shard ever cross the interconnect (BASELINE config 4:
"per-shard top-256 hits merged via collectives").

One jitted step = score one packed chunk for a batch of queries + merge.
The same code path runs on a 1-device mesh (single chip), an N-chip slice
(ICI), or a multi-host pod (DCN via jax.distributed) — the mesh is the only
thing that changes.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from swimm_tpu.db import PackedDb
from swimm_tpu.models.profile import build_query_profile
from swimm_tpu.utils.metrics import PhaseTimer, SearchMetrics

TOPK_PER_SHARD = 256  # BASELINE config 4


def _backend_score_chunk(backend: str):
    if backend == "pallas":
        from swimm_tpu.ops import pallas_scorer
        return pallas_scorer.score_chunk
    from swimm_tpu.ops import xla_scorer
    return xla_scorer.score_chunk


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "gap_open", "gap_extend", "backend", "k",
                     "precision"))
def sharded_chunk_topk(codes, qps, *, mesh, gap_open, gap_extend,
                       backend="pallas", k=TOPK_PER_SHARD,
                       precision="f32"):
    """Score one chunk for Q queries on a ('data','query') mesh; return the
    exact per-query top-k over this chunk.

    Args:
      codes: (B, L, V) int8; B must be divisible by the 'data' axis size.
      qps: (Q, 32, m) int32 stacked query profiles; Q divisible by 'query'
        axis size.

    Returns:
      vals: (Q, n_data*k) int32 candidate scores (sorted desc per shard
        group, exact top-k of the chunk within the first k after a final
        merge), and
      idx: (Q, n_data*k) int32 flat lane indices (block*V + lane) into the
        chunk, aligned with vals.
    """
    B, L, V = codes.shape
    n_data = mesh.shape["data"]
    score = _backend_score_chunk(backend)
    kk = min(k, (B // n_data) * V)

    def local(codes_l, qps_l):
        # codes_l: (B/n_data, L, V); qps_l: (Q/n_query, 32, m)
        di = jax.lax.axis_index("data")
        Bl = codes_l.shape[0]
        base = di * (Bl * V)

        def one(qp):
            if backend == "pallas":
                s = score(codes_l, qp, gap_open, gap_extend,
                          precision=precision)
            else:
                s = score(codes_l, qp, gap_open, gap_extend)
            return s.reshape(-1)

        scores = jnp.stack([one(qps_l[i]) for i in range(qps_l.shape[0])])
        v, i = jax.lax.top_k(scores, kk)              # (Ql, kk) local
        gi = (i + base).astype(jnp.int32)
        # gather candidates from every data shard (k values each — only
        # k*n_data ints cross the interconnect, never full score vectors)
        vg = jax.lax.all_gather(v, "data", axis=1)     # (Ql, n_data, kk)
        ig = jax.lax.all_gather(gi, "data", axis=1)
        Ql = vg.shape[0]
        return (vg.reshape(Ql, n_data * kk), ig.reshape(Ql, n_data * kk))

    vals, idx = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None, None), P("query", None, None)),
        out_specs=(P("query", None), P("query", None)),
        check_vma=False,
    )(codes, qps)
    return vals, idx


import weakref

_SHARDED_CHUNK_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def shard_chunk_arrays(codes: np.ndarray, mesh, db=None,
                       chunk_id=None) -> tuple[jnp.ndarray, int]:
    """Pad a chunk's block axis to the data-axis size and device_put it
    sharded over ('data', None, None). Returns (device array, padded B).

    With db/chunk_id set, the sharded device array is cached (weak-keyed on
    the PackedDb) and reused across queries — device-resident DB."""
    if db is not None:
        per_db = _SHARDED_CHUNK_CACHE.setdefault(db, {})
        hit = per_db.get((chunk_id, mesh))
        if hit is not None:
            return hit
    n_data = mesh.shape["data"]
    B = codes.shape[0]
    Bp = ((B + n_data - 1) // n_data) * n_data
    if Bp != B:
        from swimm_tpu.alphabet import PAD_CODE
        pad = np.full((Bp - B,) + codes.shape[1:], PAD_CODE, dtype=codes.dtype)
        codes = np.concatenate([codes, pad], axis=0)
    sharding = NamedSharding(mesh, P("data", None, None))
    out = (jax.device_put(codes, sharding), Bp)
    if db is not None:
        per_db[(chunk_id, mesh)] = out
    return out


def pad_queries(qps: np.ndarray, mesh) -> np.ndarray:
    """Pad the query axis to the 'query' mesh axis size (with all-PAD
    profiles that score 0 everywhere)."""
    from swimm_tpu.alphabet import PAD_SCORE
    nq = mesh.shape["query"]
    Q = qps.shape[0]
    Qp = ((Q + nq - 1) // nq) * nq
    if Qp != Q:
        pad = np.full((Qp - Q,) + qps.shape[1:], PAD_SCORE, dtype=qps.dtype)
        qps = np.concatenate([qps, pad], axis=0)
    return qps


def sharded_search(packed: PackedDb, queries, config=None, mesh=None,
                   topk_per_shard: int = TOPK_PER_SHARD):
    """Batched, sharded search over a whole PackedDb.

    Queries are padded to a common profile length and batched into one
    launch per chunk (deliberate divergence from the reference's serial
    query loop, SURVEY.md section 4.5). Exactness: the final per-query
    hit list is exact as long as config.top_k <= topk_per_shard.

    Returns (list[QueryResult], SearchMetrics).
    """
    from swimm_tpu.models.engine import Hit, QueryResult, SearchConfig

    config = config or SearchConfig()
    if mesh is None:
        from swimm_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    if config.top_k > topk_per_shard:
        raise ValueError("top_k must be <= topk_per_shard for exact merge")
    backend = config.resolve_backend()
    timer = PhaseTimer()
    t0 = time.perf_counter()

    # Common padded profile length across the batch.
    m_max = max(max(q.length for q in queries), 1)
    m_pad = -(-m_max // config.m_multiple) * config.m_multiple
    with timer.phase("profiles"):
        qps = np.stack([_fixed_profile(q, config, m_pad) for q in queries])
        qps = pad_queries(qps, mesh)
    qps_dev = jax.device_put(
        qps, NamedSharding(mesh, P("query", None, None)))

    Q = len(queries)
    # per-query candidate pools across chunks (host-side merge, C13)
    pool_v = [[] for _ in range(Q)]
    pool_i = [[] for _ in range(Q)]
    for ch in packed.chunks:
        with timer.phase("h2d"):
            codes_dev, Bp = shard_chunk_arrays(
                np.ascontiguousarray(ch.codes), mesh,
                db=packed, chunk_id=ch.chunk_id)
        with timer.phase("score+merge"):
            vals, idx = sharded_chunk_topk(
                codes_dev, qps_dev, mesh=mesh, gap_open=config.gap_open,
                gap_extend=config.gap_extend, backend=backend,
                k=topk_per_shard, precision=("f32" if config.precision ==
                                             "adaptive" else config.precision))
            vals = np.asarray(vals)[:Q]
            idx = np.asarray(idx)[:Q]
        for qi in range(Q):
            # map chunk-local flat lane -> sorted db index; drop pad lanes
            lane = idx[qi]
            valid = lane < ch.n_seqs
            pool_v[qi].append(vals[qi][valid])
            pool_i[qi].append(lane[valid] + ch.base)

    results = []
    with timer.phase("final_topk"):
        for qi, q in enumerate(queries):
            v = np.concatenate(pool_v[qi])
            i = np.concatenate(pool_i[qi])
            k = min(config.top_k, len(v))
            order = np.lexsort((i, -v))[:k]
            hits = [Hit(r + 1, int(v[j]), int(i[j]),
                        int(packed.orig_index[i[j]]),
                        packed.title_of_sorted(int(i[j])))
                    for r, j in enumerate(order)]
            results.append(QueryResult(q.title, q.length, hits))

    seconds = time.perf_counter() - t0
    total_q = sum(q.length for q in queries)
    padded = sum(ch.n_blocks * ch.L * ch.V for ch in packed.chunks) * m_pad * Q
    metrics = SearchMetrics(
        cells=int(packed.total_residues) * total_q,
        padded_cells=padded,
        n_db_seqs=packed.n_seqs, n_queries=Q, seconds=seconds,
        timers=timer.report())
    return results, metrics


def _fixed_profile(q, config, m_pad):
    from swimm_tpu.alphabet import PAD_CODE
    codes = np.full(m_pad, PAD_CODE, dtype=np.uint8)
    codes[:q.length] = q.codes
    # build_query_profile pads to a multiple; feeding the pre-padded codes
    # with m_multiple=1..  keeps every query at the common m_pad length.
    return build_query_profile(codes, config.matrix, m_multiple=1)
