"""Data-parallel sharded search with collective top-k merge (L3).

Parity target: reference component C12 + C13 (SURVEY.md sections 3, 4.3,
6.8). The reference's hybrid mode dynamically ships DB chunks over PCIe to
Xeon Phis and collects per-device score buffers; the TPU-native design
inverts this: DB blocks are *resident*, sharded over the mesh 'data' axis,
query profiles are replicated (or sharded over 'query' for batches), and the
merge is ``per-shard lax.top_k -> all_gather -> final top_k`` so only
k candidates per shard ever cross the interconnect (BASELINE config 4:
"per-shard top-256 hits merged via collectives").

One jitted step = the WHOLE database (sharded ragged tile streams) for a
batch of queries + merge; long queries route through the ragged long-query
kernel inside the same shard_map. The same code path runs on a 1-device
mesh (single chip), an N-chip slice (ICI), or a multi-host pod (DCN via
jax.distributed) — the mesh is the only thing that changes.
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


def _local_score_topk(backend, precision, n_rows_local, gap_open,
                      gap_extend, kk, with_hist=False):
    """Per-shard body shared by the fused and split sharded steps: score the
    local ragged tile sub-stream for every local query, mask pad lanes,
    take the local top-kk, translate to sorted-db indices.

    with_hist=True (E-value statistics): the body takes a replicated
    (n_seqs,) ln-length bin table as an extra arg, computes each query's
    LOCAL score histogram over the shard's valid lanes (bin of a lane =
    bin_table[lane2sorted]), and returns it alongside — shards partition
    the valid lanes (the same property the candidate exactness rests
    on), so a psum over 'data' reproduces the whole-DB histogram the
    resident fused path computes. Counts are integers in f32, so the
    reduction is exact in any order."""

    def local(tiles_l, outrow_l, valid_l, lane2sorted_l, qps_l,
              *bin_table):
        tiles_l = tiles_l[0]
        outrow_l = outrow_l[0]
        valid_l = valid_l[0]
        lane2sorted_l = lane2sorted_l[0]

        def one(qp):
            if backend == "pallas":
                from swimm_tpu.ops import longquery, pallas_scorer
                if qp.shape[1] > pallas_scorer.max_query_pad():
                    s = longquery.score_tiles_long(
                        tiles_l, outrow_l, n_rows_local, qp,
                        gap_open, gap_extend, precision=precision)
                else:
                    s = pallas_scorer.score_tiles(
                        tiles_l, outrow_l, n_rows_local, qp,
                        gap_open, gap_extend, precision=precision)
            else:
                from swimm_tpu.ops import xla_scorer
                s = xla_scorer.score_tiles(
                    tiles_l, outrow_l, n_rows_local, qp,
                    gap_open, gap_extend)
            return jnp.where(valid_l, s.reshape(-1), -1)

        scores = jnp.stack([one(qps_l[i]) for i in range(qps_l.shape[0])])
        v, i = jax.lax.top_k(scores, kk)
        if with_hist:
            from swimm_tpu.models.engine import hist_from_scores
            from swimm_tpu.utils import stats
            seg_l = bin_table[0][lane2sorted_l]
            w_l = valid_l.astype(jnp.float32)
            hists = jnp.stack([
                hist_from_scores(scores[qi], seg_l, w_l,
                                 stats.N_LEN_BINS, stats.SCORE_CAP + 1)
                for qi in range(scores.shape[0])])
            return v, lane2sorted_l[i], hists
        return v, lane2sorted_l[i]                      # (Ql, kk) each

    return local


_SHARD_IN_SPECS = (P("data", None, None, None), P("data", None),
                   P("data", None), P("data", None), P("query", None, None))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "n_rows_local", "gap_open", "gap_extend",
                     "backend", "k", "precision"))
def sharded_tiles_topk(tiles_all, outrow_all, valid_all, lane2sorted_all,
                       qps, *, mesh, n_rows_local, gap_open, gap_extend,
                       backend="pallas", k=TOPK_PER_SHARD, precision="f32"):
    """Whole-DB sharded search in ONE dispatch: each data shard scores its
    ragged tile sub-stream with a single score_tiles kernel call, masks pad
    lanes, takes its local top-k, and all_gathers candidates over 'data'.

    Args (leading axis = 'data' shard; see build_tile_shards):
      tiles_all:       (n_data, T_max, 32, V) int8
      outrow_all:      (n_data, T_max) int32 local output rows (trash row =
                       n_rows_local - 1 for padding tiles)
      valid_all:       (n_data, n_rows_local * V) bool true-lane mask
      lane2sorted_all: (n_data, n_rows_local * V) int32 -> sorted db index
      qps:             (Q, 32, m) int32, Q divisible by the 'query' axis

    Returns (vals, idx): (Q, n_data*k) candidate scores + sorted-db indices.
    """
    n_data = mesh.shape["data"]
    V = tiles_all.shape[-1]
    kk = min(k, n_rows_local * V)
    body = _local_score_topk(backend, precision, n_rows_local, gap_open,
                             gap_extend, kk)

    def local(*args):
        v, gi = body(*args)
        vg = jax.lax.all_gather(v, "data", axis=1)     # (Ql, n_data, kk)
        ig = jax.lax.all_gather(gi, "data", axis=1)
        Ql = vg.shape[0]
        return (vg.reshape(Ql, n_data * kk), ig.reshape(Ql, n_data * kk))

    vals, idx = jax.shard_map(
        local, mesh=mesh,
        in_specs=_SHARD_IN_SPECS,
        out_specs=(P("query", None), P("query", None)),
        check_vma=False,
    )(tiles_all, outrow_all, valid_all, lane2sorted_all, qps)
    return vals, idx


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "n_rows_local", "gap_open", "gap_extend",
                     "backend", "k", "precision"))
def sharded_tiles_topk_hist(tiles_all, outrow_all, valid_all,
                            lane2sorted_all, qps, bin_table, *, mesh,
                            n_rows_local, gap_open, gap_extend,
                            backend="pallas", k=TOPK_PER_SHARD,
                            precision="f32"):
    """sharded_tiles_topk + E-value statistics: each shard also
    accumulates its local score histogram per query and the histograms
    psum over 'data' — one extra (Q, 32, 512) replicated output, no
    extra score pass. bin_table: replicated (n_seqs,) ln-length bin ids
    (utils/stats.length_bins)."""
    n_data = mesh.shape["data"]
    V = tiles_all.shape[-1]
    kk = min(k, n_rows_local * V)
    body = _local_score_topk(backend, precision, n_rows_local, gap_open,
                             gap_extend, kk, with_hist=True)

    def local(*args):
        v, gi, hists = body(*args)
        hg = jax.lax.psum(hists, "data")               # exact: int counts
        vg = jax.lax.all_gather(v, "data", axis=1)
        ig = jax.lax.all_gather(gi, "data", axis=1)
        Ql = vg.shape[0]
        return (vg.reshape(Ql, n_data * kk), ig.reshape(Ql, n_data * kk),
                hg)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=_SHARD_IN_SPECS + (P(None),),
        out_specs=(P("query", None), P("query", None),
                   P("query", None, None)),
        check_vma=False,
    )(tiles_all, outrow_all, valid_all, lane2sorted_all, qps, bin_table)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "n_rows_local", "gap_open", "gap_extend",
                     "backend", "k", "precision"))
def sharded_tiles_local_topk(tiles_all, outrow_all, valid_all,
                             lane2sorted_all, qps, *, mesh, n_rows_local,
                             gap_open, gap_extend, backend="pallas",
                             k=TOPK_PER_SHARD, precision="f32"):
    """Stage 1 of the SPLIT sharded step: local scoring + per-shard top-k,
    NO communication — outputs stay sharded over ('query', 'data'). Pair
    with merge_candidates (stage 2) to time the collective top-k merge
    separately (BASELINE north-star metric #3)."""
    kk = min(k, n_rows_local * tiles_all.shape[-1])
    body = _local_score_topk(backend, precision, n_rows_local, gap_open,
                             gap_extend, kk)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=_SHARD_IN_SPECS,
        out_specs=(P("query", "data"), P("query", "data")),
        check_vma=False,
    )(tiles_all, outrow_all, valid_all, lane2sorted_all, qps)


@functools.partial(jax.jit, static_argnames=("mesh",))
def merge_candidates(vals, idx, *, mesh):
    """Stage 2 of the split sharded step: the top-k merge collective.
    Reshards the (Q, n_data*k) candidate arrays from P('query','data') to
    P('query', None) — XLA lowers this to an all-gather over 'data' riding
    ICI/DCN; this dispatch's wall time IS the merge latency."""
    spec = NamedSharding(mesh, P("query", None))
    return (jax.lax.with_sharding_constraint(vals, spec),
            jax.lax.with_sharding_constraint(idx, spec))


import weakref

_TILE_SHARD_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def plan_tile_shards(packed: PackedDb, n_data: int):
    """Host-side shard plan for the whole-DB ragged tile stream.

    Blocks are split into n_data contiguous groups balanced by TILE count
    (compute is proportional to tiles, not blocks — the TPU analog of the
    reference's dynamic chunk balancing, SURVEY.md section 4.3). Each
    shard's stream is padded to a common T_max with PAD tiles routed to a
    trash output row, so every device runs the same static shapes.

    Returns (shapes, build) where shapes = dict(T_max=..., R_loc=..., V=...)
    and build(d) -> (tiles_d, outrow_d, valid_d, l2s_d) numpy arrays for
    shard d — so a multi-host process can materialize ONLY its devices'
    shards (parallel/distributed.py)."""
    from swimm_tpu.alphabet import PAD_CODE
    tiles, outrow, n_rows = packed.flat_tiles()
    mask, lane2sorted = packed.lane_maps()
    V = int(packed.manifest["V"])
    tb = np.bincount(outrow, minlength=n_rows)      # tiles per block
    cum = np.concatenate([[0], np.cumsum(tb)])
    T = int(cum[-1])
    # contiguous block cuts at ~equal tile totals
    targets = (np.arange(1, n_data) * T) // n_data
    cuts = np.searchsorted(cum, targets, side="left")
    bounds = np.concatenate([[0], cuts, [n_rows]])

    R_loc = int(max(bounds[d + 1] - bounds[d] for d in range(n_data))) + 1
    T_max = max(int(max(cum[bounds[d + 1]] - cum[bounds[d]]
                        for d in range(n_data))), 1)
    from swimm_tpu.ops.pallas_scorer import RESIDENT_TILE_CAP
    if T_max > RESIDENT_TILE_CAP:
        raise ValueError(
            f"per-shard tile stream ({T_max} tiles over {n_data} data "
            f"shards) exceeds the single-dispatch scalar-prefetch "
            f"capacity ({RESIDENT_TILE_CAP}, ops/pallas_scorer.py) — "
            "use more data shards or the streamed super-window posture "
            "(--sharded --stream)")

    def build(d: int):
        g0, g1 = int(bounds[d]), int(bounds[d + 1])
        t0, t1 = int(cum[g0]), int(cum[g1])
        tiles_d = np.full((T_max, tiles.shape[1], V), PAD_CODE, np.int8)
        outrow_d = np.full((T_max,), R_loc - 1, np.int32)
        valid_d = np.zeros((R_loc * V,), bool)
        l2s_d = np.zeros((R_loc * V,), np.int32)
        tiles_d[:t1 - t0] = tiles[t0:t1]
        outrow_d[:t1 - t0] = outrow[t0:t1] - g0
        nlane = (g1 - g0) * V
        valid_d[:nlane] = mask[g0 * V:g1 * V]
        l2s_d[:nlane] = lane2sorted[g0 * V:g1 * V]
        return tiles_d, outrow_d, valid_d, l2s_d

    return {"T_max": T_max, "R_loc": R_loc, "V": V, "n_data": n_data,
            "jt": tiles.shape[1]}, build


def build_tile_shards(packed: PackedDb, mesh):
    """Device-resident tile shards over the 'data' mesh axis (single-host
    path: all shards built locally and device_put sharded). Returns
    (tiles_all, outrow_all, valid_all, lane2sorted_all, n_rows_local);
    weak-cached per (db, mesh). Multi-host jobs use
    parallel.distributed.global_tile_shards instead."""
    per_db = _TILE_SHARD_CACHE.setdefault(packed, {})
    hit = per_db.get(mesh)
    if hit is not None:
        return hit

    n_data = int(mesh.shape["data"])
    shapes, build = plan_tile_shards(packed, n_data)
    parts = [build(d) for d in range(n_data)]
    stacked = [np.stack([p[i] for p in parts]) for i in range(4)]

    put = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    out = (put(stacked[0], P("data", None, None, None)),
           put(stacked[1], P("data", None)),
           put(stacked[2], P("data", None)),
           put(stacked[3], P("data", None)),
           shapes["R_loc"])
    per_db[mesh] = out
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


def _device_to_host(x) -> np.ndarray:
    """Fetch a (possibly multi-process-sharded) device array to every host.

    Single-process arrays are fully addressable, so a plain synced asarray
    suffices; in a jax.distributed job the output is sharded over processes
    and must be allgathered host-side first."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(jax.block_until_ready(x))


def sharded_search(packed: PackedDb, queries, config=None, mesh=None,
                   topk_per_shard: int = TOPK_PER_SHARD, tile_shards=None,
                   measure_merge: bool = False):
    """Batched, sharded search over a whole PackedDb.

    Queries are padded to a common profile length and batched into one
    launch per chunk (deliberate divergence from the reference's serial
    query loop, SURVEY.md section 4.5). Exactness: the final per-query
    hit list is exact as long as config.top_k <= topk_per_shard.

    tile_shards: pre-assembled device shards (the tuple returned by
    build_tile_shards / distributed.global_tile_shards). Multi-host jobs
    MUST pass distributed.global_tile_shards(packed, mesh) so each host
    materializes only its own slice; default builds all shards locally.

    measure_merge: run the split two-dispatch form (local score+top-k,
    then the merge collective as its own dispatch) so the top-k merge
    latency lands in timers['merge'] (BASELINE north-star metric #3).
    Default is the fused single-dispatch form (timers['score+merge']).

    precision='ladder' (and 'adaptive') serve through the exact f32 pass
    here: the ladder's host-driven escalation cannot run inside the
    jitted shard_map, and the exact pass returns bit-identical hit lists
    by the ladder invariant (ops/ladder.py) — only the tiering control
    flow differs, which the single-chip driver demonstrates.

    Returns (list[QueryResult], SearchMetrics).
    """
    from swimm_tpu.models.engine import Hit, QueryResult, SearchConfig

    config = config or SearchConfig()
    if mesh is None:
        from swimm_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    if config.top_k > topk_per_shard:
        raise ValueError("top_k must be <= topk_per_shard for exact merge")
    if config.evalue and measure_merge:
        raise ValueError(
            "evalue=True and measure_merge=True do not combine: the "
            "merge-latency measurement mode times the bare collective "
            "(no histogram reduction) — drop one of the two")
    backend = config.resolve_backend()
    timer = PhaseTimer()
    t0 = time.perf_counter()

    # Queries grouped by padded profile length (r2): one sharded dispatch
    # per m_pad group, like the fused serving path — padding every query
    # to the batch MAX wasted ~30-40% of the rows on mixed 100-500aa
    # batches. Groups share the device-resident tile shards.
    from swimm_tpu.models.engine import group_by_m_pad
    mm = config.m_multiple
    groups = group_by_m_pad(queries, mm)

    Q = len(queries)
    precision = ("f32" if config.precision in ("adaptive", "ladder")
                 else config.precision)
    # whole-DB per-shard ragged kernel + collective candidate gather
    # (BASELINE config 4); long queries route through the ragged
    # long-query kernel inside the same shard_map
    with timer.phase("h2d"):
        if tile_shards is None:
            tile_shards = build_tile_shards(packed, mesh)
        tiles_all, outrow_all, valid_all, l2s_all, R_loc = tile_shards
    kwargs = dict(mesh=mesh, n_rows_local=R_loc, gap_open=config.gap_open,
                  gap_extend=config.gap_extend, backend=backend,
                  k=topk_per_shard, precision=precision)

    all_v = [None] * Q
    all_i = [None] * Q
    all_h = [None] * Q
    bin_table_dev = None
    if config.evalue:
        from swimm_tpu.utils import stats
        bin_ids, bin_logl = stats.length_bins(packed.lengths)
        bin_table_dev = jax.device_put(
            bin_ids, NamedSharding(mesh, P(None)))
    padded_rows = 0
    pending = []
    for m_pad, positions in sorted(groups.items()):
        with timer.phase("profiles"):
            qps = np.stack([_fixed_profile(queries[p], config, m_pad)
                            for p in positions])
            qps = pad_queries(qps, mesh)
        qps_dev = jax.device_put(
            qps, NamedSharding(mesh, P("query", None, None)))
        padded_rows += m_pad * qps.shape[0]
        if measure_merge:
            with timer.phase("score"):
                lv, li = sharded_tiles_local_topk(
                    tiles_all, outrow_all, valid_all, l2s_all, qps_dev,
                    **kwargs)
                jax.block_until_ready((lv, li))
            with timer.phase("merge"):
                vals, idx = merge_candidates(lv, li, mesh=mesh)
                jax.block_until_ready((vals, idx))
            pending.append((positions, vals, idx))
        elif config.evalue:
            with timer.phase("score+merge"):
                vals, idx, hists = sharded_tiles_topk_hist(
                    tiles_all, outrow_all, valid_all, l2s_all, qps_dev,
                    bin_table_dev, **kwargs)
                pending.append((positions, vals, idx, hists))
        else:
            with timer.phase("score+merge"):
                vals, idx = sharded_tiles_topk(
                    tiles_all, outrow_all, valid_all, l2s_all, qps_dev,
                    **kwargs)
                pending.append((positions, vals, idx, None))
    drain_phase = "d2h" if measure_merge else "score+merge"
    with timer.phase(drain_phase):
        for positions, vals, idx, *rest in pending:
            # explicit sync so the timers are honest even if the host
            # conversion is ever refactored away (VERDICT r1 #7)
            gv = _device_to_host(vals)
            gi = _device_to_host(idx)
            gh = (_device_to_host(rest[0])
                  if rest and rest[0] is not None else None)
            for row, p in enumerate(positions):
                all_v[p] = gv[row]
                all_i[p] = gi[row]
                if gh is not None:
                    all_h[p] = gh[row]
    # the dispatched work includes each shard's PAD-tile padding
    lane_positions = int(np.prod(tiles_all.shape))

    results = []
    with timer.phase("final_topk"):
        for qi, q in enumerate(queries):
            keep = all_v[qi] >= 0
            v = all_v[qi][keep]
            i = all_i[qi][keep]
            k = min(config.top_k, len(v))
            order = np.lexsort((i, -v))[:k]
            hits = [Hit(r + 1, int(v[j]), int(i[j]),
                        int(packed.orig_index[i[j]]),
                        packed.title_of_sorted(int(i[j])))
                    for r, j in enumerate(order)]
            if all_h[qi] is not None:
                from swimm_tpu.utils import stats
                model = stats.fit_evalue_model_hist(all_h[qi], bin_logl)
                stats.attach_evalues(hits, model, packed.lengths)
            results.append(QueryResult(q.title, q.length, hits))

    seconds = time.perf_counter() - t0
    total_q = sum(q.length for q in queries)
    # honest padded accounting: shard-padded lane positions x the padded
    # query rows actually dispatched (incl. the query-axis pad to Qp)
    padded = lane_positions * padded_rows
    timers = timer.report()
    merge_stats = timer.event_stats("merge")
    if merge_stats is not None:
        # one merge collective runs per m_pad group; the BASELINE "merge
        # latency" metric is the per-collective number, not the sum
        timers["merge_collectives"] = merge_stats
    metrics = SearchMetrics(
        cells=int(packed.total_residues) * total_q,
        padded_cells=padded,
        n_db_seqs=packed.n_seqs, n_queries=Q, seconds=seconds,
        timers=timers)
    return results, metrics


def _fixed_profile(q, config, m_pad):
    from swimm_tpu.alphabet import PAD_CODE
    codes = np.full(m_pad, PAD_CODE, dtype=np.uint8)
    codes[:q.length] = q.codes
    # build_query_profile pads to a multiple; feeding the pre-padded codes
    # with m_multiple=1..  keeps every query at the common m_pad length.
    return build_query_profile(codes, config.matrix, m_multiple=1)
