"""Adaptive-precision ladder: narrow-first scoring + overflow recheck.

Parity target: reference components C9 + the section-4.4 control flow
(SURVEY.md): score everything in a saturating narrow tier, flag saturated
lanes, recompute only the affected blocks at the next wider tier. The
invariant — the ladder's final scores are IDENTICAL to a single all-exact
pass — is the contract (tested in tests/test_ladder.py).

TPU-honest note (SURVEY.md section 8 "int8 on TPU is not SSE int8"): on this
stack Mosaic cannot compile int16/int8 VPU arithmetic at all, and measured
bf16/int32 elementwise throughput is identical — narrow dtypes buy ZERO
speed on v5e, unlike SSE/AVX2 where int8 is 4x int32. The exact f32 kernel
(integers exact to 2^24) is therefore already the fastest tier, and the
engine's default path uses it directly. This module still implements the
full ladder semantics — saturating tiers with the reference's int8/int16
ceilings, per-lane saturation flags, block-granularity recompute — because
(a) it is part of the reference's behavioral surface (BASELINE configs 2
and 5), and (b) on a toolchain where narrow integer tiles become available
the tier kernels drop in unchanged.

Tier ceilings mirror the reference's ladder: 127 (int8-class), 32767
(int16-class), None (exact).
"""

from __future__ import annotations

from functools import lru_cache as _functools_lru_cache

import numpy as np

INT8_CEIL = 127
INT16_CEIL = 32767
DEFAULT_TIERS = (INT8_CEIL, INT16_CEIL, None)


def _score(codes, qp, gap_open, gap_extend, ceiling, backend):
    import jax.numpy as jnp
    if backend == "pallas":
        from swimm_tpu.ops import pallas_scorer
        return pallas_scorer.score_chunk(codes, qp, gap_open, gap_extend,
                                         ceiling=ceiling)
    from swimm_tpu.ops import xla_scorer
    return xla_scorer.score_chunk(codes, qp, gap_open, gap_extend,
                                  ceiling=ceiling)


def max_possible_score(query_len: int, seq_len: int,
                       matrix="BLOSUM62") -> int:
    """Conservative upper bound on any local-alignment score for this
    (query length, db sequence length) pair: the shorter sequence fully
    matched at the matrix's best diagonal score. Used for length-bucketed
    tier selection (BASELINE config 5: mixed-precision lanes with
    length-sorted packing — short chunks provably cannot overflow the
    narrow tier, so their recheck scan is skipped)."""
    import numpy as np

    from swimm_tpu.matrices import get_matrix
    mat = get_matrix(matrix) if isinstance(matrix, str) else matrix
    return int(min(query_len, seq_len) * int(np.diag(mat).max()))


def _pow2(n: int) -> int:
    return 1 << max(int(np.ceil(np.log2(max(n, 1)))), 0)


def _gather_substream(tiles, outrow, pending, jt, V):
    """Gather the pending blocks' tiles into a pow2-padded sub-stream
    (bounded set of compiled shapes for the recompute passes).

    Returns (sub_tiles, sub_outrow, nr_pad) numpy arrays."""
    from swimm_tpu.alphabet import PAD_CODE
    sel = np.isin(outrow, pending)
    sub_tiles = tiles[sel]
    remap = {int(g): i for i, g in enumerate(pending)}
    sub_outrow = np.fromiter((remap[int(g)] for g in outrow[sel]),
                             np.int32, count=int(sel.sum()))
    nr_pad = _pow2(len(pending) + 1)
    t_pad = _pow2(sub_tiles.shape[0])
    if t_pad != sub_tiles.shape[0]:
        extra = t_pad - sub_tiles.shape[0]
        sub_tiles = np.concatenate(
            [sub_tiles, np.full((extra, jt, V), PAD_CODE, np.int8)])
        sub_outrow = np.concatenate(
            [sub_outrow, np.full(extra, nr_pad - 1, np.int32)])
    return sub_tiles, sub_outrow, nr_pad


@_functools_lru_cache(maxsize=64)
def _stacked_tiles_scorer(backend: str, n_rows: int, gap_open: int,
                          gap_extend: int, ceiling, interpret):
    """One jitted dispatch scoring a tile stream against a STACK of query
    profiles (Q kernel calls fused into one program; Q and m are traced
    shapes, so each (Q, m) pair compiles once per (ceiling, n_rows))."""
    import jax
    import jax.numpy as jnp

    if backend == "pallas":
        from swimm_tpu.ops import pallas_scorer

        def f(tiles, outrow, qps):
            return jnp.stack([
                pallas_scorer.score_tiles(
                    tiles, outrow, n_rows, qps[i], gap_open, gap_extend,
                    ceiling=ceiling, interpret=interpret)
                for i in range(qps.shape[0])])
    else:
        from swimm_tpu.ops import xla_scorer

        def f(tiles, outrow, qps):
            return jnp.stack([
                xla_scorer.score_tiles(
                    tiles, outrow, n_rows, qps[i], gap_open, gap_extend,
                    ceiling=ceiling)
                for i in range(qps.shape[0])])

    return jax.jit(f)


@_functools_lru_cache(maxsize=64)
def _stacked_topk_scorer(backend: str, n_rows: int, gap_open: int,
                         gap_extend: int, ceiling, kk: int, interpret):
    """One jitted dispatch: score a tile stream against a STACK of query
    profiles at a saturating ceiling, and return per query (a) the
    per-block saturation flags and (b) the top-kk (clamped score, flat
    lane index) candidates — NOT the full (Q, n_rows, V) score tensor.
    Only O(Q * (n_rows + kk)) bytes leave the device (VERDICT r2 weak #1:
    the full-tensor pull was the batched ladder's bottleneck)."""
    import jax
    import jax.numpy as jnp

    if backend == "pallas":
        from swimm_tpu.ops import pallas_scorer
        scorer = lambda t, o, qp: pallas_scorer.score_tiles(
            t, o, n_rows, qp, gap_open, gap_extend, ceiling=ceiling,
            interpret=interpret)
    else:
        from swimm_tpu.ops import xla_scorer
        scorer = lambda t, o, qp: xla_scorer.score_tiles(
            t, o, n_rows, qp, gap_open, gap_extend, ceiling=ceiling)

    def f(tiles, outrow, qps, mask):
        flags, vs, idxs = [], [], []
        for i in range(qps.shape[0]):
            s = scorer(tiles, outrow, qps[i])            # (n_rows, V)
            if ceiling is None:
                flags.append(jnp.zeros((s.shape[0],), bool))
            else:
                flags.append((s >= ceiling).any(axis=1))
            v, idx = jax.lax.top_k(jnp.where(mask, s.reshape(-1), -1), kk)
            vs.append(v)
            idxs.append(idx)
        return jnp.stack(flags), jnp.stack(vs), jnp.stack(idxs)

    return jax.jit(f)


@_functools_lru_cache(maxsize=64)
def _fused_gathered_topk_scorer(backend: str, nr_pad: int, gap_open: int,
                                gap_extend: int, ceiling, kk: int,
                                interpret):
    """Tier-t escalation fused over EVERY pending query: one program
    gathers each query's own flagged blocks from the resident tile
    stream (per-query tidx rows) and scores them, so a tier costs one
    dispatch and THREE result pulls total — instead of one dispatch plus
    three pulls PER QUERY. Each pull is a full host<->device round trip
    (~55 ms measured through the dev tunnel), which made the per-query
    form the dominant ladder overhead at Swiss-Prot scale (~2 s for a
    20-query batch; VERDICT r2 weak #1 follow-through).

    Shapes: tidx/souts (nq, T_pad), qps (nq, 32, m), mask_sub
    (nq, nr_pad*V); nq/T_pad are pow2-padded by the caller so compiled
    shapes stay bounded. Returns (flags (nq, nr_pad), v (nq, kk),
    idx (nq, kk))."""
    import jax
    import jax.numpy as jnp

    if backend == "pallas":
        from swimm_tpu.ops import pallas_scorer
        scorer = lambda t, o, qp: pallas_scorer.score_tiles(
            t, o, nr_pad, qp, gap_open, gap_extend, ceiling=ceiling,
            interpret=interpret)
    else:
        from swimm_tpu.ops import xla_scorer
        scorer = lambda t, o, qp: xla_scorer.score_tiles(
            t, o, nr_pad, qp, gap_open, gap_extend, ceiling=ceiling)

    def f(tiles_all, tidx, souts, qps, mask_sub):
        flags, vs, idxs = [], [], []
        for qi in range(tidx.shape[0]):
            sub = jnp.take(tiles_all, tidx[qi], axis=0)  # HBM->HBM
            s = scorer(sub, souts[qi], qps[qi])          # (nr_pad, V)
            if ceiling is None:
                flags.append(jnp.zeros((s.shape[0],), bool))
            else:
                flags.append((s >= ceiling).any(axis=1))
            v, i = jax.lax.top_k(
                jnp.where(mask_sub[qi], s.reshape(-1), -1), kk)
            vs.append(v)
            idxs.append(i)
        return jnp.stack(flags), jnp.stack(vs), jnp.stack(idxs)

    return jax.jit(f)


def topk_db_adaptive_serving(packed, groups, k: int, gap_open: int,
                             gap_extend: int, tiers=DEFAULT_TIERS,
                             matrix="BLOSUM62", backend: str = "pallas",
                             interpret: bool | None = None,
                             dev_tiles=None, dev_outrow=None):
    """The batched ladder's SERVING form across padded-length groups
    (VERDICT r2 next-step #2, r3 restructure): every tier's dispatches
    for every group are queued asynchronously before any result is
    pulled, and each escalation tier runs as ONE fused program whose
    rows device-gather only each query's OWN flagged blocks — so (a) no
    host sync sits between group dispatches, (b) no database bytes are
    re-uploaded for
    recompute, and (c) tier-t compute is the sum of each query's OWN
    pending blocks, not |union| x Q.

    Args:
      groups: list of (qps (Qg, 32, m_pad) int32, lens (Qg,)) — one
        entry per padded-length group (engine.group_by_m_pad).

    Returns (per-group list of per-query (vals, sorted_idx) candidate
    arrays in global hit order, stats). Candidate-merge exactness: same
    finalization argument as the module docstring of
    topk_db_adaptive_batch, applied per query; a dispatch's candidates
    count only for blocks that FINALIZED for that query at that tier.
    """
    import jax.numpy as jnp

    from swimm_tpu.matrices import get_matrix

    tiles, outrow, n_rows = packed.flat_tiles()
    mask, l2s = packed.lane_maps()
    V = int(packed.manifest["V"])
    mask2d = mask.reshape(n_rows, V)
    tb = np.bincount(outrow, minlength=n_rows)
    cum = np.concatenate([[0], np.cumsum(tb)]).astype(np.int64)
    if tiers[-1] is not None:
        tiers = tuple(tiers) + (None,)
    mat = get_matrix(matrix) if isinstance(matrix, str) else matrix
    maxdiag = int(np.diag(np.asarray(mat)).max())
    blockmax = packed.block_max_lengths()
    all_bound_max = int(min(max((l for _, lens in groups for l in lens),
                                default=0), int(blockmax.max()) if n_rows
                            else 0) * maxdiag)
    kept = []
    for t in tiers:
        kept.append(t)
        if t is not None and t >= all_bound_max:
            kept[-1] = None
            break
    tiers = tuple(kept)

    if dev_tiles is None:
        dev_tiles = jnp.asarray(tiles)
        dev_outrow = jnp.asarray(outrow)
    mask_dev = jnp.asarray(mask)

    kk = min(k, n_rows * V) if n_rows else 0
    stats = {"tier_ceilings": list(tiers), "tier_blocks": [n_rows]}
    if kk == 0:
        return [[(np.zeros(0, np.int32), np.zeros(0, np.int64))
                 for _ in range(int(qps.shape[0]))]
                for qps, _ in groups], stats

    # ---- tier 1: one stacked dispatch per group, ALL queued first ----
    handles = []
    for qps, lens in groups:
        step = _stacked_topk_scorer(backend, n_rows, gap_open, gap_extend,
                                    tiers[0], kk, interpret)
        handles.append(step(dev_tiles, dev_outrow, jnp.asarray(qps),
                            mask_dev))

    # drain tier 1 through ONE pull per output array: concat the groups'
    # (flags, v, idx) on device, pull 3 arrays total instead of 3 per
    # group (utils/devio.py — at 16 groups that is 48 round trips, each
    # 55 ms-1.8 s on this tunnel depending on epoch)
    if len(handles) > 1:
        from swimm_tpu.utils.devio import concat_groups
        cat = concat_groups(tuple(handles))
    else:
        cat = handles[0]
    flags_all, v_all, idx_all = (np.asarray(x) for x in cat)

    # per query: candidate rounds [(v, idx, rowmap, escalated_rows)]
    # and current pending-block set
    rounds = []          # [group][query] -> list of rounds
    pend_all = []        # [group][query] -> np rows pending
    row0 = 0
    for gi, (qps, lens) in enumerate(groups):
        nq = int(qps.shape[0])
        flags = flags_all[row0:row0 + nq]
        v = v_all[row0:row0 + nq]
        idx = idx_all[row0:row0 + nq]
        row0 += nq
        g_rounds, g_pend = [], []
        bounds = (np.minimum(np.asarray(lens, np.int64)[:, None],
                             blockmax[None, :]) * maxdiag)
        for q in range(int(qps.shape[0])):
            p = (np.nonzero(flags[q] & (bounds[q] > tiers[0]))[0]
                 if tiers[0] is not None else np.zeros(0, np.int64))
            g_rounds.append([(v[q], idx[q],
                              np.arange(n_rows, dtype=np.int64), p)])
            g_pend.append(p)
        rounds.append(g_rounds)
        pend_all.append(g_pend)

    # ---- tiers 2..: device-gathered escalation, FUSED per tier ----
    # One program + three pulls per tier for the whole batch (see
    # _fused_gathered_topk_scorer). Exactness of the shape unification:
    # every pending query is padded to the tier-wide pow2 (T_pad,
    # nr_pad, m_max) — pad tiles gather tile 0 but write the trash row,
    # pad lanes are masked to -1 (filtered by the rv >= 0 finalization
    # rule), and extra profile columns score PAD_SCORE so they cannot
    # contribute a positive-scoring alignment (the same argument that
    # lets group_by_m_pad share a dispatch across query lengths).
    if tiers[0] is not None:
        from swimm_tpu.alphabet import PAD_SCORE
        for tier in tiers[1:]:
            entries = [(gi, q) for gi, (qps_g, _) in enumerate(groups)
                       for q in range(int(qps_g.shape[0]))
                       if len(pend_all[gi][q])]
            total_pend = sum(len(pend_all[gi][q]) for gi, q in entries)
            stats["tier_blocks"].append(int(total_pend))
            if not entries:
                break
            nr_pad = _pow2(max(len(pend_all[gi][q])
                               for gi, q in entries) + 1)
            tiles_per = [int((cum[pend_all[gi][q] + 1]
                              - cum[pend_all[gi][q]]).sum())
                         for gi, q in entries]
            T_pad = _pow2(max(tiles_per))
            nq_pad = _pow2(len(entries))
            m_max = max(groups[gi][0].shape[2] for gi, q in entries)
            n_alpha = groups[0][0].shape[1]
            tidx = np.zeros((nq_pad, T_pad), np.int32)
            souts = np.full((nq_pad, T_pad), nr_pad - 1, np.int32)
            mask_sub = np.zeros((nq_pad, nr_pad * V), bool)
            qps_sub = np.full((nq_pad, n_alpha, m_max), PAD_SCORE,
                              np.int32)
            for e, (gi, q) in enumerate(entries):
                pend = pend_all[gi][q]
                ti = np.concatenate(
                    [np.arange(cum[g], cum[g + 1]) for g in pend])
                tidx[e, :len(ti)] = ti
                souts[e, :len(ti)] = np.repeat(
                    np.arange(len(pend), dtype=np.int32),
                    [cum[g + 1] - cum[g] for g in pend])
                mask_sub[e, :len(pend) * V] = mask2d[pend].reshape(-1)
                qp = groups[gi][0][q]
                qps_sub[e, :, :qp.shape[1]] = qp
            kk_t = min(k, nr_pad * V)
            sub_step = _fused_gathered_topk_scorer(
                backend, nr_pad, gap_open, gap_extend, tier, kk_t,
                interpret)
            sflags_a, sv_a, sidx_a = sub_step(
                dev_tiles, jnp.asarray(tidx), jnp.asarray(souts),
                jnp.asarray(qps_sub), jnp.asarray(mask_sub))
            sflags_a = np.asarray(sflags_a)
            sv_a = np.asarray(sv_a)
            sidx_a = np.asarray(sidx_a)
            for e, (gi, q) in enumerate(entries):
                pend = pend_all[gi][q]
                sflags = sflags_a[e][:len(pend)]
                lens = groups[gi][1]
                bound_q = (np.minimum(int(lens[q]), blockmax[pend])
                           * maxdiag)
                new_p = (pend[sflags & (bound_q > tier)]
                         if tier is not None else np.zeros(0, np.int64))
                rowmap = np.zeros(nr_pad, np.int64)
                rowmap[:len(pend)] = pend
                rounds[gi][q].append((sv_a[e], sidx_a[e], rowmap, new_p))
                pend_all[gi][q] = new_p
            if tier is None:
                break

    # ---- host merge per query (finalization rule + dedupe) ----
    out = []
    for gi in range(len(groups)):
        g_out = []
        for q_rounds in rounds[gi]:
            allv, alli = [], []
            for rv, ridx, rowmap, rpend in q_rounds:
                keep = rv >= 0
                if not keep.any():
                    continue
                li = ridx[keep]
                vq = rv[keep]
                grow = rowmap[li // V]
                fin = ~np.isin(grow, rpend)
                gflat = grow * V + (li % V)
                allv.append(vq[fin])
                alli.append(l2s[gflat[fin]].astype(np.int64))
            if not allv:
                g_out.append((np.zeros(0, np.int32),
                              np.zeros(0, np.int64)))
                continue
            v_all = np.concatenate(allv)
            i_all = np.concatenate(alli)
            _, first = np.unique(i_all, return_index=True)
            v_all, i_all = v_all[first], i_all[first]
            order = np.lexsort((i_all, -v_all))[:k]
            g_out.append((v_all[order], i_all[order]))
        out.append(g_out)
    return out, stats


def topk_db_adaptive_batch(packed, qps, query_lens, k: int, gap_open: int,
                           gap_extend: int, tiers=DEFAULT_TIERS,
                           matrix="BLOSUM62", backend: str = "pallas",
                           interpret: bool | None = None,
                           dev_tiles=None, dev_outrow=None):
    """Batched precision ladder with DEVICE-SIDE candidate return — the
    serving form of score_db_adaptive_batch (VERDICT r2 next-step #2).

    Control flow per SURVEY.md section 4.4, but each tier's dispatch
    reduces on device to per-query top-k (clamped score, lane) candidates
    plus per-block saturation flags; the host escalates only the union of
    flagged blocks and MERGES candidate lists instead of re-ranking full
    score vectors.

    Exactness of the candidate merge (tested bit-identical to the exact
    path in tests/test_ladder.py): for a query q, call a block "finalized
    at tier t" if it was scored at t and not flagged-for-escalation for q
    (its clamped score provably equals the exact score: either below the
    ceiling, or its upper bound is). Every lane's block finalizes at
    exactly one tier for q. If lane x is in q's true top-k, then x is in
    the top-k of the dispatch where its block finalized: any lane ranked
    above x there has clamped >= clamped(x) = exact(x), and clamped is a
    lower bound of exact, so it also outranks x in the exact global
    (score desc, index asc) order — with >= k such lanes x could not be
    in the true top-k. Candidates from non-finalized (q, block) pairs are
    dropped (their clamped scores are not final for q); pairs another
    query escalated but q finalized earlier re-appear with identical
    values and are deduped.

    Returns (per-query list of (vals, sorted_idx) candidate arrays in
    global hit order, stats dict). Since r3 this is a single-group
    wrapper over topk_db_adaptive_serving (one implementation of the
    tiering + merge logic).
    """
    out, stats = topk_db_adaptive_serving(
        packed, [(np.asarray(qps), list(query_lens))], k, gap_open,
        gap_extend, tiers=tiers, matrix=matrix, backend=backend,
        interpret=interpret, dev_tiles=dev_tiles, dev_outrow=dev_outrow)
    return out[0], stats


def score_db_adaptive_batch(packed, qps, query_lens, gap_open: int,
                            gap_extend: int, tiers=DEFAULT_TIERS,
                            matrix="BLOSUM62", backend: str = "pallas",
                            interpret: bool | None = None,
                            dev_tiles=None, dev_outrow=None):
    """Whole-database precision ladder for a BATCH of queries — the
    SURVEY.md section 4.4 control flow fused into batch serving
    (VERDICT r1 next-step #4; BASELINE config 2).

    One saturating tier-1 dispatch covers every (query, block) pair; the
    recompute pass gathers the UNION of the per-query flagged blocks into
    one sub-stream and re-scores it against the whole batch in one
    dispatch per tier. Patching a (query, block) pair that query did not
    flag is exact: its tier-1 score was strictly below the ceiling, so the
    wider recompute returns the identical value.

    Args:
      qps: (Q, 32, m) int32 stacked query profiles (common m_pad).
      query_lens: (Q,) true query lengths (per-query score upper bounds —
        length-sorted packing makes short blocks provably narrow,
        BASELINE config 5).

    Returns (scores (Q, n_rows, V) int32 — bit-identical to exact passes —
    and a stats dict with per-tier union block counts).
    """
    import jax.numpy as jnp

    from swimm_tpu.matrices import get_matrix

    tiles, outrow, n_rows = packed.flat_tiles()
    V = int(packed.manifest["V"])
    jt = tiles.shape[1]
    Q = int(qps.shape[0])
    if tiers[-1] is not None:
        tiers = tuple(tiers) + (None,)
    mat = get_matrix(matrix) if isinstance(matrix, str) else matrix
    maxdiag = int(np.diag(np.asarray(mat)).max())
    lens = np.asarray(query_lens, np.int64)
    bounds = (np.minimum(lens[:, None],
                         packed.block_max_lengths()[None, :]) * maxdiag)

    kept = []
    for t in tiers:
        kept.append(t)
        if t is not None and t >= int(bounds.max()):
            kept[-1] = None
            break
    tiers = tuple(kept)

    if dev_tiles is None:
        dev_tiles = jnp.asarray(tiles)
        dev_outrow = jnp.asarray(outrow)
    qps_dev = jnp.asarray(qps)

    step = _stacked_tiles_scorer(backend, n_rows, gap_open, gap_extend,
                                 tiers[0], interpret)
    scores = np.array(step(dev_tiles, dev_outrow, qps_dev))  # (Q, nr, V)
    stats = {"tier_ceilings": list(tiers), "tier_blocks": [n_rows]}
    if tiers[0] is None or len(tiers) == 1:
        return scores, stats

    pend = [np.nonzero((scores[q] >= tiers[0]).any(axis=1)
                       & (bounds[q] > tiers[0]))[0] for q in range(Q)]
    for tier in tiers[1:]:
        union = np.unique(np.concatenate(pend)) if pend else \
            np.zeros(0, np.int64)
        stats["tier_blocks"].append(int(len(union)))
        if len(union) == 0:
            break
        sub_tiles, sub_outrow, nr_pad = _gather_substream(
            tiles, outrow, union, jt, V)
        sub_step = _stacked_tiles_scorer(backend, nr_pad, gap_open,
                                         gap_extend, tier, interpret)
        wider = np.asarray(sub_step(jnp.asarray(sub_tiles),
                                    jnp.asarray(sub_outrow),
                                    qps_dev))[:, :len(union)]  # (Q, U, V)
        scores[:, union] = wider
        if tier is None:
            break
        pend = [union[(wider[q] >= tier).any(axis=1)
                      & (bounds[q][union] > tier)] for q in range(Q)]
    return scores, stats


def score_db_adaptive(packed, qp, query_len: int, gap_open: int,
                      gap_extend: int, tiers=DEFAULT_TIERS,
                      matrix="BLOSUM62", interpret: bool | None = None,
                      dev_tiles=None, dev_outrow=None):
    """Whole-database precision ladder over the ragged tile stream.

    The SURVEY.md section 4.4 control flow at BLOCK granularity across the
    ENTIRE database in one kernel dispatch per tier: a saturating
    first-tier pass over every block, then recompute passes over only the
    blocks that (a) saturated and (b) are not PROVABLY under the ceiling —
    the per-block score upper bound min(query_len, block_max_len) *
    max_diag (length-sorted packing makes short blocks provably narrow:
    BASELINE config 5's mixed-precision lanes). Recompute sub-streams are
    padded to power-of-two shapes so tier passes reuse a bounded set of
    compiled programs.

    Returns (scores (n_rows, V) int32 — bit-identical to an exact pass —
    and a stats dict with per-tier block counts).
    """
    import jax.numpy as jnp

    from swimm_tpu.ops import pallas_scorer

    from swimm_tpu.matrices import get_matrix

    tiles, outrow, n_rows = packed.flat_tiles()
    V = int(packed.manifest["V"])
    jt = tiles.shape[1]
    if tiers[-1] is not None:
        tiers = tuple(tiers) + (None,)   # guarantee the exact final tier
    mat = get_matrix(matrix) if isinstance(matrix, str) else matrix
    maxdiag = int(np.diag(np.asarray(mat)).max())
    bounds = np.minimum(query_len, packed.block_max_lengths()) * maxdiag

    # drop tiers that can never be exceeded by ANY block
    kept = []
    for t in tiers:
        kept.append(t)
        if t is not None and t >= int(bounds.max()):
            kept[-1] = None          # covering tier needs no ceiling
            break
    tiers = tuple(kept)

    if dev_tiles is None:
        dev_tiles = jnp.asarray(tiles)
        dev_outrow = jnp.asarray(outrow)
    scores = np.array(pallas_scorer.score_tiles(
        dev_tiles, dev_outrow, n_rows, qp, gap_open, gap_extend,
        ceiling=tiers[0], interpret=interpret))
    stats = {"tier_ceilings": list(tiers), "tier_blocks": [n_rows]}
    if tiers[0] is None or len(tiers) == 1:
        return scores, stats

    pending = np.nonzero((scores >= tiers[0]).any(axis=1)
                         & (bounds > tiers[0]))[0]
    for tier in tiers[1:]:
        stats["tier_blocks"].append(int(len(pending)))
        if len(pending) == 0:
            break
        sub_tiles, sub_outrow, nr_pad = _gather_substream(
            tiles, outrow, pending, jt, V)
        wider = np.asarray(pallas_scorer.score_tiles(
            jnp.asarray(sub_tiles), jnp.asarray(sub_outrow), nr_pad,
            qp, gap_open, gap_extend, ceiling=tier,
            interpret=interpret))[:len(pending)]
        scores[pending] = wider
        if tier is None:
            break
        pending = pending[(wider >= tier).any(axis=1)
                          & (bounds[pending] > tier)]
    return scores, stats


def score_chunk_adaptive(codes, qp, gap_open: int, gap_extend: int,
                         tiers=DEFAULT_TIERS, backend: str = "pallas",
                         upper_bound: int | None = None):
    """Score one packed chunk through the precision ladder.

    Reference control flow (SURVEY.md section 4.4):

        scores8, sat8   = kernel_int8(all blocks)
        blocks16        = blocks containing any saturated lane
        scores16, sat16 = kernel_int16(blocks16)
        ...
        final = widest available score per lane

    Escalation granularity is the block (a whole 128-lane row group), since
    the kernel scores blocks, not single lanes.

    Returns (n_blocks, V) int32 scores, bit-identical to an exact pass.
    """
    import jax.numpy as jnp

    if tiers[-1] is not None:
        tiers = tuple(tiers) + (None,)   # guarantee the exact final tier
    # length-bucketed tier truncation: the first tier whose ceiling covers
    # the provable score bound is exact for every lane, so deeper tiers
    # (and, if it's the FIRST tier, the whole recheck scan) are dropped
    # (SURVEY.md section 3 "precision parallelism"; BASELINE config 5).
    if upper_bound is not None:
        kept = []
        for t in tiers:
            kept.append(t)
            if t is not None and t >= upper_bound:
                break
        tiers = tuple(kept)

    codes_np = np.asarray(codes)
    codes = jnp.asarray(codes_np)
    scores = np.array(_score(codes, qp, gap_open, gap_extend,
                             tiers[0], backend))
    stats = {"tier_ceilings": list(tiers),
             "tier_blocks": [int(codes.shape[0])]}
    if tiers[0] is None or len(tiers) == 1:
        return scores, stats

    # blocks with any lane saturated at the previous tier's ceiling
    pending = np.nonzero((scores >= tiers[0]).any(axis=1))[0]
    for tier in tiers[1:]:
        stats["tier_blocks"].append(int(len(pending)))
        if len(pending) == 0:
            break
        sub = jnp.asarray(np.ascontiguousarray(codes_np[pending]))
        wider = np.asarray(_score(sub, qp, gap_open, gap_extend,
                                  tier, backend))
        scores[pending] = wider
        if tier is None:
            break
        pending = pending[(wider >= tier).any(axis=1)]
    return scores, stats
