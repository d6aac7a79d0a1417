"""Window-major, batch-amortized, out-of-core DB streaming (L4).

Parity target (SURVEY.md section 4.3): the reference transfers the DB chunk
pool to each coprocessor ONCE per search ("offload_transfer in(db chunk
pool...)") and then scores every work item against the resident pool. The
round-2 streaming posture inverted that — it re-streamed the entire
database once per query, paying Q x the H2D traffic (VERDICT r2 missing
#1). This module restores the reference's transfer model under the
bounded-HBM posture:

- The tile stream is cut into fixed-shape windows ONCE per query batch.
- Each window is uploaded ONCE and scored against EVERY query in the batch
  (one stacked dispatch per padded-length group), so H2D traffic is one DB
  pass per batch, overlapped with ~Q windows of compute (jax async
  dispatch, at most ``max_in_flight`` windows of HBM alive).
- Two merge strategies (``SearchConfig.stream_scores``, default auto —
  see resolve_stream_scores):
  'buffer' — each window's (r_cap, V) score block is written into a
  persistent per-group device buffer (donated dynamic_update_slice);
  nothing crosses the link until one resident-style finalize (top-k +
  statistics) at the end. Zero mid-stream host round trips: on a
  high-latency link this is what makes streaming compute-bound instead
  of RTT-bound.
  'candidates' — per (window, query) device-side top-k; only (Q, k)
  candidate pairs return to the host, which merges windows by the global
  (score desc, index asc) order. O(k) device memory per query — the
  huge-DB fallback, and the contract the sharded super-window path uses.

Out-of-core (SURVEY.md section 3 C4 "mmap/fread"; VERDICT r2 missing #2):
windows are assembled DIRECTLY from the memmapped per-chunk code files —
``PackedDb.flat_tiles()`` (which materializes the whole DB in host RAM) is
never called, so peak host memory is O(window), not O(DB): a database
larger than host RAM streams fine.

Exactness of the per-window top-k + host merge: scores in other windows
cannot change the ranking inside a window, so any member of the global
top-k is inside its own window's top-k (lax.top_k's tie-break is lowest
index, the same total order as the global merge) — the union of
per-window candidates therefore contains the global top-k, and the host
lexsort reproduces the exact hit-list order of the resident path
(tested bit-identical in tests/test_stream.py).
"""

from __future__ import annotations

import weakref

import numpy as np


def stream_layout(packed, jt: int = 32):
    """Analytic tile-stream layout, computed from chunk METADATA only (no
    code arrays touched — memmaps stay cold). Matches flat_tiles() order:
    blocks in chunk order, each block's L/jt tiles consecutive.

    Returns dict(n_rows, T, cum (n_rows+1,) int64 cumulative tiles per
    block, chunk_tile0 / chunk_row0 per chunk, jt, V).
    """
    tb_parts, chunk_tile0, chunk_row0 = [], [], []
    row = 0
    t = 0
    for ch in packed.chunks:
        assert ch.L % jt == 0, (ch.L, jt)
        chunk_tile0.append(t)
        chunk_row0.append(row)
        tb_parts.append(np.full(ch.n_blocks, ch.L // jt, np.int64))
        row += ch.n_blocks
        t += ch.n_blocks * (ch.L // jt)
    tb = np.concatenate(tb_parts) if tb_parts else np.zeros(0, np.int64)
    cum = np.concatenate([[0], np.cumsum(tb)])
    return {"n_rows": row, "T": t, "cum": cum,
            "chunk_tile0": chunk_tile0, "chunk_row0": chunk_row0,
            "jt": jt, "V": int(packed.manifest["V"])}


def plan_windows(layout, window_tiles: int):
    """Cut the stream into windows at block boundaries.

    Returns (spans [(g0, g1) block ranges], r_cap = max blocks per window).
    Every window shares one compiled kernel shape (window_tiles tiles,
    r_cap + 1 output rows — the +1 is the trash row for padding tiles).

    Spans are BALANCED, not greedy-filled: with n_win = ceil(T /
    window_tiles) windows either way, boundaries sit at the block edges
    nearest w*T/n_win. Greedy filling concentrates all the padding in one
    nearly-empty tail window — at Swiss-Prot scale that is ~13% of the
    dispatched tiles, and every padded tile costs full kernel work (it
    scores into the trash row). Balancing bounds the total padding by
    n_win * (largest block) instead (~2%), at the same window count,
    compiled shape, and HBM bound (window_tiles is still the cap).
    """
    cum, n_rows = layout["cum"], layout["n_rows"]
    if n_rows == 0:
        return [], 0
    biggest = int((cum[1:] - cum[:-1]).max())
    if biggest > window_tiles:
        raise ValueError(
            f"window_tiles={window_tiles} is smaller than the largest DB "
            f"block ({biggest} tiles, ~{biggest * layout['jt']} residues); "
            "blocks cannot span windows — raise --window-tiles")
    T = int(cum[-1])
    n_win = -(-T // window_tiles)
    # block index whose tile range contains each even tile boundary
    bounds = [0]
    for w in range(1, n_win):
        g = int(np.searchsorted(cum, round(w * T / n_win), side="left"))
        bounds.append(min(max(g, bounds[-1] + 1), n_rows))
    bounds.append(n_rows)
    spans = []
    r_cap = 0
    fill_max = 0
    for g0, g1 in zip(bounds[:-1], bounds[1:]):
        if g1 <= g0:
            continue
        spans.append((g0, g1))
        r_cap = max(r_cap, g1 - g0)
        fill_max = max(fill_max, int(cum[g1] - cum[g0]))
    if fill_max > window_tiles:      # a huge block straddled a boundary:
        # fall back to greedy fill (still <= window_tiles per window)
        spans = []
        g0 = 0
        r_cap = 0
        while g0 < n_rows:
            g1 = int(np.searchsorted(cum, cum[g0] + window_tiles,
                                     side="right")) - 1
            g1 = max(g1, g0 + 1)
            spans.append((g0, g1))
            r_cap = max(r_cap, g1 - g0)
            g0 = g1
    return spans, r_cap


def effective_window_tiles(layout, spans, quantum: int = 64) -> int:
    """Dispatch width actually needed for this plan: the largest span
    fill, rounded up to `quantum` tiles (shape-cache friendliness). Every
    padded tile costs full kernel work (it scores into the trash row), so
    windows are allocated/dispatched at this width, not at the
    user-facing window_tiles HBM cap."""
    cum = layout["cum"]
    if not spans:
        return 0
    fill = max(int(cum[g1] - cum[g0]) for g0, g1 in spans)
    return -(-fill // quantum) * quantum


def _read_chunk_tiles_into(ch, lo: int, hi: int, jt: int, V: int,
                           out: np.ndarray) -> None:
    """Read tiles [lo, hi) of one chunk's (nb*L/jt, jt, V) tile view
    directly INTO out (a contiguous (hi-lo, jt, V) int8 view).

    For a memmap-backed chunk the bytes come from readinto() on the
    backing file, not from slicing the memmap: touched memmap pages stay
    counted in the process RSS until memory pressure evicts them, so
    streaming a whole DB through memmap slices would look (and under
    pressure behave) like O(DB) resident memory. readinto() lands the
    page-cache read straight in the window buffer — one copy total, no
    intermediate allocation, and the GIL is released for the read (this
    runs on the prefetch thread, overlapping device compute)."""
    codes = ch.codes
    n = (hi - lo) * jt * V
    if isinstance(codes, np.memmap):
        with open(codes.filename, "rb") as fh:
            fh.seek(codes.offset + lo * jt * V * codes.itemsize)
            got = fh.readinto(out.reshape(-1).view(np.uint8).data)
        if got != n:
            raise IOError(f"short read: {got} of {n} bytes from "
                          f"{codes.filename}")
    else:
        out[...] = np.asarray(codes).reshape(-1, jt, V)[lo:hi]


def _fill_window(packed, layout, t0: int, t1: int, win: np.ndarray):
    """Copy global tile range [t0, t1) into win[:t1-t0] straight from the
    per-chunk code files (O(window) host memory, see
    _read_chunk_tiles_into)."""
    jt, V = layout["jt"], layout["V"]
    dst = 0
    for ch, ct0 in zip(packed.chunks, layout["chunk_tile0"]):
        n_t = ch.n_blocks * (ch.L // jt)
        lo = max(t0, ct0) - ct0
        hi = min(t1, ct0 + n_t) - ct0
        if hi <= lo:
            continue
        _read_chunk_tiles_into(ch, lo, hi, jt, V,
                               win[dst:dst + hi - lo])
        dst += hi - lo
    return dst


def iter_windows(packed, window_tiles: int, jt: int = 32):
    """Yield (win (window_tiles, jt, V) int8, orow (window_tiles,) int32
    local rows, g0 global first row, n_w rows in window, r_cap) — windows
    assembled out-of-core (host memory O(window))."""
    from swimm_tpu.alphabet import PAD_CODE
    layout = stream_layout(packed, jt)
    spans, r_cap = plan_windows(layout, window_tiles)
    wt = effective_window_tiles(layout, spans)
    cum = layout["cum"]
    V = layout["V"]
    for g0, g1 in spans:
        t0, t1 = int(cum[g0]), int(cum[g1])
        # PAD-fill only the tail the reads won't overwrite (saves a
        # ~33 MB memset per full window on the prefetch thread)
        win = np.empty((wt, jt, V), np.int8)
        win[t1 - t0:] = PAD_CODE
        filled = _fill_window(packed, layout, t0, t1, win)
        assert filled == t1 - t0, (filled, t0, t1)
        orow = np.full(wt, r_cap, np.int32)                # trash row
        # tile -> local row, from the analytic cumulative map
        orow[:t1 - t0] = (np.searchsorted(cum, np.arange(t0, t1),
                                          side="right") - 1 - g0)
        yield win, orow, g0, g1 - g0, r_cap


def _prefetch_iter(it, depth: int = 2):
    """Run an iterator in a background thread with a bounded queue: at
    most `depth` produced items are alive beyond the one the consumer
    holds. Exceptions in the producer re-raise at the consumer.

    If the consumer abandons the generator mid-stream (its own exception,
    or GC of a half-consumed generator), the finally block signals the
    producer to stop and unblocks any pending q.put, so neither the
    thread nor its ~33 MB window buffers outlive the search."""
    import queue as _queue
    import threading

    q: "_queue.Queue" = _queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()

    def worker():
        try:
            for item in it:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except _queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put(_END)
        except BaseException as e:                 # forward to consumer
            if not stop.is_set():
                q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while not q.empty():           # unblock a producer stuck on put
            try:
                q.get_nowait()
            except _queue.Empty:
                break


def prefetch_windows(packed, window_tiles: int, jt: int = 32,
                     depth: int = 2, to_device: bool = False):
    """iter_windows through a background assembly thread: the next
    window's file reads + PAD fill overlap the device's work on the
    current one (the host loop otherwise serializes ~1-2 s of pure
    assembly into the stream at Swiss-Prot scale). Bounded queue keeps
    at most `depth` assembled windows (~33 MB each at 8192 tiles) alive
    beyond the ones the caller holds.

    to_device=True: the worker thread also device_puts each window, so
    the H2D transfer never blocks the consuming thread (jnp.asarray
    there showed up to ~20 s of exposed host time across a 4M-seq
    44-window stream in one run). An interleaved A/B at that scale puts
    threaded and inline puts inside each other's spread — the dev
    tunnel's run-to-run variance is +-20% — so this is about removing a
    variance source, not a measured mean win. The queue then holds
    device arrays: in-flight HBM stays (depth + caller's windows) *
    window bytes."""
    it = iter_windows(packed, window_tiles, jt)
    if to_device:
        import jax

        def produce():
            for win, orow, g0, n_w, rc in it:
                yield (jax.device_put(win), jax.device_put(orow),
                       g0, n_w, rc)
        yield from _prefetch_iter(produce(), depth=depth)
    else:
        yield from _prefetch_iter(it, depth=depth)


_STREAM_STEP_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _lane_maps_padded(packed, r_cap: int):
    """Device copies of the global lane maps, padded by r_cap+1 trailing
    rows so a window-local dynamic_slice never clamps. O(n_rows * V) —
    tiny next to one window (~0.5% of the DB at Swiss-Prot scale)."""
    import jax.numpy as jnp
    per_db = _STREAM_STEP_CACHE.setdefault(packed, {})
    key = ("lane_maps", r_cap)
    hit = per_db.get(key)
    if hit is None:
        mask, l2s = packed.lane_maps()
        V = int(packed.manifest["V"])
        pad = (r_cap + 1) * V
        mask_p = np.concatenate([mask, np.zeros(pad, bool)])
        l2s_p = np.concatenate([l2s, np.zeros(pad, np.int32)])
        hit = (jnp.asarray(mask_p), jnp.asarray(l2s_p))
        per_db[key] = hit
    return hit


def _seg_padded(packed, r_cap: int):
    """Device copy of the global per-lane ln-length bin ids (E-value
    statistics), padded like _lane_maps_padded so window-local
    dynamic_slices never clamp. Pad/invalid lanes read bin 0 — they
    carry weight 0 through the mask."""
    import jax.numpy as jnp

    from swimm_tpu.utils import stats
    per_db = _STREAM_STEP_CACHE.setdefault(packed, {})
    key = ("seg_map", r_cap)
    hit = per_db.get(key)
    if hit is None:
        mask, l2s = packed.lane_maps()
        seg = stats.lane_bin_map(mask, l2s, packed.lengths)
        V = int(packed.manifest["V"])
        seg_p = np.concatenate([seg, np.zeros((r_cap + 1) * V, np.int32)])
        hit = jnp.asarray(seg_p)
        per_db[key] = hit
    return hit


def select_mode(backend: str, m_pad: int) -> str:
    """Kernel mode for one padded-length group — the single decision
    point shared by the streaming and sharded-streaming drivers."""
    from swimm_tpu.ops import pallas_scorer
    if backend != "pallas":
        return "tiles_xla"
    if m_pad <= pallas_scorer.max_query_pad():
        return "tiles"
    return "tiles_long"


def dispatched_rows(mode: str, m_pad: int) -> int:
    """Query rows the kernel actually dispatches for this mode — the
    long-query kernel rounds m up to a LONG_TILE_M multiple; honest
    padded-cell accounting must count what ran, not what was asked."""
    if mode == "tiles_long":
        from swimm_tpu.ops.longquery import LONG_TILE_M
        return -(-m_pad // LONG_TILE_M) * LONG_TILE_M
    return m_pad


def make_span_scorer(mode: str, r_cap: int, gap_open: int, gap_extend: int,
                     precision: str):
    """scorer(tiles, orow, qp) -> (r_cap+1, V) scores for one span, for
    the given kernel mode (shared by both streaming drivers)."""
    if mode == "tiles":
        from swimm_tpu.ops.pallas_scorer import score_tiles
        return lambda t, o, qp: score_tiles(
            t, o, r_cap + 1, qp, gap_open, gap_extend, precision=precision)
    if mode == "tiles_long":
        from swimm_tpu.ops.longquery import score_tiles_long
        return lambda t, o, qp: score_tiles_long(
            t, o, r_cap + 1, qp, gap_open, gap_extend, precision=precision)
    from swimm_tpu.ops.xla_scorer import score_tiles
    return lambda t, o, qp: score_tiles(
        t, o, r_cap + 1, qp, gap_open, gap_extend)


def span_topk(scorer, tiles, orow, qps, g0, n_w, mask_p, l2s_p,
              n_lanes: int, V: int, kk: int, seg_p=None):
    """The per-span candidate contract, traced inside both streaming
    steps (unsharded jit and each sharded 'data' shard): score the span
    against the profile stack, mask pad/ghost lanes via a dynamic slice
    of the replicated global lane maps at the span's row offset, take the
    per-query top-kk, map flat lane indices to sorted-db indices.

    Masking invariant: rows >= n_w were never written by the kernel (no
    tiles map there) — they are masked regardless of the global mask
    slice, which at those offsets describes the NEXT span's lanes (n_w=0
    masks a tail span entirely). This lives HERE, once: both postures'
    exactness rests on the same argument (module docstring).

    With seg_p (padded global ln-length bin ids, E-value statistics),
    also accumulates each query's span score histogram on device and
    returns (vals, idx, hists) — summing span histograms over every
    window reproduces exactly the whole-DB histogram the resident fused
    path computes, because the masked spans partition the valid lanes.

    Returns (vals, idx): (Q, kk) scores + sorted-db indices."""
    import jax
    import jax.numpy as jnp

    rows_of_lane = jnp.arange(n_lanes, dtype=jnp.int32) // V
    off = g0 * V
    mask_w = jax.lax.dynamic_slice(mask_p, (off,), (n_lanes,))
    l2s_w = jax.lax.dynamic_slice(l2s_p, (off,), (n_lanes,))
    mask_w = mask_w & (rows_of_lane < n_w)
    if seg_p is not None:
        from swimm_tpu.models.engine import hist_from_scores
        from swimm_tpu.utils import stats
        seg_w = jax.lax.dynamic_slice(seg_p, (off,), (n_lanes,))
    vs, idxs, hists = [], [], []
    for qi in range(qps.shape[0]):
        flat = scorer(tiles, orow, qps[qi]).reshape(-1)
        v, i = jax.lax.top_k(jnp.where(mask_w, flat, -1), kk)
        vs.append(v)
        idxs.append(l2s_w[i])
        if seg_p is not None:
            hists.append(hist_from_scores(
                flat, seg_w, mask_w.astype(jnp.float32),
                stats.N_LEN_BINS, stats.SCORE_CAP + 1))
    if seg_p is not None:
        return jnp.stack(vs), jnp.stack(idxs), jnp.stack(hists)
    return jnp.stack(vs), jnp.stack(idxs)


def _window_step(packed, config, r_cap: int, modes: tuple, k: int):
    """Jitted candidates-mode window step, fused over ALL padded-length
    groups: score the window against every group's query-profile stack
    (span_topk per group — the contract shared with the sharded path)
    and concatenate into (sum Q, kk) outputs. One dispatch and one
    result-pull set per WINDOW: the per-group form paid 2–3 ~55 ms pull
    round trips per (window, group) — at Swiss-Prot scale that is ~224
    pulls, which made candidates mode RTT-bound (~21 s vs ~8.5 s)."""
    import jax
    import jax.numpy as jnp

    per_db = _STREAM_STEP_CACHE.setdefault(packed, {})
    key = ("step", r_cap, modes, config.gap_open, config.gap_extend,
           config.precision, k, config.evalue)
    hit = per_db.get(key)
    if hit is not None:
        return hit

    V = int(packed.manifest["V"])
    n_lanes = (r_cap + 1) * V
    kk = min(k, n_lanes)
    mask_p, l2s_p = _lane_maps_padded(packed, r_cap)
    seg_p = _seg_padded(packed, r_cap) if config.evalue else None
    prec = ("f32" if config.precision in ("adaptive", "ladder")
            else config.precision)
    scorers = [make_span_scorer(mode, r_cap, config.gap_open,
                                config.gap_extend, prec) for mode in modes]

    @jax.jit
    def step(tiles_w, orow_w, qps_list, g0, n_w):
        outs = [span_topk(scorer, tiles_w, orow_w, qps, g0, n_w,
                          mask_p, l2s_p, n_lanes, V, kk, seg_p=seg_p)
                for scorer, qps in zip(scorers, qps_list)]
        res = (jnp.concatenate([o[0] for o in outs]),
               jnp.concatenate([o[1] for o in outs]))
        if seg_p is not None:
            res += (jnp.concatenate([o[2] for o in outs]),)
        return res

    per_db[key] = step
    return step


STREAM_BUFFER_CAP = 2 * 1024 * 1024 * 1024
"""Device-byte budget for buffer-mode score accumulators (stream_scores=
'auto'): Q x (n_rows + r_cap) x V x 4 bytes must fit or the batch falls
back to candidate mode. 2 GB covers ~25 queries x 20M db sequences and
leaves >13 GB of v5e HBM for windows + compute; buffer mode has zero
mid-stream result pulls, so it is also the steadier strategy on a
high-variance link — prefer it whenever it fits."""


def resolve_stream_scores(config, n_queries: int, n_rows: int, r_cap: int,
                          V: int) -> str:
    """Pick the streaming merge strategy for this batch.

    'buffer': per-group persistent device score buffers, written per
    window with a donated dynamic_update_slice; NO host round trips
    inside the stream loop and ONE fused resident-style finalize (top-k
    + statistics) at the end — measured 0.92x resident at Swiss-Prot
    scale on the dev tunnel (~55 ms per result pull).

    'candidates': per-window device top-k (one fused dispatch + one
    pull set per window), host merge — O(k) device memory per query
    regardless of DB size (and the contract the sharded super-window
    path uses); measured 0.89x resident. Auto picks 'buffer' whenever
    the score buffers fit STREAM_BUFFER_CAP — one fewer pull per window
    and no per-window candidate concatenation on the host."""
    if config.stream_scores != "auto":
        return config.stream_scores
    need = n_queries * (n_rows + r_cap) * V * 4
    return "buffer" if need <= STREAM_BUFFER_CAP else "candidates"


def _scorer_dtype(mode: str, prec: str):
    """Output dtype of make_span_scorer's scorer (buffer dtype)."""
    import jax.numpy as jnp
    if mode == "tiles_xla":
        return jnp.int32               # ops/xla_scorer.score_tiles
    return jnp.float32 if prec == "f32" else jnp.int32


def _acc_window_step(packed, config, r_cap: int, modes: tuple):
    """Jitted buffer-mode window step, fused over ALL padded-length
    groups: score the window against every group's query-profile stack
    and write rows [g0, g0+r_cap) of each donated score buffer in place.
    ONE dispatch per window total (the per-group form paid ~15 dispatch
    round trips per window at Swiss-Prot scale — measured ~1.5 s of the
    2.4 s streaming-vs-resident gap). Returns (bufs, probe) — the probe
    is a tiny scalar alias used to bound in-flight windows without
    pulling scores.

    Exactness of the overwrite scheme: window w's kernel output rows
    [n_w, r_cap) were never written by the kernel (garbage); they land at
    global rows belonging to LATER windows, whose own writes (sequenced
    by the donated-buffer data dependency) overwrite them. Every row
    < n_rows is therefore written last by exactly its owning window; the
    final window's garbage lands in the [n_rows, n_rows + r_cap) slack
    rows, which the finalize step slices off."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    per_db = _STREAM_STEP_CACHE.setdefault(packed, {})
    key = ("acc", r_cap, modes, config.gap_open, config.gap_extend,
           config.precision)
    hit = per_db.get(key)
    if hit is not None:
        return hit

    prec = ("f32" if config.precision in ("adaptive", "ladder")
            else config.precision)
    scorers = [make_span_scorer(mode, r_cap, config.gap_open,
                                config.gap_extend, prec) for mode in modes]

    @partial(jax.jit, donate_argnums=0)
    def step(bufs, tiles_w, orow_w, qps_list, g0):
        out = []
        for buf, scorer, qps in zip(bufs, scorers, qps_list):
            upd = jnp.stack([scorer(tiles_w, orow_w, qps[qi])[:r_cap]
                             for qi in range(qps.shape[0])])  # drop trash
            out.append(jax.lax.dynamic_update_slice(
                buf, upd.astype(buf.dtype),
                (jnp.int32(0), g0, jnp.int32(0))))
        return tuple(out), out[0][0, 0, 0]
    per_db[key] = step
    return step


def _finalize_buffer_step(packed, config, k: int, n_rows: int):
    """Jitted buffer-mode finalize over ALL group buffers at once:
    exactly the resident fused path's reduction — mask pad lanes,
    per-query global top-k (+ whole-DB score histogram under
    config.evalue), map lanes to sorted-db indices — concatenated into
    single (sum Q, kk) outputs. One dispatch and ONE result pull total:
    each pull costs a full tunnel round trip (~55 ms measured), so the
    per-group form paid ~1 s at Swiss-Prot scale just draining 16 group
    results after the device went idle."""
    import jax
    import jax.numpy as jnp

    per_db = _STREAM_STEP_CACHE.setdefault(packed, {})
    key = ("fin", k, config.evalue, n_rows)
    hit = per_db.get(key)
    if hit is not None:
        return hit

    mask, l2s = packed.lane_maps()
    total = mask.shape[0]
    mask_dev = jnp.asarray(mask)
    l2s_dev = jnp.asarray(l2s)
    kk = min(k, total)
    hist_of = None
    if config.evalue:
        from swimm_tpu.models.engine import _device_score_hist
        from swimm_tpu.utils import stats
        hist_of = _device_score_hist(
            stats.lane_bin_map(mask, l2s, packed.lengths), mask,
            stats.N_LEN_BINS, stats.SCORE_CAP + 1)

    @jax.jit
    def fin(bufs):                  # tuple of (Qg, n_rows + r_cap, V)
        vs, idxs, hists = [], [], []
        for buf in bufs:
            for qi in range(buf.shape[0]):
                flat = buf[qi, :n_rows].reshape(-1)
                scores = jnp.where(mask_dev, flat, -1)
                v, i = jax.lax.top_k(scores, kk)
                vs.append(v)
                idxs.append(l2s_dev[i])
                if hist_of is not None:
                    hists.append(hist_of(scores))
        if hist_of is not None:
            return jnp.stack(vs), jnp.stack(idxs), jnp.stack(hists)
        return jnp.stack(vs), jnp.stack(idxs)
    per_db[key] = fin
    return fin


def _stream_batch_buffer(packed, queries, config, groups, layout, spans,
                         r_cap):
    """Buffer-mode streaming drive loop (see resolve_stream_scores)."""
    from collections import deque

    import jax.numpy as jnp

    from swimm_tpu.models.engine import _hits_from
    from swimm_tpu.models.profile import build_query_profile

    backend = config.resolve_backend()
    mm = config.m_multiple
    jt, V = layout["jt"], layout["V"]
    n_rows = layout["n_rows"]
    prec = ("f32" if config.precision in ("adaptive", "ladder")
            else config.precision)

    group_positions = []
    modes = []
    qps_list = []
    bufs = []
    padded_rows = 0
    for m_pad, positions in sorted(groups.items()):
        mode = select_mode(backend, m_pad)
        qps = jnp.asarray(np.stack([
            build_query_profile(queries[p].codes, config.matrix, mm)
            for p in positions]))
        padded_rows += dispatched_rows(mode, m_pad) * len(positions)
        group_positions.append(positions)
        modes.append(mode)
        qps_list.append(qps)
        bufs.append(jnp.zeros((len(positions), n_rows + r_cap, V),
                              _scorer_dtype(mode, prec)))
    step = _acc_window_step(packed, config, r_cap, tuple(modes))
    bufs = tuple(bufs)
    qps_list = tuple(qps_list)

    # stream loop: threaded H2D + ONE fused dispatch per window — zero
    # result pulls. The probe pull bounds windows alive on device to
    # max_in_flight (a probe completes only after its window's step ran).
    probes: "deque" = deque()
    for tiles_dev, orow_dev, g0, n_w, _rc in prefetch_windows(
            packed, config.window_tiles, jt, depth=config.max_in_flight,
            to_device=True):
        if len(probes) >= config.max_in_flight:
            np.asarray(probes.popleft())   # window w-depth fully done
        bufs, probe = step(bufs, tiles_dev, orow_dev,
                           qps_list, jnp.int32(g0))
        probes.append(probe)
    probes.clear()

    if config.evalue:
        from swimm_tpu.utils import stats
        _, bin_logl = stats.length_bins(packed.lengths)
    fin = _finalize_buffer_step(packed, config, config.top_k, n_rows)
    hit_lists = [None] * len(queries)
    res = fin(bufs)                 # one dispatch, one pull (docstring)
    flat_positions = [p for positions in group_positions
                      for p in positions]
    v = np.asarray(res[0])
    i = np.asarray(res[1])
    h = np.asarray(res[2]) if config.evalue else None
    for row, p in enumerate(flat_positions):
        hits = _hits_from(packed, v[row], i[row], config.top_k)
        if h is not None:
            model = stats.fit_evalue_model_hist(h[row], bin_logl)
            stats.attach_evalues(hits, model, packed.lengths)
        hit_lists[p] = hits
    wt = effective_window_tiles(layout, spans)
    lane_positions = len(spans) * wt * jt * V
    return hit_lists, padded_rows, lane_positions


def search_streaming_batch(packed, queries, config):
    """Batch search under the streaming posture: ONE pass of the DB over
    the host->device link serves the whole batch.

    Returns (hit lists in input order, padded query rows dispatched,
    db lane positions dispatched per query row) — the latter two feed the
    honest padded-cell accounting in engine.search().
    """
    import jax
    import jax.numpy as jnp

    from swimm_tpu.models.engine import (_hits_from, group_by_m_pad)
    from swimm_tpu.models.profile import build_query_profile

    if config.query_pack:
        raise ValueError(
            "db_stream=True does not support query_pack=True: the "
            "streaming path batches queries per padded length against "
            "each window — set query_pack=False")
    if config.precision == "ladder":
        raise ValueError(
            "db_stream=True does not support precision='ladder': the "
            "ladder's block-escalation control flow needs the whole-DB "
            "saturation map before recompute, which conflicts with "
            "window-at-a-time residency. Use precision='adaptive' — it "
            "serves the identical (bit-exact) scores via the single "
            "exact pass (ops/ladder.py docstring)")
    backend = config.resolve_backend()
    mm = config.m_multiple
    groups = group_by_m_pad(queries, mm)
    layout = stream_layout(packed)
    spans, r_cap = plan_windows(layout, config.window_tiles)
    jt, V = layout["jt"], layout["V"]
    if backend == "pallas":
        from swimm_tpu.ops.pallas_scorer import RESIDENT_TILE_CAP
        wt_chk = effective_window_tiles(layout, spans)
        if wt_chk > RESIDENT_TILE_CAP:
            raise ValueError(
                f"window_tiles={config.window_tiles} dispatches {wt_chk} "
                f"tiles per window, past the scalar-prefetch capacity "
                f"({RESIDENT_TILE_CAP}, ops/pallas_scorer.py) — lower "
                "--window-tiles")

    if (layout["n_rows"] > 0 and queries
            and resolve_stream_scores(config, len(queries),
                                      layout["n_rows"], r_cap, V)
            == "buffer"):
        return _stream_batch_buffer(packed, queries, config, groups,
                                    layout, spans, r_cap)

    # per-group stacked profiles + ONE fused window step over all groups
    # (compiled once — every window reuses it)
    group_positions = []
    modes = []
    qps_list = []
    padded_rows = 0
    for m_pad, positions in sorted(groups.items()):
        mode = select_mode(backend, m_pad)
        qps = jnp.asarray(np.stack([
            build_query_profile(queries[p].codes, config.matrix, mm)
            for p in positions]))
        padded_rows += dispatched_rows(mode, m_pad) * len(positions)
        group_positions.append(positions)
        modes.append(mode)
        qps_list.append(qps)
    step = _window_step(packed, config, r_cap, tuple(modes), config.top_k)
    qps_list = tuple(qps_list)
    flat_positions = [p for positions in group_positions
                      for p in positions]

    # stream the windows: upload once, score against every group in one
    # dispatch; at most max_in_flight windows of device memory alive
    from collections import deque
    cands = [[] for _ in queries]                 # per query: (vals, idx)
    hist_sum = ([0.0] * len(queries)) if config.evalue else None
    pending: "deque" = deque()

    def drain():
        res = pending.popleft()
        v = np.asarray(res[0])                    # (sum Q, kk)
        i = np.asarray(res[1])
        h = np.asarray(res[2]) if config.evalue else None
        for row, p in enumerate(flat_positions):
            cands[p].append((v[row], i[row]))
            if h is not None:
                hist_sum[p] = hist_sum[p] + h[row]

    for tiles_dev, orow_dev, g0, n_w, _rc in prefetch_windows(
            packed, config.window_tiles, jt, depth=config.max_in_flight,
            to_device=True):
        if len(pending) >= config.max_in_flight:
            drain()
        pending.append(step(tiles_dev, orow_dev,
                            qps_list, jnp.int32(g0), jnp.int32(n_w)))
    while pending:
        drain()

    # host merge: global (score desc, sorted-index asc) over the union of
    # per-window candidates — contains the global top-k (module docstring)
    if config.evalue:
        from swimm_tpu.utils import stats
        _, bin_logl = stats.length_bins(packed.lengths)
    hit_lists = []
    for p, q_cands in enumerate(cands):
        if not q_cands:
            hit_lists.append([])
            continue
        v = np.concatenate([c[0] for c in q_cands])
        i = np.concatenate([c[1] for c in q_cands])
        order = np.lexsort((i, -v))
        hits = _hits_from(packed, v[order], i[order], config.top_k)
        if config.evalue:
            # windowed histograms sum to exactly the whole-DB histogram
            # (masked spans partition the valid lanes) — same null model
            # as the resident statistics posture
            model = stats.fit_evalue_model_hist(hist_sum[p], bin_logl)
            stats.attach_evalues(hits, model, packed.lengths)
        hit_lists.append(hits)
    wt = effective_window_tiles(layout, spans)
    lane_positions = len(spans) * wt * jt * V
    return hit_lists, padded_rows, lane_positions
