"""Pallas TPU Smith-Waterman kernel (L2 hot path).

Parity target: reference kernel components C7–C10 (SSE4.1/AVX2/KNC DP
kernels, SURVEY.md section 3) — collapsed into ONE lane-width-parameterized
TPU kernel, because on TPU vector width is a tiling parameter, not an ISA
(SURVEY.md section 3, C8 row: "width is a param on TPU").

Design (TPU-first, not a translation — SURVEY.md section 8, M3):

- **Inter-task layout** (SWIPE-style, SURVEY.md section 1 item 2): each
  kernel block advances Vk=128 database sequences — one per hardware lane —
  against the whole query. DP state tiles are (m, Vk): query positions on
  sublanes, db lanes on the 128-wide lane axis.
- **DP state in VMEM scratch**, persistent across grid steps: H', E', Smax'
  never touch HBM during the scan; only the (Jt, Vk) int8 residue tile
  streams in per grid step (auto double-buffered by the Pallas pipeline).
  This is the TPU analog of the reference's L1/L2-resident H/E columns
  (SURVEY.md section 6.7); the pure-XLA scan path round-trips its carried
  state through HBM every step and measures ~2.3x slower on v5e.
- **MXU scoring**: per db step, substitution scores for all lanes come from
  one ``QP^T (m,32) @ onehot(d) (32,Vk)`` matmul — the TPU-native form of
  the reference's score-profile construction (C6): zero table lookups in
  the inner loop. The j loop is statically unrolled so the int8 tile loads
  use provably-aligned sublane indices.
- **Ramped-space recurrence**: the whole DP runs on shifted variables
  ``X'(i) = X(i) + (i+1)*ge`` with ``ge`` folded into the query profile.
  This absorbs the gap-extension decay so that F recovery becomes a plain
  running max (no per-step ramp arithmetic), and the Smith-Waterman zero
  floor becomes a max against a precomputed ramp vector.
- **Two-pass exact F** (same math as xla_scorer.py): Ht' is computed
  vectorized over the whole query column ignoring F, then F is recovered
  EXACTLY as an exclusive cumulative max of Ht' — valid because a gap can
  never profitably re-open inside a gap when gap_open >= 0 (the classic
  lazy-F argument; context: PAPERS.md arXiv:1909.00899). The reference's
  sequential per-cell chain (SURVEY.md section 4.2) would leave the TPU VPU
  >90% idle; this formulation is full-tile VPU work.
- **Hierarchical cummax**: within-tile cumulative max over 8-sublane groups
  (3 shifted maxes on a (m/8, 8, Vk) view = per-tile sublane shifts), a
  group-maxima prefix pass on the small (m/8, Vk) array, and one broadcast
  merge — ~9 full-tile ops regardless of m, vs 2*log2(m) for the naive
  log-shift ladder.
- Compute dtype float32 or int32 (bit-identical results; both exact — f32
  holds integers exactly to 2^24). Narrow tiers for the adaptive-precision
  ladder live in ops/ladder.py.

Padding contract: PAD residues score PAD_SCORE (-64) against everything,
keeping every pad cell's H at 0 and pad-row values strictly dominated —
no masking anywhere (see models/profile.py docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swimm_tpu.alphabet import TABLE_CODES

LANE = 128
SUB = 8  # sublanes per native f32/i32 tile
SMAX_MERGE = 8  # running-max -> Smax VMEM merge interval in _dp_steps
# (module-level so benchmarks/exp_kernel_structure.py can sweep it; 8 was
# picked r1 and re-confirmed by the r3 sweep — see docs/KERNEL_NOTES.md)

RESIDENT_TILE_CAP = 200_000
"""Max tiles per ragged dispatch: the (T,) int32 outrow array is a
scalar-PREFETCHED operand living in SMEM, and v5e SMEM is 1 MiB — Mosaic
rejects compiles past ~262k tiles ("Allocation (size=...) would exceed
memory (size=1048576) ... space=smem ... prefetched SMEM operand",
observed at a 4M-seq / 356k-tile DB). 200k tiles (800 KB) leaves slack
for the other scalar operands. Whole-DB single-dispatch callers must
route DBs past this cap through the windowed streaming path (engine
does this automatically for serving)."""


def _negval(dtype):
    return -(1 << 28) if dtype == jnp.int32 else -3e8


def check_gaps(gap_open: int, gap_extend: int) -> None:
    """gap_open >= 0 and gap_extend >= 0 are LOAD-BEARING for exactness:
    the two-pass F recovery merges the open/extend chains via goe >= ge
    (the lazy-F argument), which holds iff gap_open >= 0; ge == 0 (flat
    gap cost) is legal and covered by tests/test_qpack.py gap variants,
    negative extend would flip the ramped space. Called at trace time from
    every scorer entry point (gaps are static args, so this costs nothing
    after the first trace) so raw ops-level callers cannot get
    silently-wrong scores (r2 review finding)."""
    if gap_open < 0:
        raise ValueError(f"gap_open must be >= 0 (got {gap_open})")
    if gap_extend < 0:
        raise ValueError(f"gap_extend must be >= 0 (got {gap_extend})")


def _resolve_interpret(flag):
    """None = auto: compiled Mosaic on TPU, interpreter elsewhere (pallas
    has no compiled CPU lowering). Explicit True/False is honored."""
    if flag is None:
        return jax.default_backend() != "tpu"
    return flag


def _mm_dtype():
    """bf16 feeds the MXU in compiled kernels; interpret mode executes the
    dot on CPU, where XLA's bf16 DotThunk is unimplemented for some shapes
    — use f32 there (equally exact for profile-sized integers)."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def pick_jt(m: int) -> int:
    """db-steps per grid tile. 32 = one native int8 (32, 128) tile; the j
    loop is unrolled so larger values mostly cost compile time."""
    return 32


def max_query_pad() -> int:
    """Largest padded query length the single-pass kernel supports; longer
    queries go through the tiled long-query path (ops/longquery.py, M5)."""
    return 2048


def _shift_rows(x, k, fill):
    """Shift rows down by k along axis 0 (query axis): row i <- row i-k."""
    if k == 0:
        return x
    return jnp.pad(x[:-k, :], ((k, 0), (0, 0)), constant_values=fill)


def _excl_cummax_rows(ht, neg):
    """Exclusive cumulative max along axis 0 of (m, Vk), hierarchical.

    out[i] = max(ht[0..i-1]), out[0] = neg.

    Runs the in-group prefix INCLUSIVE (on the unshifted input) so the group
    maxima fall out as the last sublane row of each group — a strided slice
    instead of a separate 3-op sublane reduction — and applies the exclusive
    shift once at the end (measured ~12% whole-kernel win vs the
    shift-first + separate-gmax formulation).
    """
    m, vk = ht.shape
    if m <= SUB:
        g, k = ht, 1
        while k < m:
            g = jnp.maximum(g, _shift_rows(g, k, neg))
            k *= 2
        return _shift_rows(g, 1, neg)
    nch = m // SUB
    g3 = ht.reshape(nch, SUB, vk)
    k = 1
    while k < SUB:
        # shift within each 8-row group: per-tile sublane shift, no carry
        g3 = jnp.maximum(g3, jnp.pad(g3[:, :-k, :], ((0, 0), (k, 0), (0, 0)),
                                     constant_values=neg))
        k *= 2
    gmax = g3[:, SUB - 1, :]              # (nch, Vk) inclusive group maxima
    # exclusive prefix max over groups (small array, log-shift ladder)
    c = _shift_rows(gmax, 1, neg)
    k = 1
    while k < nch:
        c = jnp.maximum(c, _shift_rows(c, k, neg))
        k *= 2
    g3 = jnp.maximum(g3, c[:, None, :])   # broadcast group carry
    return _shift_rows(g3.reshape(m, vk), 1, neg)


def _dp_init(h_ref, e_ref, smax_ref, ramp, neg):
    """Reset ramped-space DP state for a fresh block (H = Smax = 0 real)."""
    m, vk = h_ref.shape
    h_ref[:] = jnp.broadcast_to(ramp, (m, vk))
    e_ref[:] = jnp.full_like(e_ref, neg)
    smax_ref[:] = jnp.broadcast_to(ramp, (m, vk))


def _dp_steps(db_ref, qpt_ref, ramp, h_ref, e_ref, smax_ref, *,
              jt_steps: int, goe: int, ge: int, dtype,
              ceiling: int | None, f_of_ht):
    """Advance the (m, Vk) ramped-space DP state by jt_steps db residues —
    the shared hot loop of every kernel variant (rectangular, ragged,
    packed; they differ only in boundary logic, F recovery, and the
    block-end write).

    Carries H/E as values across the unrolled loop (one VMEM load/store per
    tile instead of per step); merges the running column max into Smax only
    every SMAX_MERGE steps. The score matmul for step j+1 is issued before
    step j's VPU chain (manual software pipelining: the MXU runs under the
    VPU's serial H/E/F dependency chain instead of in front of it).

    f_of_ht(ht) must return the full F column INCLUDING the (ge - goe)
    gap-open charge (a per-row vector on the packed path).
    """
    m, vk = h_ref.shape
    mmdt = _mm_dtype()
    qpt = qpt_ref[:].astype(mmdt)                        # (m, 32), has +ge
    code_iota = jax.lax.broadcasted_iota(jnp.int32, (TABLE_CODES, 1), 0)
    smax_merge = SMAX_MERGE

    def score_at(j):
        d = db_ref[0, j, :].astype(jnp.int32)            # (Vk,) static index
        onehot = (code_iota == d[None, :]).astype(mmdt)  # (32, Vk)
        return jnp.dot(qpt, onehot,
                       preferred_element_type=jnp.float32)        # (m, Vk)

    h = h_ref[:]
    e = e_ref[:]
    colmax = None
    s_f32 = score_at(0)
    for j in range(jt_steps):
        s = s_f32.astype(dtype)
        if j + 1 < jt_steps:
            s_f32 = score_at(j + 1)

        e = jnp.maximum(h - goe, e - ge)
        hd = _shift_rows(h, 1, 0)                        # ramped Hdiag
        ht = jnp.maximum(jnp.maximum(hd + s, e), ramp)   # ramp = 0-floor

        # Smax tracks ht, not h: a local alignment never profitably ends in
        # a gap (f = excl_cummax(ht) + c1 with c1 = -gap_open <= 0 is
        # column-dominated by ht), so max_i h == max_i ht — and using ht
        # decouples the running-max update from the F dependency chain.
        # (Tracking the bare diagonal candidate t measured ~1-2% SLOWER.)
        colmax = ht if colmax is None else jnp.maximum(colmax, ht)

        h = jnp.maximum(ht, f_of_ht(ht))
        if ceiling is not None:
            # saturating tier: clamp real H at `ceiling` (ramped: ceil+r(i));
            # lanes that touch the ceiling are flagged for recompute at the
            # next wider tier (SURVEY.md section 4.4 adaptive precision).
            # Sub-ceiling lanes are never clamped anywhere in their column,
            # so their ht-tracked scores stay exact; saturated lanes reach
            # >= ceiling in the ht-tracked Smax (overshoot <= max diag
            # score) and the block-end write caps the report at `ceiling`
            # exactly (_write; r2 fuzz finding).
            h = jnp.minimum(h, ramp + ceiling)
        if (j + 1) % smax_merge == 0 or j == jt_steps - 1:
            smax_ref[:] = jnp.maximum(smax_ref[:], colmax)
            colmax = None
    h_ref[:] = h
    e_ref[:] = e


def _dp_kernel(qpt_ref, ramp_ref, db_ref, out_ref, h_ref, e_ref, smax_ref, *,
               jt_steps: int, n_jt: int, goe: int, ge: int, dtype,
               ceiling: int | None):
    """One grid step: advance one 128-lane block by jt_steps db residues.

    Grid = (B, n_jt), jt fastest. Scratch (persistent across jt):
      h_ref/e_ref/smax_ref: (m, Vk) ramped-space DP state.
    Inputs: qpt_ref (m, 32) ge-folded query profile (transposed);
            ramp_ref (m, 1) ramp vector r(i) = (i+1)*ge.
    """
    jt = pl.program_id(1)
    neg = _negval(dtype)
    c1 = ge - goe
    ramp = ramp_ref[:].astype(dtype)                     # (m, 1)

    @pl.when(jt == 0)
    def _init():
        _dp_init(h_ref, e_ref, smax_ref, ramp, neg)

    _dp_steps(db_ref, qpt_ref, ramp, h_ref, e_ref, smax_ref,
              jt_steps=jt_steps, goe=goe, ge=ge, dtype=dtype,
              ceiling=ceiling,
              f_of_ht=lambda ht: _excl_cummax_rows(ht, neg) + c1)

    @pl.when(jt == n_jt - 1)
    def _write():
        score = jnp.max(smax_ref[:] - ramp, axis=0)      # un-ramp, (Vk,)
        if ceiling is not None:
            # Smax tracks PRE-clamp ht (the h clamp keeps downstream state
            # bounded), so saturated lanes can overshoot by up to the max
            # substitution score; cap the REPORT so a saturated lane
            # returns exactly `ceiling` — bit-parity with the xla scorer's
            # ceilinged pass (r2 fuzz finding, benchmarks/fuzz_tpu.py)
            score = jnp.minimum(score, ceiling)
        mx = score.astype(jnp.int32)
        out_ref[0, :, :] = jnp.broadcast_to(mx[None, :], out_ref.shape[1:])


SEG_OFFSET = 1 << 18  # B in the segmented-carry domination argument: must
# exceed every ramped DP value (< ~1.2e5) while B * (N_SEG_CAP - 1) + value
# stays < 2^24 for f32 exactness (48 segments: 12.3M + 1.2e5 < 16.7M).


def _excl_cummax_rows_seg(ht, segoff, neg):
    """Segmented exclusive cummax along axis 0 of (m, Vk).

    Segments are 8-row sublane groups labeled by a NONDECREASING id;
    segoff = seg_id * SEG_OFFSET, shape (nch, 1). Within-group prefixes
    never cross segments (models/qpack.py aligns queries to groups); the
    group-carry ladder runs on offset values so earlier segments are
    strictly dominated after the offset is subtracted (exact, see
    SEG_OFFSET). Requires ht >= 0 (guaranteed: ht >= ramp >= 0).
    """
    m, vk = ht.shape
    nch = m // SUB
    g3 = ht.reshape(nch, SUB, vk)
    k = 1
    while k < SUB:
        g3 = jnp.maximum(g3, jnp.pad(g3[:, :-k, :], ((0, 0), (k, 0), (0, 0)),
                                     constant_values=neg))
        k *= 2
    gmax = g3[:, SUB - 1, :] + segoff     # (nch, Vk) offset group maxima
    c = _shift_rows(gmax, 1, 0)           # fill 0: dominated (values >= 0)
    k = 1
    while k < nch:
        c = jnp.maximum(c, _shift_rows(c, k, 0))
        k *= 2
    c = c - segoff                        # receiver-relative carry
    g3 = jnp.maximum(g3, c[:, None, :])
    return _shift_rows(g3.reshape(m, vk), 1, neg)


def _dp_ragged_kernel(outrow_ref, qpt_ref, ramp_ref, db_ref, out_ref,
                      h_ref, e_ref, smax_ref, *,
                      jt_steps: int, n_tiles: int, goe: int, ge: int, dtype,
                      ceiling: int | None):
    """Ragged whole-DB grid step: one (block, 32-db-step) work item.

    Unlike _dp_kernel's rectangular (B, n_jt) grid, the grid here is a flat
    stream of tiles spanning EVERY block of EVERY chunk of the database —
    blocks of different lengths ride one kernel instance (one lowering, one
    dispatch for the whole DB; the TPU analog of the reference's single
    OpenMP work queue over heterogeneous chunks, SURVEY.md section 4.2).
    Block boundaries come from the scalar-prefetched ``outrow`` map
    (tile -> output row): a row change marks first/last tiles, so no extra
    boundary arrays are needed in SMEM.
    """
    t = pl.program_id(0)
    neg = _negval(dtype)
    c1 = ge - goe

    row = outrow_ref[t]
    is_first = jnp.logical_or(
        t == 0, row != outrow_ref[jnp.maximum(t - 1, 0)])
    is_last = jnp.logical_or(
        t == n_tiles - 1, row != outrow_ref[jnp.minimum(t + 1, n_tiles - 1)])

    ramp = ramp_ref[:].astype(dtype)                     # (m, 1)

    @pl.when(is_first)
    def _init():
        _dp_init(h_ref, e_ref, smax_ref, ramp, neg)

    _dp_steps(db_ref, qpt_ref, ramp, h_ref, e_ref, smax_ref,
              jt_steps=jt_steps, goe=goe, ge=ge, dtype=dtype,
              ceiling=ceiling,
              f_of_ht=lambda ht: _excl_cummax_rows(ht, neg) + c1)

    @pl.when(is_last)
    def _write():
        score = jnp.max(smax_ref[:] - ramp, axis=0)      # un-ramp, (Vk,)
        if ceiling is not None:
            score = jnp.minimum(score, ceiling)   # see _dp_kernel._write
        mx = score.astype(jnp.int32)
        out_ref[0, :, :] = jnp.broadcast_to(mx[None, :], out_ref.shape[1:])


@functools.partial(jax.jit, static_argnames=("n_rows", "gap_open",
                                             "gap_extend", "precision",
                                             "jt_steps", "interpret",
                                             "ceiling"))
def score_tiles(tiles: jnp.ndarray, outrow: jnp.ndarray, n_rows: int,
                qp: jnp.ndarray, gap_open: int, gap_extend: int,
                precision: str = "f32", jt_steps: int = 32,
                interpret: bool | None = None,
                ceiling: int | None = None) -> jnp.ndarray:
    """Score an entire ragged tile stream (all blocks, any lengths) in ONE
    kernel dispatch.

    Args:
      tiles: (T, jt_steps, V) int8 packed db codes — the whole database as a
        flat stream of 32-db-step tiles, block-major (each block's tiles
        consecutive). V % 128 == 0 (or interpret mode).
      outrow: (T,) int32 mapping tile -> output row; constant within a block,
        strictly nondecreasing (0..n_rows-1).
      n_rows: number of output rows (total blocks).
      qp: (32, m) int32 query profile; m % 8 == 0, m <= max_query_pad().

    Returns: (n_rows, V) int32 exact local-alignment scores.
    """
    check_gaps(gap_open, gap_extend)
    T, jt, V = tiles.shape
    assert jt == jt_steps
    m = qp.shape[1]
    dtype = {"f32": jnp.float32, "int32": jnp.int32}[precision]

    qpt = (qp.T + gap_extend).astype(jnp.int32)          # (m, 32)
    ramp = ((jnp.arange(m, dtype=jnp.int32) + 1)
            * gap_extend).reshape(m, 1)

    kernel = functools.partial(
        _dp_ragged_kernel, jt_steps=jt_steps, n_tiles=T,
        goe=gap_open + gap_extend, ge=gap_extend, dtype=dtype,
        ceiling=ceiling)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((m, TABLE_CODES), lambda t, o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda t, o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jt_steps, V), lambda t, o: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, V), lambda t, o: (o[t], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((m, V), dtype),                   # H'
            pltpu.VMEM((m, V), dtype),                   # E'
            pltpu.VMEM((m, V), dtype),                   # Smax'
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, 8, V), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=(2 * TABLE_CODES + 20) * m * V * jt_steps * T,
            bytes_accessed=tiles.size + 4 * n_rows * V,
            transcendentals=0,
        ),
        interpret=_resolve_interpret(interpret),
    )(jnp.asarray(outrow, jnp.int32), qpt, ramp, tiles)
    return out[:, 0, :]


def _dp_packed_kernel(outrow_ref, qpt_ref, ramp_ref, segoff_ref, segid_ref,
                      c1v_ref, db_ref, out_ref, h_ref, e_ref, smax_ref, *,
                      jt_steps: int, n_tiles: int, goe: int, ge: int, dtype,
                      n_seg_cap: int):
    """Ragged grid step over a PACKED multi-query profile (models/qpack.py).

    Same DP as _dp_ragged_kernel with two changes: the F recovery is
    segmented (queries must not see each other's F), and the block-end
    write reduces per-SEGMENT score planes instead of one global max.

    c1v is the per-row (ge - goe) add applied to the cummax — NEG_BIG at
    segment-start rows, because the trailing exclusive shift in
    _excl_cummax_rows_seg moves the previous segment's inclusive prefix
    into each segment's first row; the poisoned add makes that leaked
    value strictly dominated in h = max(ht, f) at zero extra cost (the
    scalar +c1 becomes a column-broadcast add).
    """
    t = pl.program_id(0)
    m, vk = h_ref.shape
    nch = m // SUB
    neg = _negval(dtype)

    row = outrow_ref[t]
    is_first = jnp.logical_or(
        t == 0, row != outrow_ref[jnp.maximum(t - 1, 0)])
    is_last = jnp.logical_or(
        t == n_tiles - 1, row != outrow_ref[jnp.minimum(t + 1, n_tiles - 1)])

    ramp = ramp_ref[:].astype(dtype)                     # (m, 1)
    segoff = segoff_ref[:].astype(dtype)                 # (nch, 1)
    c1v = c1v_ref[:].astype(dtype)                       # (m, 1)

    @pl.when(is_first)
    def _init():
        _dp_init(h_ref, e_ref, smax_ref, ramp, neg)

    _dp_steps(db_ref, qpt_ref, ramp, h_ref, e_ref, smax_ref,
              jt_steps=jt_steps, goe=goe, ge=ge, dtype=dtype, ceiling=None,
              f_of_ht=lambda ht: _excl_cummax_rows_seg(ht, segoff, neg)
              + c1v)

    @pl.when(is_last)
    def _write():
        sm = smax_ref[:] - ramp                          # real row scores
        sm3 = jnp.max(sm.reshape(nch, SUB, vk), axis=1)  # (nch, Vk)
        segid = segid_ref[:]                             # (nch, 1) int32
        planes = []
        for p in range(n_seg_cap // 2):                  # static unroll;
            # only EVEN seg ids are queries (odd = separators, qpack.py),
            # so emit one plane per query slot
            masked = jnp.where(segid == 2 * p, sm3, 0)
            planes.append(jnp.max(masked, axis=0))       # (Vk,)
        out_ref[0, :, :] = jnp.stack(planes).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_rows", "n_seg_cap",
                                             "gap_open", "gap_extend",
                                             "precision", "jt_steps",
                                             "interpret"))
def score_tiles_packed(tiles: jnp.ndarray, outrow: jnp.ndarray, n_rows: int,
                       qp: jnp.ndarray, seg_of_group: jnp.ndarray,
                       gap_open: int, gap_extend: int, n_seg_cap: int = 48,
                       precision: str = "f32", jt_steps: int = 32,
                       interpret: bool | None = None) -> jnp.ndarray:
    """Score a ragged tile stream against a PACKED multi-query profile in
    one dispatch; every shape is fixed per (database, pack bucket), so a
    server compiles a handful of programs total.

    Args:
      tiles/outrow/n_rows: as score_tiles.
      qp: (32, M) int32 packed profile (models/qpack.build_query_packs).
      seg_of_group: (M/8,) int32 nondecreasing segment ids.
      n_seg_cap: static segment-plane count (models/qpack.N_SEG_CAP).

    Returns: (n_rows, n_seg_cap // 2, V) int32 — exact per-(block, query
    plane, lane) scores; plane p holds segment id 2p (queries occupy even
    ids, models/qpack.py), so entry.seg // 2 indexes its plane. Unused
    planes hold zeros.
    """
    check_gaps(gap_open, gap_extend)
    T, jt, V = tiles.shape
    assert jt == jt_steps
    m = qp.shape[1]
    nch = m // SUB
    dtype = {"f32": jnp.float32, "int32": jnp.int32}[precision]

    qpt = (qp.T + gap_extend).astype(jnp.int32)
    ramp = ((jnp.arange(m, dtype=jnp.int32) + 1)
            * gap_extend).reshape(m, 1)
    seg_flat = jnp.asarray(seg_of_group, jnp.int32)      # (nch,) traced:
    # pack layout stays a runtime input so every layout shares one program
    seg = seg_flat.reshape(nch, 1)
    segoff = seg * SEG_OFFSET
    # per-row cummax add: (ge - goe) normally, poisoned at segment starts
    # (see _dp_packed_kernel docstring)
    grp_start = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (seg_flat[1:] != seg_flat[:-1]).astype(jnp.int32)])
    row_start = (grp_start[:, None]
                 * (jax.lax.broadcasted_iota(jnp.int32, (nch, SUB), 1) == 0)
                 ).reshape(m)
    c1v = ((gap_extend - (gap_open + gap_extend))
           - row_start * (1 << 20)).reshape(m, 1)

    kernel = functools.partial(
        _dp_packed_kernel, jt_steps=jt_steps, n_tiles=T,
        goe=gap_open + gap_extend, ge=gap_extend, dtype=dtype,
        n_seg_cap=n_seg_cap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((m, TABLE_CODES), lambda t, o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda t, o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, 1), lambda t, o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, 1), lambda t, o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda t, o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jt_steps, V), lambda t, o: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_seg_cap // 2, V),
                               lambda t, o: (o[t], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((m, V), dtype),
            pltpu.VMEM((m, V), dtype),
            pltpu.VMEM((m, V), dtype),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, n_seg_cap // 2, V),
                                       jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=(2 * TABLE_CODES + 20) * m * V * jt_steps * T,
            bytes_accessed=tiles.size + 4 * n_rows * n_seg_cap * V,
            transcendentals=0,
        ),
        interpret=_resolve_interpret(interpret),
    )(jnp.asarray(outrow, jnp.int32), qpt, ramp, segoff, seg, c1v, tiles)
    return out


@functools.partial(jax.jit, static_argnames=("gap_open", "gap_extend",
                                             "precision", "jt_steps",
                                             "interpret", "ceiling",
                                             "lanes_per_block"))
def score_chunk(codes: jnp.ndarray, qp: jnp.ndarray,
                gap_open: int, gap_extend: int,
                precision: str = "f32", jt_steps: int | None = None,
                interpret: bool | None = None,
                ceiling: int | None = None,
                lanes_per_block: int | None = None) -> jnp.ndarray:
    """Score every lane of one packed chunk against one query (Pallas).

    Args:
      codes: (B, L, V) int8 packed db codes; V % 128 == 0 (or interpret
        mode); L % 32 == 0 (guaranteed by db.py length quantization).
      qp: (32, m) int32 query profile; m % 8 == 0, m <= max_query_pad().
      precision: 'int32' | 'f32' (bit-identical exact scores).

    Returns: (B, V) int32 exact local-alignment scores.
    """
    check_gaps(gap_open, gap_extend)
    B, L, V = codes.shape
    m = qp.shape[1]
    if jt_steps is None:
        jt_steps = pick_jt(m)
        while L % jt_steps:
            jt_steps //= 2
    if L % jt_steps:
        raise ValueError(f"L={L} not a multiple of jt_steps={jt_steps}")
    if lanes_per_block is not None:
        ok = (V % lanes_per_block == 0 if lanes_per_block <= V
              else lanes_per_block % V == 0 and B % (lanes_per_block // V) == 0)
        vk = lanes_per_block if ok else V
    else:
        vk = LANE if (V % LANE == 0) else V
    G = V // vk
    n_jt = L // jt_steps
    dtype = {"f32": jnp.float32, "int32": jnp.int32}[precision]

    # ge-folded, transposed profile and the ramp vector (host-side consts).
    qpt = (qp.T + gap_extend).astype(jnp.int32)          # (m, 32)
    ramp = ((jnp.arange(m, dtype=jnp.int32) + 1)
            * gap_extend).reshape(m, 1)

    # Normalize to vk-lane kernel blocks. vk == V is a no-op reshape; vk < V
    # splits each block (G sub-blocks); vk > V merges g consecutive blocks
    # along the lane axis (wider tiles amortize per-op overhead when the
    # query is short — more vregs in flight per VPU op). Either direction is
    # one XLA transpose on the int8 codes (HBM-cheap vs the DP compute).
    if vk <= V:
        codes_n = codes.reshape(B, L, G, vk)
        if G > 1:
            codes_n = jnp.swapaxes(codes_n, 1, 2)
        Bn = B * G
    else:
        g = vk // V
        if B % g:
            raise ValueError(f"B={B} not a multiple of merge factor {g}")
        Bn = B // g
        codes_n = jnp.swapaxes(codes.reshape(Bn, g, L, V), 1, 2)
    codes_n = codes_n.reshape(Bn, L, vk)

    kernel = functools.partial(
        _dp_kernel, jt_steps=jt_steps, n_jt=n_jt,
        goe=gap_open + gap_extend, ge=gap_extend, dtype=dtype,
        ceiling=ceiling)

    out = pl.pallas_call(
        kernel,
        grid=(Bn, n_jt),
        in_specs=[
            pl.BlockSpec((m, TABLE_CODES), lambda b, jt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda b, jt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jt_steps, vk), lambda b, jt: (b, jt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, vk), lambda b, jt: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bn, 8, vk), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((m, vk), dtype),                 # H'
            pltpu.VMEM((m, vk), dtype),                 # E'
            pltpu.VMEM((m, vk), dtype),                 # Smax'
        ],
        cost_estimate=pl.CostEstimate(
            flops=(2 * TABLE_CODES + 20) * m * vk * jt_steps * Bn * n_jt,
            bytes_accessed=codes.size + 4 * Bn * vk,
            transcendentals=0,
        ),
        interpret=_resolve_interpret(interpret),
    )(qpt, ramp, codes_n)
    out = out[:, 0, :].reshape(B, V)
    return out
