"""Tiled DP for long queries (M5; BASELINE config 3, SURVEY.md section 6.7).

Queries longer than the single-pass kernel's VMEM budget (~2048 padded
positions) are split into query tiles. For each tile the kernel re-scans the
whole database chunk; the DP state that crosses the tile boundary is carried
through HBM per (block, db position, lane):

  - ``hbot``: real H at the tile's bottom query row for every db column —
    consumed as the diagonal/vertical boundary by the next tile (the
    "carried H/E columns across tiles" of BASELINE config 3; E needs no
    carry because it chains along the db axis within a row).
  - ``gcar``: the running (inclusive) column cummax of Ht' in GLOBAL ramp
    space — consumed as the F carry by the next tile. In ramped space the
    gap-extension decay is absorbed, so the carry is a plain max plus a
    per-tile constant offset (delta = tile_base * gap_extend, passed as a
    scalar input so all tiles share one compiled kernel).

Carry traffic is 16 bytes per (db position, lane) per tile, amortized over
tile_m query rows — ~0.008 B/cell, noise next to compute.

Exactness: tested against the CPU oracles with multi-tile splits
(tests_tpu/ and tests/test_longquery.py via the xla reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swimm_tpu.alphabet import PAD_SCORE, TABLE_CODES
LONG_TILE_M = 1024  # query rows per tile: fits VMEM with the carry
# streams and boundary scratch (2048 OOMs, measured)

from swimm_tpu.ops.pallas_scorer import (LANE, _excl_cummax_rows, _mm_dtype,
                                         check_gaps,
                                         _negval, _resolve_interpret,
                                         pick_jt)



def _dp_long_init(h_ref, e_ref, smax_ref, hprev_ref, ramp, neg):
    m, vk = h_ref.shape
    h_ref[:] = jnp.broadcast_to(ramp, (m, vk))
    e_ref[:] = jnp.full_like(e_ref, neg)
    smax_ref[:] = jnp.broadcast_to(ramp, (m, vk))
    hprev_ref[:] = jnp.zeros_like(hprev_ref)     # H_real(bot, j=-1) = 0


def _dp_long_steps(db_ref, qpt_ref, ramp, delta, hbot_in_ref, gcar_in_ref,
                   hbot_out_ref, gcar_out_ref, h_ref, e_ref, smax_ref,
                   hprev_ref, *, jt_steps: int, goe: int, ge: int, dtype):
    """Shared hot loop of the two long-query kernels (rectangular and
    ragged grids differ only in their init/write predicates): advance one
    query tile by jt_steps db residues, consuming/emitting the cross-tile
    H/F boundary carries. The score matmul for step j+1 is issued before
    step j's VPU chain, as in pallas_scorer._dp_steps."""
    m, vk = h_ref.shape
    neg = _negval(dtype)
    c1 = ge - goe
    mmdt = _mm_dtype()
    qpt = qpt_ref[:].astype(mmdt)
    code_iota = jax.lax.broadcasted_iota(jnp.int32, (TABLE_CODES, 1), 0)

    def score_at(j):
        d = db_ref[0, j, :].astype(jnp.int32)
        onehot = (code_iota == d[None, :]).astype(mmdt)
        return jnp.dot(qpt, onehot, preferred_element_type=jnp.float32)

    h = h_ref[:]
    e = e_ref[:]
    hprev = hprev_ref[0:1, :].astype(dtype)              # (1, Vk)
    hbot_rows = []
    gcar_rows = []
    colmax = None
    SMAX_MERGE = 8
    s_f32 = score_at(0)
    for j in range(jt_steps):
        s = s_f32.astype(dtype)
        if j + 1 < jt_steps:
            s_f32 = score_at(j + 1)

        e = jnp.maximum(h - goe, e - ge)
        # diagonal boundary: row 0's H(i-1, j-1) is the previous tile's
        # bottom real H at column j-1 (ramped offset of row -1 is 0)
        hd = jnp.concatenate([hprev, h[:-1, :]], axis=0)
        ht = jnp.maximum(jnp.maximum(hd + s, e), ramp)

        gadj = gcar_in_ref[0, j, :].astype(dtype)[None, :] - delta  # (1, Vk)
        cm = _excl_cummax_rows(ht, neg)
        f = jnp.maximum(cm, gadj) + c1
        h = jnp.maximum(ht, f)
        # Smax tracks ht, not h, with batched merges (r2; mirrors
        # pallas_scorer._dp_steps): any F contribution to H is dominated
        # by an earlier Ht — possibly in a PREVIOUS query tile, where that
        # tile's smax already tracked it and score_tiles_long maxes the
        # per-tile results. Exact by the no-alignment-ends-in-a-gap
        # argument applied across the tile cut.
        colmax = ht if colmax is None else jnp.maximum(colmax, ht)
        if (j + 1) % SMAX_MERGE == 0 or j == jt_steps - 1:
            smax_ref[:] = jnp.maximum(smax_ref[:], colmax)
            colmax = None

        # carries for the NEXT query tile. The inclusive column max of ht
        # falls out of the cummax tree already computed for F (exclusive
        # prefix at the last row, maxed with the last ht row) — no extra
        # full reduction (r2: was jnp.max(ht, axis=0), ~1 op/cell).
        col_inc = jnp.maximum(cm[m - 1:m, :], ht[m - 1:m, :])
        hbot_rows.append(h[m - 1:m, :] - ramp[m - 1, 0])     # real H bottom
        gcar_rows.append(jnp.maximum(col_inc, gadj) + delta)  # global space
        hprev = hbot_in_ref[0, j, :].astype(dtype)[None, :]  # for col j+1

    h_ref[:] = h
    e_ref[:] = e
    # scratch is f32 (exact to 2^24 for any real score) regardless of dtype
    hprev_ref[:] = jnp.broadcast_to(hprev, hprev_ref.shape
                                    ).astype(jnp.float32)
    hbot_out_ref[0] = jnp.concatenate(hbot_rows, axis=0).astype(jnp.float32)
    gcar_out_ref[0] = jnp.concatenate(gcar_rows, axis=0).astype(jnp.float32)


def _dp_tile_kernel(delta_ref, qpt_ref, ramp_ref, db_ref, hbot_in_ref,
                    gcar_in_ref, out_ref, hbot_out_ref, gcar_out_ref,
                    h_ref, e_ref, smax_ref, hprev_ref, *,
                    jt_steps: int, n_jt: int, goe: int, ge: int, dtype):
    """Advance one 128-lane block by jt_steps db residues for ONE query tile.

    Same core recurrence as pallas_scorer._dp_kernel plus boundary carries.
    """
    jt = pl.program_id(1)
    neg = _negval(dtype)
    delta = delta_ref[0].astype(dtype)                   # tile ramp offset
    ramp = ramp_ref[:].astype(dtype)                     # (m, 1) local ramp

    @pl.when(jt == 0)
    def _init():
        _dp_long_init(h_ref, e_ref, smax_ref, hprev_ref, ramp, neg)

    _dp_long_steps(db_ref, qpt_ref, ramp, delta, hbot_in_ref, gcar_in_ref,
                   hbot_out_ref, gcar_out_ref, h_ref, e_ref, smax_ref,
                   hprev_ref, jt_steps=jt_steps, goe=goe, ge=ge, dtype=dtype)

    @pl.when(jt == n_jt - 1)
    def _write():
        score = jnp.max(smax_ref[:] - ramp, axis=0)
        mx = score.astype(jnp.int32)
        out_ref[0, :, :] = jnp.broadcast_to(mx[None, :], out_ref.shape[1:])


@functools.partial(jax.jit, static_argnames=("gap_open", "gap_extend",
                                             "precision", "jt_steps"))
def _score_tile(codes_n, qpt_tile, delta, hbot, gcar, gap_open, gap_extend,
                precision="f32", jt_steps=32):
    Bn, L, vk = codes_n.shape
    m = qpt_tile.shape[0]
    n_jt = L // jt_steps
    dtype = {"f32": jnp.float32, "int32": jnp.int32}[precision]
    ramp = ((jnp.arange(m, dtype=jnp.int32) + 1) * gap_extend).reshape(m, 1)

    kernel = functools.partial(
        _dp_tile_kernel, jt_steps=jt_steps, n_jt=n_jt,
        goe=gap_open + gap_extend, ge=gap_extend, dtype=dtype)

    out, hbot2, gcar2 = pl.pallas_call(
        kernel,
        grid=(Bn, n_jt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # delta (1,)
            pl.BlockSpec((m, TABLE_CODES), lambda b, jt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda b, jt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jt_steps, vk), lambda b, jt: (b, jt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jt_steps, vk), lambda b, jt: (b, jt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jt_steps, vk), lambda b, jt: (b, jt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, vk), lambda b, jt: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jt_steps, vk), lambda b, jt: (b, jt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jt_steps, vk), lambda b, jt: (b, jt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bn, 8, vk), jnp.int32),
            jax.ShapeDtypeStruct((Bn, L, vk), jnp.float32),
            jax.ShapeDtypeStruct((Bn, L, vk), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((m, vk), dtype),                  # H'
            pltpu.VMEM((m, vk), dtype),                  # E'
            pltpu.VMEM((m, vk), dtype),                  # Smax'
            pltpu.VMEM((8, vk), jnp.float32),            # hbot prev column
        ],
        interpret=_resolve_interpret(None),
    )(delta, qpt_tile, ramp, codes_n, hbot, gcar)
    return out[:, 0, :], hbot2, gcar2


def _dp_ragged_tile_kernel(outrow_ref, delta_ref, qpt_ref, ramp_ref, db_ref,
                           hbot_in_ref, gcar_in_ref, out_ref, hbot_out_ref,
                           gcar_out_ref, h_ref, e_ref, smax_ref, hprev_ref,
                           *, jt_steps: int, n_tiles: int, goe: int, ge: int,
                           dtype):
    """Ragged-grid version of _dp_tile_kernel: one (block, 32-db-step) work
    item over the whole-DB tile stream, for ONE query tile. Block
    boundaries come from the scalar-prefetched outrow map exactly as in
    pallas_scorer._dp_ragged_kernel; the cross-query-tile H/F carries ride
    HBM streams aligned with the db tiles."""
    t = pl.program_id(0)
    neg = _negval(dtype)
    delta = delta_ref[0].astype(dtype)

    row = outrow_ref[t]
    is_first = jnp.logical_or(
        t == 0, row != outrow_ref[jnp.maximum(t - 1, 0)])
    is_last = jnp.logical_or(
        t == n_tiles - 1, row != outrow_ref[jnp.minimum(t + 1, n_tiles - 1)])

    ramp = ramp_ref[:].astype(dtype)

    @pl.when(is_first)
    def _init():
        _dp_long_init(h_ref, e_ref, smax_ref, hprev_ref, ramp, neg)

    _dp_long_steps(db_ref, qpt_ref, ramp, delta, hbot_in_ref, gcar_in_ref,
                   hbot_out_ref, gcar_out_ref, h_ref, e_ref, smax_ref,
                   hprev_ref, jt_steps=jt_steps, goe=goe, ge=ge, dtype=dtype)

    @pl.when(is_last)
    def _write():
        score = jnp.max(smax_ref[:] - ramp, axis=0)
        mx = score.astype(jnp.int32)
        out_ref[0, :, :] = jnp.broadcast_to(mx[None, :], out_ref.shape[1:])


@functools.partial(jax.jit, static_argnames=("n_rows", "gap_open",
                                             "gap_extend", "precision",
                                             "jt_steps", "interpret"))
def _score_tiles_one_qtile(tiles, outrow, n_rows, qpt_tile, delta, hbot,
                           gcar, gap_open, gap_extend, precision="f32",
                           jt_steps=32, interpret=None):
    T, jt, V = tiles.shape
    m = qpt_tile.shape[0]
    dtype = {"f32": jnp.float32, "int32": jnp.int32}[precision]
    ramp = ((jnp.arange(m, dtype=jnp.int32) + 1) * gap_extend).reshape(m, 1)

    kernel = functools.partial(
        _dp_ragged_tile_kernel, jt_steps=jt_steps, n_tiles=T,
        goe=gap_open + gap_extend, ge=gap_extend, dtype=dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # delta
            pl.BlockSpec((m, TABLE_CODES), lambda t, o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda t, o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jt_steps, V), lambda t, o: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jt_steps, V), lambda t, o: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jt_steps, V), lambda t, o: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, V), lambda t, o: (o[t], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jt_steps, V), lambda t, o: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jt_steps, V), lambda t, o: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((m, V), dtype),
            pltpu.VMEM((m, V), dtype),
            pltpu.VMEM((m, V), dtype),
            pltpu.VMEM((8, V), jnp.float32),
        ],
    )

    out, hbot2, gcar2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, 8, V), jnp.int32),
            jax.ShapeDtypeStruct((T, jt_steps, V), jnp.float32),
            jax.ShapeDtypeStruct((T, jt_steps, V), jnp.float32),
        ],
        interpret=_resolve_interpret(interpret),
    )(jnp.asarray(outrow, jnp.int32), delta, qpt_tile, ramp, tiles,
      hbot, gcar)
    return out[:, 0, :], hbot2, gcar2


def score_tiles_long(tiles, outrow, n_rows: int, qp, gap_open: int,
                     gap_extend: int, precision: str = "f32",
                     tile_m: int | None = None,
                     interpret: bool | None = None) -> jnp.ndarray:
    """Score a whole-DB ragged tile stream against a query of ANY length:
    the query is tiled at tile_m rows, each tile is one ragged-grid kernel
    dispatch over the full stream, and the H/F boundary state between
    query tiles rides two HBM streams aligned with the db tiles. ONE
    compiled kernel shape serves every query length (vs one per chunk
    shape per tile count for the per-chunk path).

    Returns (n_rows, V) int32 exact scores.
    """
    check_gaps(gap_open, gap_extend)
    T, jt, V = tiles.shape
    m = qp.shape[1]
    tile_m = tile_m or LONG_TILE_M
    n_qt = -(-m // tile_m)
    m_pad = n_qt * tile_m
    if m_pad != m:
        qp = jnp.concatenate(
            [jnp.asarray(qp),
             jnp.full((qp.shape[0], m_pad - m), PAD_SCORE, jnp.int32)],
            axis=1)
    qpt_full = (jnp.asarray(qp).T + gap_extend).astype(jnp.int32)
    hbot = jnp.zeros((T, jt, V), jnp.float32)
    gcar = jnp.full((T, jt, V), _negval(jnp.float32), jnp.float32)
    best = None
    for qt in range(n_qt):
        qpt_tile = qpt_full[qt * tile_m:(qt + 1) * tile_m]
        delta = jnp.array([qt * tile_m * gap_extend], jnp.int32)
        out, hbot, gcar = _score_tiles_one_qtile(
            tiles, outrow, n_rows, qpt_tile, delta, hbot, gcar,
            gap_open, gap_extend, precision=precision, jt_steps=jt,
            interpret=interpret)
        best = out if best is None else jnp.maximum(best, out)
    return best


def score_chunk_long(codes, qp, gap_open: int, gap_extend: int,
                     precision: str = "f32",
                     tile_m: int | None = None) -> jnp.ndarray:
    """Score a chunk against a query of any length via query tiling.

    Args/returns as pallas_scorer.score_chunk; qp may have any m (padded
    internally to a multiple of tile_m).
    """
    check_gaps(gap_open, gap_extend)
    B, L, V = codes.shape
    m = qp.shape[1]
    tile_m = tile_m or LONG_TILE_M
    n_tiles = -(-m // tile_m)
    m_pad = n_tiles * tile_m
    if m_pad != m:
        qp = jnp.concatenate(
            [jnp.asarray(qp),
             jnp.full((qp.shape[0], m_pad - m), PAD_SCORE, jnp.int32)],
            axis=1)

    vk = LANE if (V % LANE == 0) else V
    G = V // vk
    codes_n = jnp.asarray(codes).reshape(B, L, G, vk)
    if G > 1:
        codes_n = jnp.swapaxes(codes_n, 1, 2)
    codes_n = codes_n.reshape(B * G, L, vk)
    Bn = B * G
    jt = pick_jt(tile_m)
    while L % jt:
        jt //= 2

    qpt_full = (jnp.asarray(qp).T + gap_extend).astype(jnp.int32)  # (m_pad, 32)
    hbot = jnp.zeros((Bn, L, vk), jnp.float32)
    gcar = jnp.full((Bn, L, vk), _negval(jnp.float32), jnp.float32)
    best = None
    for t in range(n_tiles):
        qpt_tile = qpt_full[t * tile_m:(t + 1) * tile_m]
        delta = jnp.array([t * tile_m * gap_extend], jnp.int32)
        out, hbot, gcar = _score_tile(codes_n, qpt_tile, delta, hbot, gcar,
                                      gap_open, gap_extend,
                                      precision=precision, jt_steps=jt)
        best = out if best is None else jnp.maximum(best, out)
    return best.reshape(B, V)
