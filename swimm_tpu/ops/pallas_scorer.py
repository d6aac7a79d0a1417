"""Pallas TPU Smith-Waterman kernel (L2 hot path).

Parity target: reference kernel components C7–C10 (SSE4.1/AVX2/KNC DP
kernels, SURVEY.md section 3) — collapsed into ONE lane-width-parameterized
TPU kernel, because on TPU vector width is a tiling parameter, not an ISA
(SURVEY.md section 3, C8 row: "width is a param on TPU").

Design (TPU-first, not a translation — SURVEY.md section 8, M3):

- **Inter-task layout**: each kernel invocation advances a block of Vk=128
  database sequences (one per position of the minor-most dimension pairing)
  against the whole query (SWIPE-style inter-task vectorization, SURVEY.md
  section 1 item 2). DP state tiles are (Vk, m): db lanes on sublanes,
  query positions on the 128-wide lane axis.
- **DP state in VMEM scratch**, persistent across grid steps: H, E, Smax
  never touch HBM during the scan; only the (Jt, Vk) int8 residue tile
  streams in per grid step (auto double-buffered by the Pallas pipeline).
  This is the TPU analog of the reference's L1/L2-resident H/E columns
  (SURVEY.md section 6.7); the pure-XLA scan path round-trips its carried
  state through HBM every step and measures ~10x slower on v5e.
- **MXU scoring, one matmul per tile**: substitution scores for ALL Jt db
  steps of the tile are computed at once as
  ``onehot(d) (Jt*Vk, 32) @ QP (32, m)`` and staged in a VMEM scratch
  indexed by the leading (untiled) dimension — the TPU-native form of the
  reference's score-profile construction (C6): the inner loop does zero
  table lookups.
- **Column-vectorized two-pass recurrence** (same math as xla_scorer.py):
  Ht = max(0, Hdiag + S, E) vectorized over the whole query column, then F
  recovered exactly with a log-depth cumulative max along the query axis.
  The reference's sequential per-cell chain (SURVEY.md section 4.2) would
  leave the VPU >90% idle on TPU.
- Compute dtype is float32 by default: the VPU is float-native and f32
  represents alignment scores exactly up to 2^24. An int32 variant exists
  (bit-identical by construction; used to cross-check) and narrow tiers for
  the adaptive-precision ladder live in ops/ladder.py.

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


def _neg(dtype):
    return jnp.array(-(1 << 28) if dtype == jnp.int32 else -3e8, dtype)


def pick_jt(m: int) -> int:
    """db-steps per grid tile. 32 = one native int8 (32, 128) tile; the j
    loop is unrolled so larger values mostly cost compile time."""
    return 32


def max_query_pad() -> int:
    """Largest padded query length the single-pass kernel supports; longer
    queries go through the tiled long-query path (ops/longquery.py, M5)."""
    return 2048


def _shift_cols(x, k, fill):
    """Shift columns right by k along the query (lane) axis:
    col i <- col i-k."""
    if k == 0:
        return x
    return jnp.pad(x[:, :-k], ((0, 0), (k, 0)), constant_values=fill)


def _dp_kernel(qp_ref, db_ref, out_ref, h_ref, e_ref, smax_ref, *,
               jt_steps: int, n_jt: int, goe: int, ge: int, dtype):
    """One grid step: advance one 128-lane block by jt_steps db residues.

    Grid = (B, n_jt), jt fastest. Scratch (persistent across jt):
      h_ref/e_ref/smax_ref: (Vk, m) DP state.

    The j loop is statically unrolled: static sublane indices keep the int8
    tile loads legal, and each step's substitution scores come from one
    transposed-contraction matmul onehot(32,Vk)^T-dot-QP(32,m) -> (Vk, m)
    on the MXU, which Mosaic pipelines against the previous step's VPU work.
    """
    jt = pl.program_id(1)
    vk, m = h_ref.shape
    neg = _neg(dtype)

    @pl.when(jt == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        e_ref[:] = jnp.full_like(e_ref, neg)
        smax_ref[:] = jnp.zeros_like(smax_ref)

    qp = qp_ref[:].astype(jnp.bfloat16)                  # (32, m)
    code_iota = jax.lax.broadcasted_iota(jnp.int32, (TABLE_CODES, 1), 0)
    # ramp(i) = (i+1)*ge along the query (lane) axis.
    ramp = ((jax.lax.broadcasted_iota(jnp.int32, (1, m), 1) + 1) * ge).astype(dtype)

    for j in range(jt_steps):
        d = db_ref[0, j, :].astype(jnp.int32)            # (Vk,) static index
        onehot = (code_iota == d[None, :]).astype(jnp.bfloat16)  # (32, Vk)
        s = jax.lax.dot_general(
            onehot, qp, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)     # (Vk, m)

        h_prev = h_ref[:]
        e_new = jnp.maximum(h_prev - goe, e_ref[:] - ge)
        hdiag = _shift_cols(h_prev, 1, 0)
        ht = jnp.maximum(jnp.maximum(hdiag + s, e_new), 0)

        # F via log-depth cumulative max along the query axis.
        g = ht + (ramp - goe)
        k = 1
        while k < m:
            g = jnp.maximum(g, _shift_cols(g, k, neg))
            k *= 2
        f = _shift_cols(g, 1, neg) - ramp + ge
        h_new = jnp.maximum(ht, f)

        h_ref[:] = h_new
        e_ref[:] = e_new
        smax_ref[:] = jnp.maximum(smax_ref[:], h_new)

    @pl.when(jt == n_jt - 1)
    def _write():
        mx = jnp.max(smax_ref[:], axis=1).astype(jnp.int32)   # (Vk,) per-lane
        out_ref[0, :, :] = jnp.broadcast_to(mx[None, :], out_ref.shape[1:])


@functools.partial(jax.jit, static_argnames=("gap_open", "gap_extend",
                                             "precision", "jt_steps",
                                             "interpret"))
def score_chunk(codes: jnp.ndarray, qp: jnp.ndarray,
                gap_open: int, gap_extend: int,
                precision: str = "f32", jt_steps: int | None = None,
                interpret: bool = False) -> jnp.ndarray:
    """Score every lane of one packed chunk against one query (Pallas).

    Args:
      codes: (B, L, V) int8 packed db codes; V % 128 == 0 (or interpret
        mode); L % 32 == 0 (guaranteed by db.py length quantization).
      qp: (32, m) int32 query profile; m % 128 == 0, m <= max_query_pad().
      precision: 'f32' | 'int32' (bit-identical; f32 fastest on the VPU).

    Returns: (B, V) int32 exact local-alignment scores.
    """
    B, L, V = codes.shape
    m = qp.shape[1]
    if jt_steps is None:
        jt_steps = pick_jt(m)
        while L % jt_steps:
            jt_steps //= 2
    if L % jt_steps:
        raise ValueError(f"L={L} not a multiple of jt_steps={jt_steps}")
    vk = LANE if (V % LANE == 0) else V
    G = V // vk
    n_jt = L // jt_steps
    dtype = {"f32": jnp.float32, "int32": jnp.int32}[precision]

    # Normalize to 128-lane blocks: (B, L, G, vk) -> (B*G, L, vk). No-op
    # when V == 128 (the pack default); an XLA transpose otherwise.
    codes_n = codes.reshape(B, L, G, vk)
    if G > 1:
        codes_n = jnp.swapaxes(codes_n, 1, 2)
    codes_n = codes_n.reshape(B * G, L, vk)
    Bn = B * G

    kernel = functools.partial(
        _dp_kernel, jt_steps=jt_steps, n_jt=n_jt,
        goe=gap_open + gap_extend, ge=gap_extend, dtype=dtype)

    out = pl.pallas_call(
        kernel,
        grid=(Bn, n_jt),
        in_specs=[
            pl.BlockSpec((TABLE_CODES, m), lambda b, jt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jt_steps, vk), lambda b, jt: (b, jt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, vk), lambda b, jt: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bn, 8, vk), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((vk, m), dtype),                 # H
            pltpu.VMEM((vk, m), dtype),                 # E
            pltpu.VMEM((vk, m), dtype),                 # Smax
        ],
        cost_estimate=pl.CostEstimate(
            flops=(2 * TABLE_CODES + 12) * m * vk * jt_steps * Bn * n_jt,
            bytes_accessed=codes.size + 4 * Bn * vk,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp.astype(jnp.int32), codes_n)
    out = out[:, 0, :].reshape(B, V)
    return out
