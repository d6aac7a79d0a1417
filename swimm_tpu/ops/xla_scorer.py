"""Portable vectorized Smith-Waterman scorer: pure XLA (lax.scan), exact int32.

This is the M2 scorer of SURVEY.md section 8 and the reference-parity
equivalent of kernel components C7–C10 at the semantics level (exact affine
Gotoh scores, inter-task layout: every lane is a different db sequence,
SURVEY.md section 1 item 2). It is also the multi-chip dry-run / CPU-test
path — the Pallas kernel (pallas_scorer.py) must match it bit-exactly.

TPU-first design — column-vectorized two-pass recurrence
--------------------------------------------------------
The reference's inner loop walks query positions sequentially because the
F (query-direction gap) term chains through the column (SURVEY.md section
4.2). A sequential inner loop is SIMD-hostile on TPU (the VPU wants whole
(8,128) tiles per op, and scalar loop iterations stall the pipeline), so we
restructure the column update to be fully vectorized over the query axis:

1. ``Ht(i) = max(0, Hdiag(i) + S(i), E(i))`` — vectorized, F ignored.
2. F is recovered EXACTLY from Ht by a cumulative max. From
   ``F(i) = max(H(i-1)-Goe, F(i-1)-Ge)`` and ``H = max(Ht, F)``:
   ``F(i) = max(Ht(i-1)-Goe, F(i-1)-Goe, F(i-1)-Ge)
          = max(Ht(i-1)-Goe, F(i-1)-Ge)``      (since Goe >= Ge)
   i.e. F never improves by re-opening a gap inside a gap — the classic
   lazy-F correctness argument (context: PAPERS.md lazy-F paper,
   arXiv:1909.00899). Substituting ``A(i) = Ht(i) - Goe + (i+1)*Ge`` turns
   the decayed chain into a plain running max:
   ``F(i) = cummax(A)(i-1) - i*Ge``.
3. ``H = max(Ht, F)``; ``Smax = max(Smax, H)``.

Every step is a full-tile VPU op over a (lanes, m) tile; the substitution
scores come from a one-hot (lanes, 32) @ QP (32, m) matmul that XLA places on
the MXU (bf16 x bf16 -> f32 is exact for |score| <= 64, far below bf16's 256
integer-exact range).

Integer range: A adds up to m*Ge to scores, so int32 state is safe for any
realistic query (m*Ge + max_score << 2^31).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from swimm_tpu.alphabet import TABLE_CODES
from swimm_tpu.ops.pallas_scorer import check_gaps

NEG = -(1 << 28)  # plain int: a module-level device array would pin the
# sharding/mesh of whichever context touched it first (breaks shard_map
# reuse across mesh sizes)


def _mm_dtype():
    """bf16 feeds the MXU on TPU; XLA:CPU's bf16 dot is unimplemented for
    some shapes, so the CPU fallback uses f32 (equally exact here)."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def _score_tile(d_codes: jnp.ndarray, qp_mm: jnp.ndarray) -> jnp.ndarray:
    """(N,) uint8-ish codes + (32, m) profile -> (N, m) int32 scores via MXU."""
    onehot = (d_codes[:, None] == jnp.arange(TABLE_CODES, dtype=jnp.int32)[None, :])
    s = jnp.dot(onehot.astype(qp_mm.dtype), qp_mm,
                preferred_element_type=jnp.float32)
    return s.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("gap_open", "gap_extend",
                                             "ceiling"))
def score_chunk(codes: jnp.ndarray, qp: jnp.ndarray,
                gap_open: int, gap_extend: int,
                ceiling: int | None = None) -> jnp.ndarray:
    """Score every lane of one packed chunk against one query.

    Args:
      codes: (n_blocks, L, V) int8 packed db residue codes (PAD-filled).
      qp:    (32, m_pad) int32 query profile.
      gap_open, gap_extend: static ints.
      ceiling: if set, clamp H at this value per cell (saturating narrow
        tier of the adaptive-precision ladder, SURVEY.md section 4.4);
        lanes that ever clamp finish with score == ceiling exactly, so the
        ladder driver can flag them for recompute. None = exact.

    Returns:
      (n_blocks, V) int32 local-alignment scores (exact when ceiling=None).
    """
    check_gaps(gap_open, gap_extend)
    B, L, V = codes.shape
    m = qp.shape[1]
    N = B * V
    goe = jnp.int32(gap_open + gap_extend)
    ge = jnp.int32(gap_extend)
    qp_mm = qp.astype(_mm_dtype())

    # ramp(i) = (i+1)*ge, used by the cummax substitution.
    ramp = (jnp.arange(m, dtype=jnp.int32) + 1) * ge          # (m,)

    # Scan over db steps; states are (N, m) int32.
    d_steps = jnp.swapaxes(codes, 0, 1).reshape(L, N).astype(jnp.int32)

    def step(carry, d_j):
        H, E, Smax = carry
        s = _score_tile(d_j, qp_mm)                          # (N, m)
        Hdiag = jnp.pad(H[:, :-1], ((0, 0), (1, 0)))           # H(i-1, j-1); i=0 -> 0
        E = jnp.maximum(H - goe, E - ge)                       # E(i, j)
        Ht = jnp.maximum(jnp.maximum(Hdiag + s, E), 0)
        A = Ht - goe + ramp[None, :]
        G = jax.lax.cummax(A, axis=1)
        F = jnp.pad(G[:, :-1], ((0, 0), (1, 0)), constant_values=NEG) - ramp[None, :] + ge
        H = jnp.maximum(Ht, F)
        if ceiling is not None:
            H = jnp.minimum(H, jnp.int32(ceiling))
        Smax = jnp.maximum(Smax, H)
        return (H, E, Smax), None

    init = (jnp.zeros((N, m), jnp.int32),
            jnp.full((N, m), NEG, jnp.int32),
            jnp.zeros((N, m), jnp.int32))
    (_, _, Smax), _ = jax.lax.scan(step, init, d_steps)
    return Smax.max(axis=1).reshape(B, V)


@functools.partial(jax.jit, static_argnames=("n_rows", "gap_open",
                                             "gap_extend", "ceiling"))
def score_tiles(tiles: jnp.ndarray, outrow: jnp.ndarray, n_rows: int,
                qp: jnp.ndarray, gap_open: int, gap_extend: int,
                ceiling: int | None = None) -> jnp.ndarray:
    """Ragged whole-DB tile-stream scorer (XLA counterpart of
    pallas_scorer.score_tiles; same contract): scan a block-major (T, jt, V)
    stream, resetting DP state at block starts (outrow changes) and reading
    each block's score off the stream with a segment max (valid because the
    running Smax is nondecreasing within a block).

    Returns (n_rows, V) int32 exact scores.
    """
    check_gaps(gap_open, gap_extend)
    T, jt, V = tiles.shape
    m = qp.shape[1]
    goe = jnp.int32(gap_open + gap_extend)
    ge = jnp.int32(gap_extend)
    qp_mm = qp.astype(_mm_dtype())
    ramp = (jnp.arange(m, dtype=jnp.int32) + 1) * ge

    outrow = jnp.asarray(outrow, jnp.int32)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), outrow[1:] != outrow[:-1]])

    def step(carry, d_j):
        H, E, Smax = carry                                  # (V, m)
        s = _score_tile(d_j, qp_mm)
        Hdiag = jnp.pad(H[:, :-1], ((0, 0), (1, 0)))
        E = jnp.maximum(H - goe, E - ge)
        Ht = jnp.maximum(jnp.maximum(Hdiag + s, E), 0)
        A = Ht - goe + ramp[None, :]
        G = jax.lax.cummax(A, axis=1)
        F = jnp.pad(G[:, :-1], ((0, 0), (1, 0)),
                    constant_values=NEG) - ramp[None, :] + ge
        H = jnp.maximum(Ht, F)
        if ceiling is not None:
            H = jnp.minimum(H, jnp.int32(ceiling))
        Smax = jnp.maximum(Smax, H)
        return (H, E, Smax), None

    def tile_step(carry, inp):
        H, E, Smax = carry
        d_tile, fr = inp                                    # (jt, V), bool
        H = jnp.where(fr, 0, H)
        E = jnp.where(fr, NEG, E)
        Smax = jnp.where(fr, 0, Smax)
        (H, E, Smax), _ = jax.lax.scan(
            step, (H, E, Smax), d_tile.astype(jnp.int32))
        return (H, E, Smax), Smax.max(axis=1)               # (V,)

    init = (jnp.zeros((V, m), jnp.int32),
            jnp.full((V, m), NEG, jnp.int32),
            jnp.zeros((V, m), jnp.int32))
    _, ys = jax.lax.scan(tile_step, init, (tiles, first))   # ys: (T, V)
    return jax.ops.segment_max(ys, outrow, num_segments=n_rows,
                               indices_are_sorted=True)


def score_packed_db(packed, query_codes, matrix="BLOSUM62",
                    gap_open: int = 10, gap_extend: int = 2) -> np.ndarray:
    """Convenience: score a whole PackedDb vs one query; returns (n_seqs,)
    int32 scores in sorted-db order."""
    from swimm_tpu.models.profile import build_query_profile

    qp = jnp.asarray(build_query_profile(query_codes, matrix))
    out = np.zeros(packed.n_seqs, dtype=np.int32)
    for ch in packed.chunks:
        scores = np.asarray(score_chunk(jnp.asarray(np.ascontiguousarray(ch.codes)),
                                        qp, gap_open, gap_extend))
        flat = scores.reshape(-1)[:ch.n_seqs]
        out[ch.base:ch.base + ch.n_seqs] = flat
    return out
