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
