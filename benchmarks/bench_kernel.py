import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Kernel microbenchmark (was the round-1 headline): single-chip GCUPS on the canonical config.

Mirrors BASELINE config 1 scaled up: a 144-aa query (the classic P02232
benchmark length, SURVEY.md section 5) against a synthetic Swiss-Prot-like
packed database, scored by the Pallas kernel. Prints ONE JSON line:
  {"metric": ..., "value": GCUPS, "unit": "GCUPS", "vs_baseline": ...}

vs_baseline is measured GCUPS / 150 — the midpoint of the reference's
host-only AVX2 figure (~100-200 GCUPS on a dual-Xeon node, BASELINE.md,
unverified [paper-mem]) — i.e. one v5e chip vs the reference's whole node.

Timing is honest: every scored chunk is a distinct device buffer and the
final value depends on all outputs (the axon tunnel dedupes identical
dispatches, so naive repeat-same-buffer loops overreport wildly).
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from swimm_tpu.models.profile import build_query_profile
    from swimm_tpu.utils.synth import random_codes

    on_tpu = jax.default_backend() != "cpu"
    if on_tpu:
        from swimm_tpu.ops.pallas_scorer import score_chunk
        scorer = lambda c, qp: score_chunk(c, qp, 10, 2, precision="f32")
    else:
        from swimm_tpu.ops.xla_scorer import score_chunk
        scorer = lambda c, qp: score_chunk(c, qp, 10, 2)

    rng = np.random.default_rng(0)
    query = random_codes(rng, 144)
    qp = jnp.asarray(build_query_profile(query, "BLOSUM62", m_multiple=16))
    m_real = len(query)                  # GCUPS counts TRUE cells (standard
    # convention: query_len x db_residues); m_pad == 144 == m_real here, so
    # no pad rows inflate the number

    B, L, V = (32, 512, 128) if on_tpu else (2, 64, 16)
    n_inner = 8 if on_tpu else 2
    codes = jnp.asarray(rng.integers(0, 20, size=(B, L, V), dtype=np.int8))

    # One jitted chain of n_inner kernel calls, each data-dependent on the
    # previous call's result: immune to dispatch dedupe/overlap artifacts.
    @jax.jit
    def chained(codes):
        def body(carry, _):
            c2 = codes ^ (carry % 2).astype(jnp.int8)
            s = scorer(c2, qp)
            return s.sum().astype(jnp.int32), None
        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None,
                              length=n_inner)
        return tot

    chained(codes).block_until_ready()   # warmup / compile

    reps = 4 if on_tpu else 1
    t0 = time.perf_counter()
    for _ in range(reps):
        r = chained(codes)
    r.block_until_ready()
    dt = time.perf_counter() - t0

    cells = B * L * V * m_real * n_inner * reps
    gcups = cells / dt / 1e9
    print(json.dumps({
        "metric": "GCUPS/chip (exact affine SW fill, 144aa query, BLOSUM62 10/2)",
        "value": round(gcups, 1),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / 150.0, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
