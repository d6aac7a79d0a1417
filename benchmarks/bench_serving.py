"""End-to-end serving benchmark (BASELINE config 2 shape).

A Swiss-Prot-like synthetic DB resident in HBM, a 20-query batch of
100-500 aa, searched through the production fused path (ragged whole-DB
kernel + device top-k). Reports REAL-cell GCUPS (standard convention:
true query length x true db residues), padded GCUPS, and db seq-scores/s.

Usage: python benchmarks/bench_serving.py [n_seqs] [n_queries]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_seqs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from swimm_tpu.db import build_db
    from swimm_tpu.models.engine import SearchConfig, search
    from swimm_tpu.utils.synth import synth_db, synth_queries

    rng = np.random.default_rng(0)
    qlens = list(rng.integers(100, 501, size=n_q))
    queries = synth_queries(n_q, qlens, seed=1)
    print(f"building {n_seqs}-seq synthetic DB...", flush=True)
    recs = synth_db(n_seqs, seed=2, queries=[q.codes for q in queries],
                    homolog_frac=0.001)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        packed = build_db(recs, td, V=128)
        # measure the bounded-compile PACKED posture here (the default
        # posture, per-length shapes, is bench.py's headline; BASELINE.md
        # records both)
        cfg = SearchConfig(top_k=16, query_pack=True)
        print("warmup (compile + DB upload)...", flush=True)
        t0 = time.perf_counter()
        search(packed, queries, cfg)
        print(f"warmup {time.perf_counter()-t0:.1f}s", flush=True)
        best = None
        for _ in range(3):
            results, met = search(packed, queries, cfg)
            if best is None or met.seconds < best[1].seconds:
                best = (results, met)
        results, met = best
        print(f"steady: {met.seconds*1e3:.0f} ms for {n_q} queries x "
              f"{n_seqs} seqs", flush=True)
        print(f"  real GCUPS: {met.gcups:.1f}   padded GCUPS: "
              f"{met.padded_gcups:.1f}")
        print(f"  seq-scores/s: {met.n_db_seqs*n_q/met.seconds:,.0f}")
        print(f"  top hit q0: {results[0].hits[0].score} "
              f"{results[0].hits[0].title[:40]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
