"""M8 scaling benchmark: sharded whole-DB search efficiency vs mesh size.

Real multi-chip hardware is not available in this environment (one v5e
chip behind a tunnel), so this measures the two things we CAN measure
honestly, per SURVEY.md section 5 implication 4:

1. Real-chip single-device throughput (the per-chip term of the scaling
   product) — from bench.py / benchmarks/bench_serving.py.
2. Mesh-size sweep on a virtual CPU device mesh
   (--xla_force_host_platform_device_count): per-shard work and the
   collective top-k merge run the exact production code path
   (build_tile_shards + sharded_tiles_topk). CPU wall-clock is NOT a TPU
   projection; what this validates is work division (per-device tile
   counts) and merge overhead (bytes over the collective), both printed.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python benchmarks/bench_scaling.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_dev_req = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    os.environ.setdefault(
        "XLA_FLAGS", f"--xla_force_host_platform_device_count={n_dev_req}")
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

    import tempfile

    from swimm_tpu.db import build_db
    from swimm_tpu.models.engine import SearchConfig
    from swimm_tpu.parallel.mesh import make_mesh
    from swimm_tpu.parallel.sharded_search import (TOPK_PER_SHARD,
                                                   build_tile_shards,
                                                   sharded_search)
    from swimm_tpu.utils.synth import synth_db, synth_queries

    n_dev = len(jax.devices())
    queries = synth_queries(4, [80, 144, 200, 300], seed=1)
    recs = synth_db(4000, seed=2, queries=[q.codes for q in queries],
                    homolog_frac=0.01)
    with tempfile.TemporaryDirectory() as td:
        packed = build_db(recs, td, V=8)
        cfg = SearchConfig(backend="xla", precision="f32", top_k=16)
        base_hits = None
        print(f"{'mesh':>6} {'tiles/dev (max/min)':>20} {'merge bytes':>12} "
              f"{'steady ms':>10} {'exact':>6}")
        for nd in [d for d in (1, 2, 4, 8) if d <= n_dev]:
            mesh = make_mesh(nd)
            tiles_all, *_rest, R_loc = build_tile_shards(packed, mesh)
            t_max = tiles_all.shape[1]
            counts = [int((np.asarray(_rest[0][d]) != R_loc - 1).sum())
                      for d in range(nd)]
            merge_bytes = nd * TOPK_PER_SHARD * 8 * len(queries)
            results, met = sharded_search(packed, queries, cfg, mesh=mesh)
            t0 = time.perf_counter()
            results, met = sharded_search(packed, queries, cfg, mesh=mesh)
            ms = (time.perf_counter() - t0) * 1e3
            hits = [[(h.score, h.sorted_idx) for h in r.hits]
                    for r in results]
            if base_hits is None:
                base_hits = hits
            print(f"{nd:>6} {max(counts):>10}/{min(counts):<9} "
                  f"{merge_bytes:>12} {ms:>10.0f} "
                  f"{'yes' if hits == base_hits else 'NO':>6}")
            assert hits == base_hits, "sharded result diverged across mesh sizes"
    print("per-chip TPU throughput: see bench.py / benchmarks/bench_serving.py")
    return 0


if __name__ == "__main__":
    sys.exit(main())
