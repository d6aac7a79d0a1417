import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""E-value statistics overhead at Swiss-Prot scale.

The statistics posture reuses the fused serving dispatch and adds one
device histogram per query (MXU one-hot matmuls over ~35 lane slices,
utils/stats.py). This script measures the resident serving rate with
and without `evalue=True` on the cached Swiss-Prot-scale DB and reports
the overhead fraction — the honest cost of `--evalue` in production.

Prints one JSON line per phase + a final summary line.
"""

import json
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def main() -> int:
    import jax
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

    from swimm_tpu.db import load_db
    from swimm_tpu.models.engine import SearchConfig, search
    from swimm_tpu.utils.synth import synth_queries

    on_tpu = jax.default_backend() != "cpu"
    n_seqs = 570_000 if on_tpu else 1_500
    dbdir = REPO / f".bench_sp_{n_seqs}" / "db"
    if not (dbdir / "manifest.json").exists():
        print(json.dumps({"error": f"no cached DB at {dbdir}; run "
                          "benchmarks/bench_swissprot.py first"}))
        return 1
    packed = load_db(dbdir)
    rng = np.random.default_rng(0)
    n_q = 20 if on_tpu else 4
    queries = synth_queries(n_q, list(rng.integers(100, 501, size=n_q)),
                            seed=1)

    out = {}
    for name, cfg in (("plain", SearchConfig(top_k=16)),
                      ("evalue", SearchConfig(top_k=16, evalue=True))):
        search(packed, queries, cfg)                 # warm compiles
        best = None
        for _ in range(3):
            results, met = search(packed, queries, cfg)
            if best is None or met.seconds < best.seconds:
                best = met
        out[name] = {"gcups": round(best.gcups, 1),
                     "seconds": round(best.seconds, 3)}
        print(json.dumps({"phase": name, **out[name]}), flush=True)
        if name == "evalue":
            top = results[0].hits[0]
            out["top_hit_evalue"] = top.evalue
    out["evalue_overhead_frac"] = round(
        out["evalue"]["seconds"] / out["plain"]["seconds"] - 1.0, 3)
    print(json.dumps({"summary": out}))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
