"""Headline benchmark: end-to-end serving GCUPS/chip on BASELINE config 2
at Swiss-Prot scale.

A 570k-sequence / ~2e8-residue synthetic Swiss-Prot-scale database
(BASELINE metric #2's stated scale) resident in HBM is searched by a
20-query batch (100-500 aa, BLOSUM62 10/2) through the production path:
ragged whole-DB kernel dispatches + fused device top-k. Prints ONE JSON
line:
  {"metric": ..., "value": GCUPS, "unit": "GCUPS", "vs_baseline": ...}

GCUPS counts REAL cells (true query length x true db residues — the
standard convention in the SW literature; pad rows/lanes are not counted).
vs_baseline divides by 150 — the midpoint of the reference's host-only
dual-Xeon AVX2 whole-search figure (~100-200 GCUPS, BASELINE.md,
unverified [paper-mem]) — i.e. one v5e chip vs the reference's whole node.

Extra keys (same line): seq_scores/s and the roofline MFU figures from
benchmarks/roofline.py (VERDICT r1 #5) — skipped if SWTPU_BENCH_NO_MFU=1 —
plus the round-3 serving postures on the same DB/batch: window-major batch
streaming (stream_gcups; DB crosses the link once per batch) and the
adaptive-precision ladder (ladder_gcups), each with its fraction of the
resident number — skipped if SWTPU_BENCH_NO_EXTRAS=1.

The synthetic DB is cached at .bench_sp_*/ (shared with
benchmarks/bench_swissprot.py) and compiled programs persist in
.jax_cache/, so repeat rounds skip the cold start. Kernel-only and
scaling benchmarks live in benchmarks/.
"""

import json
import os
import pathlib
import sys

import numpy as np

N_SEQS = 570_000
N_QUERIES = 20
REPO = pathlib.Path(__file__).resolve().parent


def main() -> int:
    import jax
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

    from swimm_tpu.db import build_db, load_db
    from swimm_tpu.models.engine import SearchConfig, search
    from swimm_tpu.utils.synth import synth_fasta_fast, synth_queries

    on_tpu = jax.default_backend() != "cpu"
    n_seqs = N_SEQS if on_tpu else 2_000
    n_q = N_QUERIES if on_tpu else 4

    rng = np.random.default_rng(0)
    qlens = list(rng.integers(100, 501, size=n_q))
    queries = synth_queries(n_q, qlens, seed=1)

    root = REPO / f".bench_sp_{n_seqs}"
    root.mkdir(exist_ok=True)
    dbdir = root / "db"
    if (dbdir / "manifest.json").exists():
        packed = load_db(dbdir)
    else:
        fasta = root / "sp.fasta"
        if not fasta.exists():
            synth_fasta_fast(fasta, n_seqs, seed=2,
                             queries=[q.codes for q in queries],
                             homolog_frac=0.0005)
        packed = build_db(str(fasta), dbdir, V=128)

    # max-throughput posture: per-length compiled shapes (query_pack=False)
    # — tightest padding; the deterministic query set means the ~15 kernel
    # shapes compile once ever and persist in .jax_cache. The bounded-shape
    # packed posture (default in production) is measured in
    # benchmarks/bench_serving.py; both are recorded in BASELINE.md.
    cfg = SearchConfig(top_k=16, query_pack=False,
                       backend="pallas" if on_tpu else "xla")
    search(packed, queries, cfg)          # warmup: compile + DB upload
    best = None
    for _ in range(3):
        _, met = search(packed, queries, cfg)
        if best is None or met.seconds < best.seconds:
            best = met

    gcups = best.gcups                    # real cells / time
    out = {
        "metric": ("GCUPS/chip, end-to-end exact SW search "
                   f"({n_q} queries 100-500aa vs {n_seqs}-seq "
                   f"{packed.total_residues}-residue DB, BLOSUM62 10/2, "
                   "HBM-resident serving path, real cells)"),
        "value": round(gcups, 1),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / 150.0, 2),
        "seq_scores_per_sec_M": round(best.seqs_per_sec / 1e6, 2),
    }
    if on_tpu and not os.environ.get("SWTPU_BENCH_NO_EXTRAS"):
        # round-3 postures on the same DB + batch (best of 2, warm)
        try:
            scfg = SearchConfig(top_k=16, db_stream=True, backend="pallas")
            search(packed, queries, scfg)                  # warm compiles
            m = min((search(packed, queries, scfg)[1] for _ in range(2)),
                    key=lambda m: m.seconds)
            out["stream_gcups"] = round(m.gcups, 1)
            out["stream_frac_of_resident"] = round(m.gcups / gcups, 2)
        except Exception as e:
            out["stream_error"] = f"{type(e).__name__}: {e}"[:120]
        try:
            lcfg = SearchConfig(top_k=16, precision="ladder",
                                backend="pallas")
            search(packed, queries, lcfg)                  # warm compiles
            m = min((search(packed, queries, lcfg)[1] for _ in range(2)),
                    key=lambda m: m.seconds)
            out["ladder_gcups"] = round(m.gcups, 1)
            out["ladder_frac_of_resident"] = round(m.gcups / gcups, 2)
        except Exception as e:
            out["ladder_error"] = f"{type(e).__name__}: {e}"[:120]
    if on_tpu and not os.environ.get("SWTPU_BENCH_NO_MFU"):
        try:
            sys.path.insert(0, str(REPO / "benchmarks"))
            import roofline
            opc = roofline.ops_per_cell(1024)
            padded = roofline.measure_kernel_padded_gcups(1024)
            issued = padded["median"] * 1e9 * opc["total"]
            out["kernel_padded_gcups"] = round(padded["median"], 1)
            out["kernel_padded_gcups_band"] = [round(padded["min"], 1),
                                               round(padded["max"], 1)]
            out["mfu_pct"] = round(100 * issued / roofline.VPU_PEAK_OPS, 1)
            out["mfu_pct_band"] = [
                round(100 * padded[k] * 1e9 * opc["total"]
                      / roofline.VPU_PEAK_OPS, 1) for k in ("min", "max")]
        except Exception as e:            # never fail the headline number
            out["mfu_error"] = f"{type(e).__name__}: {e}"[:120]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
