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

Link-health context (round 4): the dev tunnel's character swings by
ORDERS OF MAGNITUDE between epochs — measured 25-30 MB/s H2D (r2),
~580 MB/s H2D + ~55 ms/result-pull (r3), and ~40-100 MB/s + ~1.8 s/pull
(r4). Numbers that depend on the link (streaming H2D overlap; anything
with per-rep result pulls) are only interpretable next to the link state
they were measured under, so every run now
  - probes the link first and reports it ("h2d_mbps", "pull_rtt_ms"),
  - runs under a wall-clock budget (SWTPU_BENCH_BUDGET_S, default 450 s)
    and degrades gracefully: repeats shrink and optional extras are
    skipped (with a reason key) rather than timing the whole run out —
    the headline number always prints.

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
import time

import numpy as np

N_SEQS = 570_000
N_QUERIES = 20
REPO = pathlib.Path(__file__).resolve().parent
T0 = time.perf_counter()
BUDGET_S = float(os.environ.get("SWTPU_BENCH_BUDGET_S", "450"))
_T_RUN = [T0]


def elapsed() -> float:
    return time.perf_counter() - T0


def run_elapsed() -> float:
    """Seconds since the budget anchor. First device contact after
    process start stalls for MINUTES (observed 275-325 s, every fresh
    process), and the resident warmup pays another ~5 min of per-shape
    program loads; both are environment, not measurement, so the phase
    budget re-anchors after the probe and again after warmup."""
    return time.perf_counter() - _T_RUN[0]


def note(msg: str) -> None:
    """Phase progress to stderr (stdout stays the one JSON line); lets a
    timed-out run show WHERE the wall clock went."""
    print(f"[bench +{elapsed():.0f}s] {msg}", file=sys.stderr, flush=True)


def probe_link():
    """Measure the tunnel's bulk H2D bandwidth and result-pull round trip
    (~seconds total). Both swing wildly between epochs (module docstring);
    reporting them makes every link-dependent number interpretable."""
    import jax
    import jax.numpy as jnp
    x = np.zeros(16 * 1024 * 1024, np.int8)
    t0 = time.perf_counter()
    jax.device_put(x).block_until_ready()
    h2d_mbps = 16.0 / max(time.perf_counter() - t0, 1e-9)
    f = jax.jit(lambda a: a + 1.0)
    y = jnp.zeros((8, 128), jnp.float32)
    np.asarray(f(y))                      # compile + first pull
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(y))
        ts.append(time.perf_counter() - t0)
    return round(h2d_mbps, 1), round(sorted(ts)[1] * 1000, 1)


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

    note("db ready")
    link = {}
    if on_tpu:
        try:
            h2d, rtt = probe_link()
            link = {"h2d_mbps": h2d, "pull_rtt_ms": rtt}
        except Exception as e:
            link = {"link_probe_error": f"{type(e).__name__}: {e}"[:120]}
    _T_RUN[0] = time.perf_counter()       # budget anchor (see run_elapsed)

    # max-throughput posture: per-length compiled shapes (query_pack=False)
    # — tightest padding; the deterministic query set means the ~15 kernel
    # shapes compile once ever and persist in .jax_cache. The bounded-shape
    # packed posture (default in production) is measured in
    # benchmarks/bench_serving.py; both are recorded in BASELINE.md.
    note(f"link probe done: {link}")
    cfg = SearchConfig(top_k=16, query_pack=False,
                       backend="pallas" if on_tpu else "xla")
    search(packed, queries, cfg)          # warmup: compile + DB upload
    note("resident warmup done")
    _T_RUN[0] = time.perf_counter()       # re-anchor: warmup pays one-time
    # per-process costs (device acquisition stalls, per-shape program
    # loads through the tunnel — measured ~5-6 min/fresh process even
    # with every program in the persistent cache); the budget should
    # gate MEASUREMENT time, not environment time
    best = None
    reps = 0
    while reps < 3 and (reps == 0 or run_elapsed() < 0.55 * BUDGET_S):
        _, met = search(packed, queries, cfg)
        reps += 1
        if best is None or met.seconds < best.seconds:
            best = met
        note(f"resident rep {reps}: {met.seconds:.1f}s")

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
        "resident_reps": reps,
        **link,
    }
    if on_tpu and not os.environ.get("SWTPU_BENCH_NO_EXTRAS"):
        # round-3 postures on the same DB + batch, LEAST link-sensitive
        # first (ladder is compute-shaped like the resident path; the
        # stream crosses the link once per rep and can eat a whole
        # multi-minute tunnel stall, so it runs after everything else).
        if run_elapsed() < 0.55 * BUDGET_S:
            try:
                lcfg = SearchConfig(top_k=16, precision="ladder",
                                    backend="pallas")
                search(packed, queries, lcfg)              # warm compiles
                m = None
                for _ in range(2):
                    _, mi = search(packed, queries, lcfg)
                    if m is None or mi.seconds < m.seconds:
                        m = mi
                    if run_elapsed() > 0.65 * BUDGET_S:
                        break
                note(f"ladder best: {m.seconds:.1f}s")
                out["ladder_gcups"] = round(m.gcups, 1)
                out["ladder_frac_of_resident"] = round(m.gcups / gcups, 2)
            except Exception as e:
                out["ladder_error"] = f"{type(e).__name__}: {e}"[:120]
        else:
            out["ladder_skipped"] = "wall budget"
    if on_tpu and not os.environ.get("SWTPU_BENCH_NO_MFU"):
        if run_elapsed() < 0.75 * BUDGET_S:
            try:
                sys.path.insert(0, str(REPO / "benchmarks"))
                import roofline
                note("mfu section start")
                opc = roofline.ops_per_cell(1024)
                padded = roofline.measure_kernel_padded_gcups(1024)
                issued = padded["median"] * 1e9 * opc["total"]
                out["kernel_padded_gcups"] = round(padded["median"], 1)
                out["kernel_padded_gcups_band"] = [round(padded["min"], 1),
                                                   round(padded["max"], 1)]
                out["mfu_pct"] = round(100 * issued / roofline.VPU_PEAK_OPS,
                                       1)
                out["mfu_pct_band"] = [
                    round(100 * padded[k] * 1e9 * opc["total"]
                          / roofline.VPU_PEAK_OPS, 1)
                    for k in ("min", "max")]
            except Exception as e:        # never fail the headline number
                out["mfu_error"] = f"{type(e).__name__}: {e}"[:120]
        else:
            out["mfu_skipped"] = "wall budget"
    if on_tpu and not os.environ.get("SWTPU_BENCH_NO_EXTRAS"):
        # streaming LAST: it re-crosses the link once per rep (208 MB at
        # Swiss-Prot scale), so it is the posture a mid-run tunnel stall
        # hits hardest. stream_link_floor_s = db_mb / probed h2d_mbps is
        # the link-bound time for one pass; stream_stall_limited=true
        # flags a best rep that took far longer than compute + that
        # floor — i.e. the number reflects a tunnel stall, not the
        # engine (the r3 driver-bench discrepancy: 0.25x recorded vs
        # 0.92x measured in-round was exactly such an epoch).
        db_mb = sum(ch.n_blocks * ch.L * ch.V
                    for ch in packed.chunks) / 1e6
        if run_elapsed() < 0.85 * BUDGET_S:
            try:
                scfg = SearchConfig(top_k=16, db_stream=True,
                                    backend="pallas")
                m = None
                for _ in range(3):
                    _, mi = search(packed, queries, scfg)
                    if m is None or mi.seconds < m.seconds:
                        m = mi
                    if run_elapsed() > 0.95 * BUDGET_S:
                        break
                note(f"stream best: {m.seconds:.1f}s")
                out["stream_gcups"] = round(m.gcups, 1)
                out["stream_frac_of_resident"] = round(m.gcups / gcups, 2)
                out["stream_seconds"] = round(m.seconds, 1)
                if link.get("h2d_mbps"):
                    floor = db_mb / link["h2d_mbps"]
                    out["stream_link_floor_s"] = round(floor, 1)
                    out["stream_stall_limited"] = bool(
                        m.seconds > 2.0 * (best.seconds + floor))
            except Exception as e:
                out["stream_error"] = f"{type(e).__name__}: {e}"[:120]
        else:
            out["stream_skipped"] = "wall budget"
    out["bench_wall_s"] = round(elapsed(), 1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
