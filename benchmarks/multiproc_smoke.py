"""REAL multi-process (multi-host) execution smoke test — VERDICT r1 #1.

Spawns N OS processes, each a jax.distributed participant with 4 virtual
CPU devices, forming one global ('data','query') mesh (the same code path a
v5e/v5p multi-host pod uses over DCN; SURVEY.md section 6.8, BASELINE
config 4). Each process:

  1. loads the SAME packed DB from disk,
  2. materializes ONLY its own tile shards (distributed.global_tile_shards
     -> make_array_from_callback with per-host callbacks),
  3. runs the production sharded_search driver (shard_map kernel + per-shard
     lax.top_k + cross-process all_gather merge),
  4. checks make_global_chunk's global assembly via an on-device global
     reduction against a host-side expected checksum,
  5. writes its ranked hit lists to a JSON file.

The parent compares every process's hit lists against the single-process
serial driver (bit-exactness contract). Run directly:

    python benchmarks/multiproc_smoke.py [--n-procs 2] [--n-seqs 300]

Exit code 0 = pass. tests/test_multiproc.py runs this under pytest.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


# ----------------------------------------------------------------- worker

def worker(args) -> int:
    # env (JAX_PLATFORMS=cpu, 4 virtual devices) is set by the parent
    sys.path.insert(0, str(REPO))
    import jax
    jax.config.update("jax_platforms", "cpu")   # beat any sitecustomize
    import numpy as np

    from swimm_tpu.db import load_db
    from swimm_tpu.fasta import read_fasta
    from swimm_tpu.models.engine import SearchConfig
    from swimm_tpu.parallel import distributed
    from swimm_tpu.parallel.sharded_search import sharded_search

    distributed.init(coordinator_address=f"localhost:{args.port}",
                     num_processes=args.n_procs, process_id=args.pid)
    assert jax.process_count() == args.n_procs, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == 4 * args.n_procs, n_global

    mesh = distributed.global_mesh(query_axis=args.query_axis)
    packed = load_db(args.db)
    queries = read_fasta(args.queries)
    cfg = SearchConfig(backend="xla", top_k=8)

    # --- make_global_chunk: global on-device checksum vs host expectation
    from swimm_tpu.alphabet import PAD_CODE
    ch = packed.chunks[0]
    nb = ch.codes.shape[0]
    lo, hi = distributed.host_block_range(nb, mesh)
    local_blocks = np.ascontiguousarray(ch.codes[lo:min(hi, nb)])
    garr = distributed.make_global_chunk(local_blocks, nb, mesh)
    got = int(np.asarray(jax.jit(
        lambda x: (x.astype("int32") - PAD_CODE).sum(),
        out_shardings=jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))(garr)))
    want = int((ch.codes.astype(np.int64) - PAD_CODE).sum())
    assert got == want, f"make_global_chunk checksum {got} != {want}"

    # --- production multi-host search: per-host shard assembly
    shards = distributed.global_tile_shards(packed, mesh)
    results, metrics = sharded_search(packed, queries, cfg, mesh=mesh,
                                      tile_shards=shards,
                                      measure_merge=True)

    # --- multi-host STREAMING search: per-host span assembly, same
    # collective candidate contract over super-windows
    from swimm_tpu.parallel.sharded_stream import search_streaming_sharded
    scfg = SearchConfig(backend="xla", top_k=8, db_stream=True,
                        window_tiles=16, max_in_flight=2)
    sresults, _ = search_streaming_sharded(packed, queries, scfg, mesh=mesh)

    # --- E-value statistics under multi-process sharding: the per-shard
    # histograms psum across PROCESS boundaries (gloo) and must
    # reproduce the single-process resident null model
    ecfg = SearchConfig(backend="xla", top_k=8, evalue=True)
    eresults, _ = sharded_search(packed, queries, ecfg, mesh=mesh,
                                 tile_shards=shards)

    out = {
        "pid": args.pid,
        "n_processes": jax.process_count(),
        "mesh": {k: int(v) for k, v in mesh.shape.items()},
        "merge_checksum_ok": True,
        "results": [[[h.score, h.sorted_idx] for h in r.hits]
                    for r in results],
        "stream_results": [[[h.score, h.sorted_idx] for h in r.hits]
                           for r in sresults],
        "evalue_results": [[[h.score, h.sorted_idx, h.evalue]
                            for h in r.hits] for r in eresults],
        "timers": metrics.timers,
    }
    Path(args.out).write_text(json.dumps(out))
    return 0


# ----------------------------------------------------------------- parent

def parent(args) -> int:
    import numpy as np

    tmp = Path(tempfile.mkdtemp(prefix="swtpu_multiproc_"))
    sys.path.insert(0, str(REPO))
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from swimm_tpu.db import build_db
    from swimm_tpu.fasta import write_fasta
    from swimm_tpu.models.engine import SearchConfig, search
    from swimm_tpu.utils.synth import synth_db, synth_queries

    queries = synth_queries(4, [40, 72, 100, 56], seed=7)
    recs = synth_db(args.n_seqs, seed=13, median_len=70, sigma=0.4,
                    max_len=260, queries=[q.codes for q in queries],
                    homolog_frac=0.05)
    qfa = tmp / "queries.fasta"
    write_fasta(qfa, queries)
    dbdir = tmp / "db"
    packed = build_db(recs, dbdir, V=16)

    cfg = SearchConfig(backend="xla", top_k=8)
    serial, _ = search(packed, queries, cfg)
    expect = [[[h.score, h.sorted_idx] for h in r.hits] for r in serial]
    eserial, _ = search(packed, queries,
                        SearchConfig(backend="xla", top_k=8, evalue=True))
    expect_e = [[[h.score, h.sorted_idx, h.evalue] for h in r.hits]
                for r in eserial]

    port = _free_port()
    procs = []
    outs = []
    for pid in range(args.n_procs):
        out = tmp / f"out_{pid}.json"
        outs.append(out)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env.pop("JAX_NUM_PROCESSES", None)
        cmd = [sys.executable, __file__, "--worker", "--pid", str(pid),
               "--port", str(port), "--n-procs", str(args.n_procs),
               "--query-axis", str(args.query_axis),
               "--db", str(dbdir), "--queries", str(qfa),
               "--out", str(out)]
        procs.append(subprocess.Popen(cmd, env=env, cwd=str(REPO)))
    rcs = [p.wait(timeout=600) for p in procs]
    if any(rcs):
        print(f"FAIL: worker exit codes {rcs}", file=sys.stderr)
        return 1

    ok = True
    for pid, out in enumerate(outs):
        got = json.loads(out.read_text())
        assert got["n_processes"] == args.n_procs
        for leg in ("results", "stream_results"):
            if got[leg] != expect:
                print(f"FAIL: process {pid} {leg} hit lists != serial "
                      "driver", file=sys.stderr)
                for qe, qg in zip(expect, got[leg]):
                    if qe != qg:
                        print(f"  expect {qe}\n  got    {qg}",
                              file=sys.stderr)
                ok = False
        # E-value leg: (score, idx) exact; evalues match the resident
        # null model to float tolerance (cross-process psum is exact on
        # integer counts; the fit arithmetic is deterministic)
        for qe, qg in zip(expect_e, got["evalue_results"]):
            same = len(qe) == len(qg) and all(
                e[:2] == g[:2] and abs(e[2] - g[2]) <=
                1e-6 * max(abs(e[2]), 1e-12)
                for e, g in zip(qe, qg))
            if not same:
                print(f"FAIL: process {pid} evalue_results != resident "
                      f"statistics\n  expect {qe}\n  got    {qg}",
                      file=sys.stderr)
                ok = False
    if ok:
        print(json.dumps({
            "multiproc_smoke": "PASS",
            "n_procs": args.n_procs,
            "devices_per_proc": 4,
            "query_axis": args.query_axis,
            "n_seqs": args.n_seqs,
            "n_queries": len(queries),
            "hit_lists": "exact vs serial driver on every process "
                         "(resident + streaming super-window + E-value "
                         "statistics legs)",
        }))
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--n-procs", type=int, default=2)
    ap.add_argument("--query-axis", type=int, default=2)
    ap.add_argument("--n-seqs", type=int, default=300)
    ap.add_argument("--db", default=None)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    return worker(args) if args.worker else parent(args)


if __name__ == "__main__":
    sys.exit(main())
