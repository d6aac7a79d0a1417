import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Persistent-server request latency (swimm_tpu/server.py, `swtpu serve`).

The measured argument FOR a resident server on this stack: a fresh
process pays ~5 min of device-acquisition stall plus ~5 min of per-shape
program loads (BASELINE.md round 4) before its first score, while a
resident server pays that once and then serves each request at pure
search latency. This benchmark starts ONE `swtpu serve` subprocess on
the Swiss-Prot-scale bench DB, pre-warms the request query lengths via
--warm, then times N single-batch requests end-to-end from the client
side (JSON in -> JSON out, includes protocol + result marshalling).

Prints one JSON line:
  {"startup_s": ..., "request_s": [...], "median_request_s": ...,
   "request_gcups": ...}

Usage: python benchmarks/bench_serve.py [--n-requests 5] [--n-seqs N]
"""

import argparse
import json
import pathlib
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-requests", type=int, default=5)
    ap.add_argument("--n-seqs", type=int, default=570_000)
    ap.add_argument("--top-k", type=int, default=16)
    args = ap.parse_args()

    from swimm_tpu.alphabet import decode
    from swimm_tpu.utils.synth import synth_queries

    dbdir = REPO / f".bench_sp_{args.n_seqs}" / "db"
    if not (dbdir / "manifest.json").exists():
        print(json.dumps({"error": f"bench DB missing at {dbdir}; run "
                          "bench.py (or bench_swissprot.py) once first"}))
        return 1

    # one query per request, same length population as the headline bench
    rng = np.random.default_rng(3)
    qlens = [int(x) for x in rng.integers(100, 501,
                                          size=args.n_requests)]
    queries = synth_queries(args.n_requests, qlens, seed=5)

    env = dict(
        __import__("os").environ,
        SWTPU_CACHE=str(REPO / ".jax_cache"))
    t0 = time.perf_counter()
    proc = subprocess.Popen(
        [sys.executable, "-m", "swimm_tpu.cli", "serve",
         "-d", str(dbdir), "-r", str(args.top_k),
         "--warm", ",".join(str(l) for l in qlens)],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, bufsize=1,
        cwd=str(REPO), env=env)
    try:
        # first response proves liveness AND that warm compiles finished
        proc.stdin.write(json.dumps({"cmd": "ping"}) + "\n")
        proc.stdin.flush()
        assert json.loads(proc.stdout.readline())["ok"]
        startup_s = time.perf_counter() - t0

        lat = []
        cells = []
        for i, q in enumerate(queries):
            req = {"id": i, "queries": [
                {"title": q.title, "seq": decode(q.codes)}]}
            t1 = time.perf_counter()
            proc.stdin.write(json.dumps(req) + "\n")
            proc.stdin.flush()
            resp = json.loads(proc.stdout.readline())
            lat.append(time.perf_counter() - t1)
            if "error" in resp:
                print(json.dumps({"error": resp["error"], "request": i}))
                return 1
            cells.append(resp["metrics"]["cells"])

        proc.stdin.write(json.dumps({"cmd": "shutdown"}) + "\n")
        proc.stdin.flush()
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    med = sorted(lat)[len(lat) // 2]
    med_cells = sorted(cells)[len(cells) // 2]
    print(json.dumps({
        "metric": ("request latency through a resident swtpu serve "
                   f"process, 1 query/request x {args.n_requests} "
                   f"requests vs {args.n_seqs}-seq DB"),
        "startup_s": round(startup_s, 1),
        "request_s": [round(x, 2) for x in lat],
        "median_request_s": round(med, 2),
        "request_gcups": round(med_cells / med / 1e9, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
