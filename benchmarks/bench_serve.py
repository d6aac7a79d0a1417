import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Persistent-server request latency + batched concurrency
(swimm_tpu/server.py, `swtpu serve --listen`).

The measured argument FOR a resident server on this stack: a fresh
process pays ~5 min of device-acquisition stall plus ~5 min of per-shape
program loads (BASELINE.md round 4) before its first score, while a
resident server pays that once and then serves each request at pure
search latency (measured r4: median 0.27 s/request at 570k-seq scale,
startup 558 s).

Two phases through ONE `swtpu serve --listen` subprocess on the
Swiss-Prot-scale bench DB, pre-warmed via --warm:

  serial      N single-query requests back to back, client-side timing
              (JSON in -> JSON out, includes protocol + marshalling)
  concurrent  N single-query requests fired from N connections at once;
              the server's adaptive micro-batcher coalesces whatever
              queues behind the running search into one multi-query
              dispatch, so total wall should approach ONE batched
              search, not N serial ones

Round-5 additions:
  --soak N     N further serial requests cycling the query set, with the
               SERVER process RSS sampled from /proc (is memory flat over
               hundreds of requests?) -> soak_* keys incl. rss growth
  --stream     start the server in the windowed streaming posture
               (--stream: DB larger than HBM) and measure the same
               request latencies through it

Prints one JSON line:
  {"startup_s": ..., "serial_request_s": [...], "median_request_s": ...,
   "request_gcups": ..., "concurrent_wall_s": ..., "concurrent_n": ...,
   "concurrent_dispatches": ..., "concurrent_gcups": ...,
   "soak_n"?: ..., "soak_errors"?: ..., "soak_p50_s"?: ...,
   "soak_p95_s"?: ..., "soak_rss_first_mb"?: ..., "soak_rss_last_mb"?: ...,
   "soak_rss_growth_mb"?: ..., "posture"?: "stream"}

Usage: python benchmarks/bench_serve.py [--n-requests 5] [--n-seqs N]
       [--concurrent 8] [--soak 0] [--stream]
"""

import argparse
import json
import pathlib
import re
import socket
import subprocess
import sys
import threading
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent


def _request(port, req, timeout=600):
    with socket.create_connection(("127.0.0.1", port), timeout=timeout) as s:
        f = s.makefile("rw", encoding="utf-8")
        f.write(json.dumps(req) + "\n")
        f.flush()
        return json.loads(f.readline())


def _rss_mb(pid) -> float:
    """Resident set size of a process in MB (Linux /proc)."""
    with open(f"/proc/{pid}/status") as fh:
        for line in fh:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-requests", type=int, default=5)
    ap.add_argument("--concurrent", type=int, default=8)
    ap.add_argument("--n-seqs", type=int, default=570_000)
    ap.add_argument("--top-k", type=int, default=16)
    ap.add_argument("--soak", type=int, default=0,
                    help="extra serial requests cycling the query set, "
                         "with server RSS sampled (memory-flatness soak)")
    ap.add_argument("--stream", action="store_true",
                    help="serve through the windowed streaming posture")
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
    n_q = args.n_requests + args.concurrent
    qlens = [int(x) for x in rng.integers(100, 501, size=n_q)]
    queries = synth_queries(n_q, qlens, seed=5)

    env = dict(
        __import__("os").environ,
        SWTPU_CACHE=str(REPO / ".jax_cache"))
    t0 = time.perf_counter()
    proc = subprocess.Popen(
        [sys.executable, "-m", "swimm_tpu.cli", "serve",
         "-d", str(dbdir), "-r", str(args.top_k),
         "--listen", "127.0.0.1:0",
         "--warm", ",".join(str(l) for l in qlens)]
        + (["--stream"] if args.stream else []),
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        text=True, bufsize=1, cwd=str(REPO), env=env)
    try:
        port = None
        for line in proc.stderr:
            m = re.search(r"bound 127\.0\.0\.1:(\d+)", line)
            if m:
                port = int(m.group(1))
            if "serving" in line:
                break
        if port is None:
            print(json.dumps({"error": "server exited before binding"}))
            return 1
        # drain stderr in the background so the server never blocks on it
        threading.Thread(target=lambda: [None for _ in proc.stderr],
                         daemon=True).start()
        assert _request(port, {"cmd": "ping"})["ok"]
        startup_s = time.perf_counter() - t0

        def req_for(i):
            q = queries[i]
            return {"id": i, "queries": [
                {"title": q.title, "seq": decode(q.codes)}]}

        lat, cells = [], []
        for i in range(args.n_requests):
            t1 = time.perf_counter()
            resp = _request(port, req_for(i))
            lat.append(time.perf_counter() - t1)
            if "error" in resp:
                print(json.dumps({"error": resp["error"], "request": i}))
                return 1
            cells.append(resp["metrics"]["cells"])

        # concurrent phase: N clients at once; the first request in the
        # door dispatches alone, the rest coalesce behind it
        conc = [None] * args.concurrent
        ts = [threading.Thread(
            target=lambda j=j: conc.__setitem__(
                j, _request(port, req_for(args.n_requests + j))))
            for j in range(args.concurrent)]
        t2 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        conc_wall = time.perf_counter() - t2
        for j, resp in enumerate(conc):
            if resp is None or "error" in (resp or {}):
                print(json.dumps({"error": f"concurrent request {j}: "
                                  f"{(resp or {}).get('error', 'no reply')}"}))
                return 1
        # batch members share one metrics dict verbatim; distinct
        # dispatches differ (at least in their timings), so deduping the
        # serialized metrics counts dispatches and sums cells once each
        uniq = {json.dumps(r["metrics"], sort_keys=True) for r in conc}
        n_dispatch = len(uniq)
        conc_cells = sum(json.loads(u)["cells"] for u in uniq)

        soak = {}
        if args.soak > 0:
            # memory-flatness soak: does a long-lived server's RSS stay
            # flat over many requests? First-request RSS is the anchor
            # (first requests may still fault in pages); growth past it
            # indicates a leak in the serving loop.
            slat, errors = [], 0
            rss_first = rss_last = None
            for i in range(args.soak):
                t3 = time.perf_counter()
                resp = _request(port, req_for(i % n_q))
                slat.append(time.perf_counter() - t3)
                if "error" in resp:
                    errors += 1
                if i == 0:
                    rss_first = _rss_mb(proc.pid)
            rss_last = _rss_mb(proc.pid)
            s = sorted(slat)
            soak = {
                "soak_n": args.soak,
                "soak_errors": errors,
                "soak_p50_s": round(s[len(s) // 2], 2),
                "soak_p95_s": round(s[int(len(s) * 0.95)], 2),
                "soak_rss_first_mb": round(rss_first, 1),
                "soak_rss_last_mb": round(rss_last, 1),
                "soak_rss_growth_mb": round(rss_last - rss_first, 1),
            }

        _request(port, {"cmd": "shutdown"}, timeout=60)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    med = sorted(lat)[len(lat) // 2]
    med_cells = sorted(cells)[len(cells) // 2]
    print(json.dumps({
        "metric": ("request latency through a resident swtpu serve "
                   f"--listen process, 1 query/request vs "
                   f"{args.n_seqs}-seq DB"
                   + (" (streaming posture)" if args.stream else "")),
        **({"posture": "stream"} if args.stream else {}),
        "startup_s": round(startup_s, 1),
        "serial_request_s": [round(x, 2) for x in lat],
        "median_request_s": round(med, 2),
        "request_gcups": round(med_cells / med / 1e9, 1),
        "concurrent_n": args.concurrent,
        "concurrent_wall_s": round(conc_wall, 2),
        "concurrent_dispatches": n_dispatch,
        "concurrent_gcups": round(conc_cells / conc_wall / 1e9, 1),
        **soak,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
