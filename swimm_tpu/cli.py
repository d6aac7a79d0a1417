"""swtpu CLI (L5, reference component C1 — SURVEY.md sections 3 and 6.6).

Two subcommands mirroring the reference's op modes (SURVEY.md section 1
item 1): ``preprocess`` (FASTA -> packed binary DB) and ``search`` (packed DB
+ query FASTA -> ranked top-k hit lists + GCUPS). Flag surface mirrors the
reference's getopt knobs (-q/-d/-s/-g/-e/-r, SURVEY.md section 6.6) plus
TPU-specific knobs (backend, precision policy, lane width, sharding).

Also provides ``synth`` (generate synthetic FASTA — no network, so no
Swiss-Prot download; SURVEY.md section 8 environment notes).
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_common_scoring_flags(p):
    p.add_argument("-s", "--matrix", default="BLOSUM62",
                   help="substitution matrix (BLOSUM45/50/62/80/90, PAM30/70/250)")
    p.add_argument("-g", "--gap-open", type=int, default=10)
    p.add_argument("-e", "--gap-extend", type=int, default=2)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="swtpu",
        description="TPU-native Smith-Waterman protein database search")
    sub = ap.add_subparsers(dest="command", required=True)

    pp = sub.add_parser("preprocess", help="pack a FASTA database")
    pp.add_argument("-i", "--input", required=True, help="input FASTA")
    pp.add_argument("-o", "--output", required=True, help="output DB directory")
    pp.add_argument("--lanes", type=int, default=128,
                    help="db sequences per vector block (V)")
    pp.add_argument("--resume", action="store_true",
                    help="reuse an existing completed pack at the output "
                         "directory if it matches this input (SURVEY.md "
                         "6.4: the packed DB is a cached, versioned input)")

    se = sub.add_parser("search", help="search queries against a packed DB")
    se.add_argument("-d", "--db", required=True, help="packed DB directory")
    se.add_argument("-q", "--query", required=True, help="query FASTA")
    _add_common_scoring_flags(se)
    se.add_argument("-r", "--top-k", type=int, default=16)
    se.add_argument("--backend", choices=["auto", "xla", "pallas"], default="auto")
    se.add_argument("--precision",
                    choices=["adaptive", "ladder", "f32", "int32"],
                    default="adaptive",
                    help="adaptive = fastest exact path for the hardware; "
                         "ladder = reference-style narrow-first + overflow "
                         "recheck (SURVEY.md 4.4)")
    se.add_argument("--sharded", action="store_true",
                    help="data-parallel search over all local devices")
    se.add_argument("--stream", action="store_true",
                    help="stream the DB through HBM in double-buffered "
                         "windows (for databases larger than device memory)")
    se.add_argument("--window-tiles", type=int, default=None,
                    help="streaming window size in (32,V) tiles "
                         "(--stream only; one compiled shape per value; "
                         "default: SearchConfig's)")
    se.add_argument("--max-in-flight", type=int, default=None,
                    help="streaming windows alive on device (--stream "
                         "only; default: SearchConfig's 2 — measured "
                         "best; deeper buys nothing because window "
                         "steps serialize on the score-buffer chain)")
    se.add_argument("--stream-scores",
                    choices=["auto", "buffer", "candidates"], default=None,
                    help="streaming merge strategy (--stream only): "
                         "'buffer' accumulates whole-DB scores on device "
                         "(near-resident throughput, O(n_seqs) device "
                         "bytes/query), 'candidates' merges per-window "
                         "top-k on the host (O(k) device bytes/query); "
                         "'auto' (default) picks by buffer size")
    se.add_argument("--query-pack", dest="query_pack", action="store_true",
                    default=False,
                    help="pack the query batch into fixed-size profiles: "
                         "<= 16 compiled kernel shapes ever (best for "
                         "unpredictable query-length mixes / cold "
                         "processes; ~12%% below per-length throughput)")
    se.add_argument("--no-query-pack", dest="query_pack",
                    action="store_false",
                    help="per-length compiled shapes (default: max "
                         "steady-state throughput; one compile per "
                         "distinct padded query length, amortized by the "
                         "persistent compilation cache)")
    se.add_argument("--topk-per-shard", type=int, default=None,
                    help="candidates gathered per data shard before the "
                         "collective merge (--sharded only; default 256)")
    se.add_argument("--query-axis", type=int, default=None,
                    help="mesh 'query' axis size: devices split into a "
                         "(data, query) grid (--sharded only; default 1)")
    se.add_argument("--selfcheck", action="store_true",
                    help="re-score every reported hit with the built-in "
                         "C reference scorer and fail loudly on any "
                         "mismatch (bit-exactness audit; costs O(top_k) "
                         "host-side alignments per query)")
    se.add_argument("--align", action="store_true",
                    help="host-side traceback: print a BLAST-style "
                         "alignment for every reported hit (extension — "
                         "the reference reports scores only)")
    se.add_argument("--evalue", action="store_true",
                    help="attach empirical E-values to hits, fitted from "
                         "this search's own score distribution "
                         "(utils/stats.py; extension — the reference "
                         "reports raw scores only). The serving path "
                         "accumulates the score histogram on device "
                         "(psum over the mesh when sharded); works "
                         "with every serving posture")
    se.add_argument("--max-evalue", type=float, default=None,
                    help="report only hits with E-value <= this bound "
                         "(requires --evalue; ranks renumbered after the "
                         "filter — the SSEARCH/BLAST-style significance "
                         "cutoff)")
    se.add_argument("--json", action="store_true", help="JSON output")
    se.add_argument("--format", choices=["table", "json", "m8"],
                    default=None,
                    help="output format: 'table' (default, human "
                         "ranked lists), 'json' (same as --json), 'm8' "
                         "(BLAST tabular / blastp -outfmt 6: 12 "
                         "tab-separated columns per hit; runs the "
                         "host-side traceback per reported hit for the "
                         "alignment geometry columns, like --align, and "
                         "implies --evalue for the evalue/bitscore "
                         "columns — swimm_tpu/formats.py)")
    se.add_argument("--profile-dir", default=None,
                    help="write a jax.profiler trace here (SURVEY.md 6.1)")

    sv = sub.add_parser(
        "serve",
        help="persistent search server: load the DB once, answer "
             "newline-JSON requests on stdin (swimm_tpu/server.py)")
    sv.add_argument("-d", "--db", required=True, help="packed DB directory")
    _add_common_scoring_flags(sv)
    sv.add_argument("-r", "--top-k", type=int, default=16,
                    help="default hits per query (requests may override)")
    sv.add_argument("--backend", choices=["auto", "xla", "pallas"],
                    default="auto")
    sv.add_argument("--precision",
                    choices=["adaptive", "ladder", "f32", "int32"],
                    default="adaptive")
    sv.add_argument("--stream", action="store_true",
                    help="serve through the windowed streaming posture "
                         "(databases larger than device memory)")
    sv.add_argument("--evalue", action="store_true",
                    help="attach E-values + bit scores to every hit")
    sv.add_argument("--warm", default=None,
                    help="comma-separated query lengths to pre-compile "
                         "at startup (e.g. 144,500,1000) so the first "
                         "request runs at steady-state latency")
    sv.add_argument("--listen", default=None, metavar="HOST:PORT",
                    help="serve the same newline-JSON protocol over TCP "
                         "instead of stdin/stdout (PORT 0 picks a free "
                         "port; the bound address is logged to stderr)")
    sv.add_argument("--http", action="store_true",
                    help="with --listen: serve HTTP instead of the line "
                         "protocol (POST /search with the same request "
                         "JSON; GET /health, /info; stop with SIGTERM)")
    sv.add_argument("--max-batch-queries", type=int, default=64,
                    help="TCP mode: cap on queries coalesced into one "
                         "batched dispatch (queued requests past the cap "
                         "wait for the next dispatch)")
    sv.add_argument("--max-top-k", type=int, default=None,
                    help="ceiling on per-request top_k (default 1024); "
                         "bounds result size and compile-cache growth "
                         "from client k sweeps (non-default k dispatches "
                         "at the next power of two and truncates)")
    sv.add_argument("--max-query-len", type=int, default=None,
                    metavar="AA",
                    help="reject queries longer than this (default: "
                         "unlimited). Every new padded query length "
                         "compiles a fresh program, so a deployment that "
                         "--warm'ed its expected lengths can bound what "
                         "clients may submit")
    sv.add_argument("--request-timeout", type=float, default=None,
                    metavar="SECONDS",
                    help="TCP/HTTP mode: bound how long a request may "
                         "wait on the dispatch queue; expired requests "
                         "get an error_kind 'timeout' reply (HTTP 504). "
                         "Default: wait forever")
    sv.add_argument("--allow-remote-shutdown", action="store_true",
                    help="TCP line mode: accept {\"cmd\": \"shutdown\"} "
                         "from non-loopback peers (default: loopback "
                         "only — without this, --listen on a public host "
                         "is not remotely killable)")

    qy = sub.add_parser(
        "query",
        help="send a query FASTA to a running `swtpu serve --listen` "
             "server and print the results (client-side only: no JAX, "
             "no chip — runs anywhere with a socket)")
    qy.add_argument("-q", "--query", default=None,
                    help="query FASTA (gzip transparently supported); "
                         "required unless --cmd is given")
    qy.add_argument("--cmd", choices=["ping", "info"], default=None,
                    help="send a server command instead of a search "
                         "(liveness probe / DB + serving stats incl. "
                         "rss_mb)")
    qy.add_argument("--server", required=True, metavar="HOST:PORT")
    qy.add_argument("-r", "--top-k", type=int, default=None,
                    help="per-request top-k override (server default "
                         "otherwise)")
    qy.add_argument("--align", action="store_true",
                    help="request traceback alignment blocks per hit")
    qy.add_argument("--format", choices=["table", "json", "m8"],
                    default="table")
    qy.add_argument("--timeout", type=float, default=600.0,
                    help="socket timeout in seconds")

    info = sub.add_parser("info", help="describe a packed DB")
    info.add_argument("-d", "--db", required=True)

    sy = sub.add_parser("synth", help="generate a synthetic protein FASTA")
    sy.add_argument("-o", "--output", required=True)
    sy.add_argument("-n", "--n-seqs", type=int, default=10000)
    sy.add_argument("--seed", type=int, default=0)
    sy.add_argument("--queries", default=None,
                    help="optional query FASTA to plant homologs of")

    return ap


def _enable_compile_cache():
    """Persistent XLA compilation cache: CLI runs are one process each, so
    without this every invocation pays full kernel compile (~30s+/variant
    over the device tunnel; SURVEY.md section 8 environment notes).

    Also restores standard JAX_PLATFORMS semantics: this environment's
    axon plugin sitecustomize force-sets jax_platforms="axon,cpu" at
    import, which silently overrides the env var — so a user (or a CI
    harness sharing the machine with a TPU job) asking for
    JAX_PLATFORMS=cpu would contend for the device instead. Honor the
    env var explicitly."""
    import os
    try:
        import jax
        p = os.environ.get("JAX_PLATFORMS")
        if p:
            jax.config.update("jax_platforms", p)
        d = os.environ.get("SWTPU_CACHE",
                           os.path.expanduser("~/.cache/swimm_tpu/jax"))
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def main(argv=None) -> int:
    # ValueError is the library's user-input error type (bad matrix name,
    # unsupported DB version, malformed FASTA, ...). Internal bugs (bare
    # KeyError etc.) propagate with a full traceback; SWTPU_DEBUG=1 makes
    # even the friendly classes re-raise for debugging.
    import os
    debug = os.environ.get("SWTPU_DEBUG", "") not in ("", "0", "false",
                                                      "False", "no")
    try:
        return _run(build_parser().parse_args(argv))
    except BrokenPipeError:
        # downstream pager/head closed stdout; the POSIX-polite exit
        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
        return 141
    except FileNotFoundError as e:
        if debug:
            raise
        print(f"swtpu: error: file not found: {e.filename or e}",
              file=sys.stderr)
        return 2
    except ValueError as e:
        if debug:
            raise
        msg = e.args[0] if e.args else e
        print(f"swtpu: error: {msg}", file=sys.stderr)
        return 2


def _run(args) -> int:
    if args.command == "query":
        # pure client: no compile cache, no jax, no device — keep this
        # branch ABOVE anything that touches the accelerator stack
        from swimm_tpu.client import run_query
        return run_query(args)

    _enable_compile_cache()

    if args.command == "preprocess":
        from swimm_tpu.db import build_db
        packed = build_db(args.input, args.output, V=args.lanes,
                          resume=args.resume)
        print(f"packed {packed.n_seqs} sequences "
              f"({packed.total_residues} residues) into "
              f"{len(packed.chunks)} chunks at {args.output}")
        return 0

    if args.command == "serve":
        from swimm_tpu.db import load_db
        from swimm_tpu.models.engine import SearchConfig
        from swimm_tpu.server import serve_socket, serve_stdio
        warm = ()
        if args.warm:
            try:
                warm = tuple(int(x) for x in args.warm.split(",") if x)
            except ValueError:
                raise ValueError(
                    f"--warm must be comma-separated integer lengths "
                    f"(got {args.warm!r})")
            if any(w <= 0 for w in warm):
                raise ValueError("--warm lengths must be positive")
        config = SearchConfig(matrix=args.matrix, gap_open=args.gap_open,
                              gap_extend=args.gap_extend,
                              top_k=args.top_k, backend=args.backend,
                              precision=args.precision,
                              db_stream=args.stream, evalue=args.evalue)
        if args.listen is not None:
            host, sep, port = args.listen.rpartition(":")
            if not sep or not port.isdigit():
                raise ValueError(
                    f"--listen must be HOST:PORT (got {args.listen!r})")
            if args.max_batch_queries <= 0:
                raise ValueError("--max-batch-queries must be positive")
            if args.request_timeout is not None and args.request_timeout <= 0:
                raise ValueError("--request-timeout must be positive")
            return serve_socket(load_db(args.db), config,
                                host or "127.0.0.1", int(port),
                                warm_lengths=warm,
                                max_batch_queries=args.max_batch_queries,
                                http=args.http,
                                max_top_k=args.max_top_k,
                                allow_remote_shutdown=
                                args.allow_remote_shutdown,
                                request_timeout=args.request_timeout,
                                max_query_len=args.max_query_len)
        if args.http:
            raise ValueError("--http requires --listen HOST:PORT")
        if args.allow_remote_shutdown:
            raise ValueError("--allow-remote-shutdown requires --listen "
                             "(stdio has no remote peers)")
        if args.request_timeout is not None:
            raise ValueError("--request-timeout requires --listen "
                             "(stdio serves one request at a time)")
        return serve_stdio(load_db(args.db), config, warm_lengths=warm,
                           max_top_k=args.max_top_k,
                           max_query_len=args.max_query_len)

    if args.command == "info":
        import numpy as np

        from swimm_tpu.db import load_db
        packed = load_db(args.db)
        tiles, outrow, n_rows = packed.flat_tiles()
        lens = packed.lengths
        pad_pct = 100 * (tiles.shape[0] * tiles.shape[1] * tiles.shape[2]
                         / max(int(packed.total_residues), 1) - 1)
        print(f"packed DB       {args.db}")
        print(f"sequences       {packed.n_seqs:,}")
        print(f"residues        {packed.total_residues:,}")
        print(f"lengths         min {int(lens.min())} / median "
              f"{int(np.median(lens))} / max {int(lens.max())}")
        print(f"chunks          {len(packed.chunks)}  "
              f"blocks {n_rows}  lanes/block {packed.manifest['V']}")
        print(f"tile stream     {tiles.shape[0]:,} x {tiles.shape[1]} x "
              f"{tiles.shape[2]} int8 = {tiles.nbytes/1e6:.1f} MB HBM "
              f"({pad_pct:.1f}% padding)")
        print(f"format version  {packed.manifest['format_version']}")
        return 0

    if args.command == "synth":
        from swimm_tpu.fasta import read_fasta, write_fasta
        from swimm_tpu.utils.synth import synth_db
        queries = None
        if args.queries:
            queries = [r.codes for r in read_fasta(args.queries)]
        recs = synth_db(args.n_seqs, seed=args.seed, queries=queries)
        write_fasta(args.output, recs)
        print(f"wrote {len(recs)} synthetic sequences to {args.output}")
        return 0

    if args.command == "search":
        import contextlib

        from swimm_tpu.db import load_db
        from swimm_tpu.fasta import read_fasta
        from swimm_tpu.models.engine import SearchConfig, search

        # posture-combination validation: a user asking for one behavior
        # must never silently get another (VERDICT r2 weak #3) — a flag
        # that would be ignored errors loudly, naming the conflict.
        if args.sharded and args.query_pack:
            raise ValueError(
                "--sharded does not support --query-pack: the sharded "
                "path groups queries by padded length itself — drop "
                "--query-pack or run without --sharded")
        if args.stream and args.query_pack:
            raise ValueError(
                "--stream does not support --query-pack: the streaming "
                "path batches queries per padded length against each "
                "window — drop one of the two flags")
        if args.sharded and args.stream_scores is not None:
            raise ValueError(
                "--stream-scores does not apply to the sharded posture: "
                "sharded streaming always merges per-span candidates "
                "via the collective top-k — drop --stream-scores")
        if not args.stream:
            for flag, on in (("--window-tiles",
                              args.window_tiles is not None),
                             ("--max-in-flight",
                              args.max_in_flight is not None),
                             ("--stream-scores",
                              args.stream_scores is not None)):
                if on:
                    raise ValueError(
                        f"{flag} only applies to the streaming posture "
                        f"and would be ignored here — add --stream or "
                        f"drop {flag}")
        if not args.sharded:
            for flag, on in (("--topk-per-shard",
                              args.topk_per_shard is not None),
                             ("--query-axis",
                              args.query_axis is not None)):
                if on:
                    raise ValueError(
                        f"{flag} only applies to the sharded posture "
                        f"and would be ignored here — add --sharded or "
                        f"drop {flag}")
        if args.sharded and args.stream and args.topk_per_shard is not None:
            raise ValueError(
                "--sharded --stream does not support --topk-per-shard: "
                "the streamed super-window path takes top_k candidates "
                "per span — drop --topk-per-shard")
        if args.evalue and args.query_pack:
            raise ValueError(
                "--evalue runs per-query statistics; it does not "
                "combine with --query-pack — drop one of the two flags")
        fmt = args.format
        if fmt is None:
            fmt = "json" if args.json else "table"
        elif args.json and fmt != "json":
            raise ValueError(
                f"--json conflicts with --format {fmt} — pick one")
        if fmt == "m8":
            if args.align:
                raise ValueError(
                    "--format m8 is a fixed 12-column tabular format; "
                    "--align's alignment blocks do not apply — drop "
                    "--align (m8 already includes alignment geometry)")
            if args.query_pack:
                raise ValueError(
                    "--format m8 computes E-values (implied --evalue), "
                    "which do not combine with --query-pack — drop "
                    "--query-pack")
            args.evalue = True   # the evalue/bitscore columns
        if args.max_evalue is not None:
            if not args.evalue:
                raise ValueError(
                    "--max-evalue filters on E-values, which are only "
                    "computed under --evalue — add --evalue or drop "
                    "--max-evalue")
            if args.max_evalue <= 0:
                raise ValueError("--max-evalue must be positive")
        packed = load_db(args.db)
        queries = read_fasta(args.query)
        stream_kw = {k: v for k, v in
                     (("window_tiles", args.window_tiles),
                      ("max_in_flight", args.max_in_flight),
                      ("stream_scores", args.stream_scores))
                     if v is not None}   # None -> SearchConfig defaults
        config = SearchConfig(matrix=args.matrix, gap_open=args.gap_open,
                              gap_extend=args.gap_extend, top_k=args.top_k,
                              backend=args.backend, precision=args.precision,
                              query_pack=args.query_pack,
                              db_stream=args.stream, evalue=args.evalue,
                              **stream_kw)
        prof = contextlib.nullcontext()
        if args.profile_dir:
            import jax
            prof = jax.profiler.trace(args.profile_dir)
        with prof:
            if args.sharded and args.stream:
                from swimm_tpu.parallel.mesh import make_mesh
                from swimm_tpu.parallel.sharded_stream import \
                    search_streaming_sharded
                results, metrics = search_streaming_sharded(
                    packed, queries, config,
                    mesh=make_mesh(query_axis=args.query_axis
                                   if args.query_axis is not None else 1))
            elif args.sharded:
                from swimm_tpu.parallel.mesh import make_mesh
                from swimm_tpu.parallel.sharded_search import sharded_search
                kw = ({"topk_per_shard": args.topk_per_shard}
                      if args.topk_per_shard is not None else {})
                results, metrics = sharded_search(
                    packed, queries, config,
                    mesh=make_mesh(query_axis=args.query_axis
                                   if args.query_axis is not None else 1),
                    **kw)
            else:
                results, metrics = search(packed, queries, config)
        if args.max_evalue is not None:
            # significance cutoff on the REPORTED list only (scores and
            # the fitted null model are untouched); ranks renumbered so
            # the output stays a dense 1..n table
            from dataclasses import replace
            for r in results:
                r.hits = [replace(h, rank=i + 1) for i, h in enumerate(
                    h2 for h2 in r.hits if h2.evalue <= args.max_evalue)]
        if args.selfcheck:
            from swimm_tpu.matrices import get_matrix
            from swimm_tpu.ops import cref
            sub = get_matrix(args.matrix)
            n_checked = 0
            for q, r in zip(queries, results):
                seqs = [packed.seq_codes(h.sorted_idx) for h in r.hits]
                exp = cref.sw_score_many(q.codes, seqs, sub,
                                         args.gap_open, args.gap_extend)
                got = [h.score for h in r.hits]
                if list(exp) != got:
                    raise AssertionError(
                        f"selfcheck FAILED for {r.query_title!r}: "
                        f"device {got} vs C oracle {list(exp)}")
                n_checked += len(got)
            print(f"selfcheck: PASS ({n_checked} hit scores verified "
                  "against the C reference scorer)", file=sys.stderr)
        aligns = None
        if args.align or fmt == "m8":
            from swimm_tpu.ops.traceback import sw_align
            aligns = []
            for q, r in zip(queries, results):
                row = []
                for h in r.hits:
                    a = sw_align(q.codes, packed.seq_codes(h.sorted_idx),
                                 matrix=args.matrix, gap_open=args.gap_open,
                                 gap_extend=args.gap_extend)
                    if a.score != h.score:   # full-stack exactness probe
                        raise AssertionError(
                            f"traceback score {a.score} != device hit "
                            f"score {h.score} for {h.title!r}")
                    row.append(a)
                aligns.append(row)
        if fmt == "m8":
            # pure TSV on stdout (pipe-friendly); run summary to stderr
            from swimm_tpu.formats import m8_rows
            for qi, r in enumerate(results):
                for line in m8_rows(r, aligns[qi]):
                    print(line)
            print(f"time: {metrics.seconds:.3f}s  "
                  f"GCUPS: {metrics.gcups:.2f}  "
                  f"seqs/s: {metrics.seqs_per_sec:.0f}", file=sys.stderr)
        elif fmt == "json":
            out = {
                "results": [{"query": r.query_title,
                             "hits": [{"rank": h.rank, "score": h.score,
                                       "title": h.title,
                                       **({"evalue": h.evalue}
                                          if h.evalue is not None else {})}
                                      for h in r.hits]}
                            for r in results],
                "metrics": json.loads(metrics.to_json()),
            }
            if aligns is not None:
                for robj, arow in zip(out["results"], aligns):
                    for hobj, a in zip(robj["hits"], arow):
                        hobj["alignment"] = {
                            "q_range": [a.q_start + 1, a.q_end],
                            "d_range": [a.d_start + 1, a.d_end],
                            "identity": a.n_identity, "length": a.length,
                            "gaps": a.n_gaps,
                            "q_aln": a.q_aln, "d_aln": a.d_aln,
                        }
            print(json.dumps(out, indent=1))
        else:
            for qi, r in enumerate(results):
                print(r.as_table())
                if aligns is not None:
                    for h, a in zip(r.hits, aligns[qi]):
                        print(f"\n> {h.title}")
                        print(a.pretty())
                print()
            print(f"time: {metrics.seconds:.3f}s  GCUPS: {metrics.gcups:.2f} "
                  f"(padded {metrics.padded_gcups:.2f})  "
                  f"seqs/s: {metrics.seqs_per_sec:.0f}")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
