"""Run all five BASELINE acceptance configs end-to-end and print a table.

Every config checks EXACTNESS against the in-repo C reference scorer
(full-DB equality where the oracle is fast enough, spot-checked lanes at
the 100k scale) and reports measured throughput. This is the one-shot
"does the framework do everything the reference contract asks" script.

Usage: python benchmarks/acceptance.py            (TPU)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = []


def row(config, scale, metric, exact):
    ROWS.append((config, scale, metric, exact))
    print(f"  -> {config}: {metric}  exact={exact}", flush=True)


def spot_oracle_check(packed, recs, queries, results, n_spot=512, seed=0):
    """Exactness spot check at scales where a full-DB oracle pass is too
    slow: every reported hit's score must match the C oracle on its
    sequence, and no sequence from a random sample may out-score the
    reported k-th hit (full-DB equality runs at the 10k scale, config 1)."""
    from swimm_tpu.matrices import get_matrix
    from swimm_tpu.ops import cref

    rng = np.random.default_rng(seed)
    sub = get_matrix("BLOSUM62")
    for q, res in zip(queries, results):
        hit_idx = [h.sorted_idx for h in res.hits]
        seqs = [recs[int(packed.orig_index[i])].codes for i in hit_idx]
        exp = cref.sw_score_many(q.codes, seqs, sub, 10, 2)
        if list(exp) != [h.score for h in res.hits]:
            return False
        sample = rng.integers(0, packed.n_seqs, n_spot)
        sample = np.setdiff1d(sample, np.asarray(hit_idx))
        sseqs = [recs[int(packed.orig_index[i])].codes for i in sample]
        sexp = cref.sw_score_many(q.codes, sseqs, sub, 10, 2)
        kth = res.hits[-1].score
        if len(sexp) and sexp.max() > kth:
            return False
    return True


def main() -> int:
    import tempfile

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from swimm_tpu.db import build_db, load_db
    from swimm_tpu.matrices import get_matrix
    from swimm_tpu.models.engine import SearchConfig, score_db, search
    from swimm_tpu.ops import cref
    from swimm_tpu.parallel.mesh import make_mesh
    from swimm_tpu.parallel.sharded_search import sharded_search
    from swimm_tpu.utils.synth import synth_db, synth_queries

    # ---- config 1: 144aa vs 10k DB, FULL equality vs the C path ----
    queries = synth_queries(1, [144], seed=21)
    q = queries[0]
    recs = synth_db(10_000, seed=22, queries=[q.codes], homolog_frac=0.002)
    with tempfile.TemporaryDirectory() as td:
        packed = build_db(recs, td, V=128)
        search(packed, queries, SearchConfig(top_k=16))   # warm (compile)
        results, met = search(packed, queries, SearchConfig(top_k=16))
        got = score_db(packed, q, SearchConfig(precision="f32"))
        exp = cref.sw_score_many(
            q.codes, [recs[i].codes for i in packed.orig_index],
            get_matrix("BLOSUM62"), 10, 2)
        row("1: 144aa vs 10k-seq", "10k seqs",
            f"{met.gcups:.1f} GCUPS", bool(np.array_equal(got, exp)))

    # ---- config 2: 20 queries 100-500aa vs 100k DB (the headline) ----
    rng = np.random.default_rng(0)
    qlens = list(rng.integers(100, 501, size=20))
    queries2 = synth_queries(20, qlens, seed=1)
    db_dir = os.path.join(os.path.dirname(__file__), "..",
                          ".bench_db_100000")
    if os.path.exists(os.path.join(db_dir, "manifest.json")):
        packed2 = load_db(db_dir)
    else:
        recs2 = synth_db(100_000, seed=2,
                         queries=[x.codes for x in queries2],
                         homolog_frac=0.001)
        packed2 = build_db(recs2, db_dir, V=128)
    recs2 = synth_db(100_000, seed=2, queries=[x.codes for x in queries2],
                     homolog_frac=0.001)
    cfg2 = SearchConfig(top_k=16, query_pack=False)
    search(packed2, queries2, cfg2)          # warm
    results2, met2 = search(packed2, queries2, cfg2)
    ok2 = spot_oracle_check(packed2, recs2, queries2[:4], results2[:4])
    row("2: 20 queries vs 100k-seq", "100k seqs",
        f"{met2.gcups:.1f} GCUPS, {met2.n_db_seqs*20/met2.seconds/1e6:.2f}M "
        "seq-scores/s", ok2)

    # ---- config 3: 5,478aa long query (tiled DP, carried columns) ----
    queries3 = synth_queries(1, [5478], seed=3)
    recs3 = synth_db(30_000, seed=4, queries=[queries3[0].codes],
                     homolog_frac=0.0005)
    with tempfile.TemporaryDirectory() as td:
        packed3 = build_db(recs3, td, V=128)
        search(packed3, queries3, SearchConfig(top_k=16))   # warm
        results3, met3 = search(packed3, queries3, SearchConfig(top_k=16))
        ok3 = spot_oracle_check(packed3, recs3, queries3, results3,
                                n_spot=16)
        top = results3[0].hits[0]
        row("3: 5478aa long query", "30k seqs",
            f"{met3.gcups:.1f} GCUPS, top={top.score}",
            ok3 and top.score > 127)   # homolog far beyond the int8 tier

    # ---- config 4: sharded search + collective merge (1-chip mesh here;
    # N-device meshes validated on the virtual CPU mesh: bench_scaling) ----
    with tempfile.TemporaryDirectory() as td:
        packed4 = build_db(recs, td, V=128)      # reuse config-1 world
        serial4, _ = search(packed4, queries,
                            SearchConfig(top_k=16, precision="f32"))
        mesh = make_mesh()
        sharded_search(packed4, queries,
                       SearchConfig(top_k=16, precision="f32"),
                       mesh=mesh)                 # warm
        shard4, met4 = sharded_search(packed4, queries,
                                      SearchConfig(top_k=16,
                                                   precision="f32"),
                                      mesh=mesh)
        ok4 = all([(h.score, h.sorted_idx) for h in a.hits]
                  == [(h.score, h.sorted_idx) for h in b.hits]
                  for a, b in zip(serial4, shard4))
        row("4: sharded + collective top-k", f"{len(jax.devices())}-chip mesh",
            f"{met4.gcups:.1f} GCUPS", ok4)

        # ---- config 5: adaptive precision ladder == exact, end to end ----
        search(packed4, queries, SearchConfig(top_k=16,
                                              precision="ladder"))  # warm
        ladder5, met5 = search(packed4, queries,
                               SearchConfig(top_k=16, precision="ladder"))
        ok5 = all([(h.score, h.sorted_idx) for h in a.hits]
                  == [(h.score, h.sorted_idx) for h in b.hits]
                  for a, b in zip(serial4, ladder5))
        row("5: precision ladder == exact", "10k seqs",
            f"{met5.gcups:.1f} GCUPS (ladder path)", ok5)

    print("\nconfig                              scale            metric"
          "                                   exact")
    for c, s, m, e in ROWS:
        print(f"{c:<35} {s:<16} {m:<40} {'PASS' if e else 'FAIL'}")
    return 0 if all(e for *_, e in ROWS) else 1


if __name__ == "__main__":
    sys.exit(main())
