import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Randomized differential fuzz of the TPU kernels vs the CPU oracles.

Hardens the "100% score agreement" north-star beyond the fixed test
configs: random (matrix, gap_open, gap_extend, query length, db length
mix, ceiling) draws, each scored by the production ragged kernel (short or
long path chosen by query length) AND by the C oracle, with exact
equality required. Edge draws include 1-residue sequences, max-length
lanes, all-ambiguity-code sequences, gap_open=0, and saturating ceilings.

Usage: python benchmarks/fuzz_tpu.py [--rounds 12] [--seed 0]
Exit 0 = every draw agreed exactly.
"""

import argparse
import json
import sys

import numpy as np

MATRICES = ["BLOSUM45", "BLOSUM50", "BLOSUM62", "BLOSUM80", "BLOSUM90",
            "PAM30", "PAM70", "PAM250"]


def fuzz_packed(rounds: int, seed: int) -> int:
    """Packed-serving fuzz: random batch compositions served through the
    PACKED posture must rank bit-identically to the per-length posture
    (hardest invariants in the codebase: separator isolation + segmented-F
    domination + balanced LPT packing), plus C-oracle spot checks."""
    import tempfile

    from swimm_tpu.db import build_db
    from swimm_tpu.matrices import get_matrix
    from swimm_tpu.models.engine import SearchConfig, search
    from swimm_tpu.ops import cref
    from swimm_tpu.utils.synth import synth_db, synth_queries

    rng = np.random.default_rng(seed)
    base_queries = synth_queries(8, [30, 80, 150, 300, 500, 700, 900, 1000],
                                 seed=seed + 1)
    recs = synth_db(3_000, seed=seed + 2,
                    queries=[q.codes for q in base_queries],
                    homolog_frac=0.01)
    failures = 0
    with tempfile.TemporaryDirectory() as td:
        packed = build_db(recs, td, V=128)
        for r in range(rounds):
            nq = int(rng.integers(1, 16))
            qlens = [int(rng.integers(1, 1009)) for _ in range(nq)]
            queries = synth_queries(nq, qlens, seed=seed + 100 + r)
            a, _ = search(packed, queries,
                          SearchConfig(top_k=8, query_pack=False))
            b, _ = search(packed, queries,
                          SearchConfig(top_k=8, query_pack=True))
            ok = all([(h.score, h.sorted_idx) for h in x.hits]
                     == [(h.score, h.sorted_idx) for h in y.hits]
                     for x, y in zip(a, b))
            # oracle spot: top hit of one random query
            qi = int(rng.integers(nq))
            if a[qi].hits:
                h0 = a[qi].hits[0]
                exp = int(cref.sw_score_many(
                    queries[qi].codes, [packed.seq_codes(h0.sorted_idx)],
                    get_matrix("BLOSUM62"), 10, 2)[0])
                ok = ok and exp == h0.score
            print(json.dumps({"round": r, "nq": nq,
                              "qlens": qlens[:6], "ok": bool(ok)}),
                  flush=True)
            if not ok:
                failures += 1
    print(json.dumps({"fuzz_packed": "PASS" if not failures else "FAIL",
                      "rounds": rounds, "failures": failures}))
    return 1 if failures else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--packed", action="store_true",
                    help="fuzz the packed serving posture vs per-length")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))

    if args.packed:
        return fuzz_packed(args.rounds, args.seed)

    from swimm_tpu.alphabet import PAD_CODE
    from swimm_tpu.matrices import get_matrix
    from swimm_tpu.models.profile import build_query_profile
    from swimm_tpu.ops import cref, longquery, pallas_scorer
    from swimm_tpu.utils.synth import random_codes

    rng = np.random.default_rng(args.seed)
    V = 128
    failures = 0
    for r in range(args.rounds):
        mat_name = MATRICES[int(rng.integers(len(MATRICES)))]
        mat = get_matrix(mat_name)
        go = int(rng.integers(0, 21))
        ge = int(rng.integers(0, 9))   # ge == 0 (flat gap cost) is legal
        # query length: mostly short-kernel range, sometimes long path
        if rng.random() < 0.25:
            qlen = int(rng.integers(2049, 4000))
        else:
            qlen = int(rng.integers(1, 1200))
        query = random_codes(rng, qlen)

        # db: a few blocks of mixed lengths with adversarial lanes
        n_blocks = int(rng.integers(1, 4))
        L = int(rng.integers(1, 9)) * 32
        seqs = []
        for k in range(n_blocks * V):
            draw = rng.random()
            if draw < 0.02:
                s = random_codes(rng, 1)                      # 1-residue
            elif draw < 0.04:
                s = random_codes(rng, L)                      # max-length
            elif draw < 0.06:
                s = rng.integers(20, 24, size=int(rng.integers(5, L + 1))
                                 ).astype(np.uint8)           # B/Z/X/* only
            elif draw < 0.10:                                 # homolog
                n = min(qlen, L)
                s = query[:n].copy()
            else:
                s = random_codes(rng, int(rng.integers(1, L + 1)))
            seqs.append(s)
        codes = np.full((n_blocks, L, V), PAD_CODE, np.int8)
        for k, s in enumerate(seqs):
            b, lane = divmod(k, V)
            codes[b, :min(len(s), L), lane] = s[:L]
            seqs[k] = s[:L]

        qp = jnp.asarray(build_query_profile(query, mat_name, m_multiple=8))
        ceiling = None
        if qlen <= 2048:
            if rng.random() < 0.3:
                ceiling = int(rng.choice([127, 32767]))
            got = np.asarray(pallas_scorer.score_chunk(
                jnp.asarray(codes), qp, go, ge, ceiling=ceiling))
        else:
            got = np.asarray(longquery.score_chunk_long(
                jnp.asarray(codes), qp, go, ge))
        exp = cref.sw_score_many(query, seqs, mat, go, ge
                                 ).reshape(n_blocks, V)
        if ceiling is not None:
            exp = np.minimum(exp, ceiling)
        ok = np.array_equal(got, exp)
        print(json.dumps({
            "round": r, "matrix": mat_name, "gap": [go, ge], "qlen": qlen,
            "blocks": n_blocks, "L": L, "ceiling": ceiling,
            "ok": bool(ok),
        }), flush=True)
        if not ok:
            bad = np.nonzero(got != exp)
            print(f"  MISMATCH at {list(zip(*[b[:5] for b in bad]))}: "
                  f"got {got[bad][:5]}, exp {exp[bad][:5]}",
                  file=sys.stderr)
            failures += 1
    print(json.dumps({"fuzz": "PASS" if not failures else "FAIL",
                      "rounds": args.rounds, "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
