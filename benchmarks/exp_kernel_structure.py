import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Kernel-structure experiment sweep (VERDICT r2 next-step #7).

The ragged kernel sustains ~4.0 Tcounted-ops/s = ~65% of the 4-slot VPU
model peak; the remaining headroom is pipeline STRUCTURE, not op count
(the kernel already beats the best hand-written elementwise microkernel
2x). This script sweeps the structural knobs that could move it:

  - SMAX_MERGE (running-max -> Smax VMEM merge interval): fewer merges =
    fewer VMEM read-modify-writes, longer colmax dependency chains.
  - jt_steps 32 vs 64 (db residues per grid tile): halves per-tile
    costs (scalar outrow reads, boundary pl.when checks, H/E VMEM
    load/store) at 2x the unrolled body (compile time) and 2x the
    per-tile VMEM db block.

Method: slope between a 2-deep and 6-deep chained lax.scan over the same
dispatch (cancels dispatch/tunnel fixed costs; the tunnel dedupes
identical dispatches, so the scan carry perturbs the input each step).
Each variant's scores are checked identical to the baseline before it is
timed. jax.clear_caches() between settings so the in-process jit cache
cannot serve a stale SMAX_MERGE closure.

Results land in docs/KERNEL_NOTES.md (measured table, win or dead-end).
"""

import json
import sys
import time

import numpy as np


def measure(jt_steps: int, m: int, n_reps: int = 3):
    import jax
    import jax.numpy as jnp

    from swimm_tpu.ops.pallas_scorer import score_tiles

    rng = np.random.default_rng(0)
    T32, V = (1024, 128) if jax.default_backend() == "tpu" else (16, 128)
    base = rng.integers(0, 20, size=(T32, 32, V), dtype=np.int8)
    T = T32 * 32 // jt_steps
    tiles = base.reshape(T, jt_steps, V)
    n_rows = max(T32 // 8, 1)                    # same blocks either way
    outrow = np.repeat(np.arange(n_rows, dtype=np.int32), T // n_rows)
    qp = rng.integers(-4, 12, size=(32, m), dtype=np.int32)
    qp[24:] = -64
    dev_t = jnp.asarray(tiles)
    dev_o = jnp.asarray(outrow)
    dev_q = jnp.asarray(qp)

    ref = np.asarray(score_tiles(dev_t, dev_o, n_rows, dev_q, 10, 2,
                                 jt_steps=jt_steps))

    def make(depth):
        @jax.jit
        def chained(t, q, s0):
            def body(carry, _):
                t2 = t ^ (carry % 2).astype(jnp.int8)
                s = score_tiles(t2, dev_o, n_rows, q, 10, 2,
                                jt_steps=jt_steps)
                return s.sum().astype(jnp.int32), None
            tot, _ = jax.lax.scan(body, s0, None, length=depth)
            return tot
        return chained, T * jt_steps * V * m * depth

    fn_lo, cells_lo = make(2)
    fn_hi, cells_hi = make(6)
    s = jnp.zeros((), jnp.int32)
    s = fn_lo(dev_t, dev_q, s)
    np.asarray(s)
    s = fn_hi(dev_t, dev_q, s)
    np.asarray(s)
    rates = []
    for _ in range(n_reps):
        t0 = time.perf_counter()
        s = fn_lo(dev_t, dev_q, s)
        np.asarray(s)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        s = fn_hi(dev_t, dev_q, s)
        np.asarray(s)
        t_hi = time.perf_counter() - t0
        rates.append(cells_hi / t_hi / 1e9 if t_hi <= t_lo
                     else (cells_hi - cells_lo) / (t_hi - t_lo) / 1e9)
    rates.sort()
    return {"gcups_med": round(rates[len(rates) // 2], 1),
            "gcups_band": [round(rates[0], 1), round(rates[-1], 1)]}, ref


def main() -> int:
    import jax

    from swimm_tpu.ops import pallas_scorer

    jax.config.update("jax_compilation_cache_dir",
                      str(_os.path.join(_os.path.dirname(_os.path.dirname(
                          _os.path.abspath(__file__))), ".jax_cache")))
    m = 1024
    baseline_ref = None
    rows = []
    saved_sm = pallas_scorer.SMAX_MERGE
    try:
        for jt_steps in (32, 64):
            for sm in (4, 8, 16, 32):
                pallas_scorer.SMAX_MERGE = sm
                jax.clear_caches()               # drop stale closures
                try:
                    stats, ref = measure(jt_steps, m)
                except Exception as e:
                    rows.append({"jt_steps": jt_steps, "smax_merge": sm,
                                 "error": f"{type(e).__name__}: {e}"[:160]})
                    print(json.dumps(rows[-1]), flush=True)
                    continue
                if baseline_ref is None:
                    baseline_ref = ref
                exact = bool(np.array_equal(ref, baseline_ref))
                rows.append({"jt_steps": jt_steps, "smax_merge": sm,
                             **stats, "scores_exact": exact})
                print(json.dumps(rows[-1]), flush=True)
                assert exact, "variant changed scores!"
    finally:
        pallas_scorer.SMAX_MERGE = saved_sm      # restore production value
    timed = [r for r in rows if "gcups_med" in r]
    if not timed:
        print(json.dumps({"best": None,
                          "error": "every variant errored (see rows)"}))
        return 1
    best = max(timed, key=lambda r: r["gcups_med"])
    print(json.dumps({"best": best}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
