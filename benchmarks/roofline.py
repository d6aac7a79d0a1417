import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""In-repo roofline: speed-of-light GCUPS and MFU% (VERDICT r1 next-step #5).

BASELINE's north-star asks for "the DP inner loop at speed-of-light GCUPS
per chip". This module makes that claim reproducible instead of folklore:

1. ``ops_per_cell(m)`` — VPU elementwise ops per DP cell, DERIVED from the
   kernel source (pallas_scorer._dp_steps / _excl_cummax_rows): every term
   is annotated with the code line it counts. The kernel is VPU-issue-bound
   (the MXU score matmul is ~3% at m=1024 and overlapped), so elementwise
   issue rate bounds throughput.
2. ``measure_vpu_ops_per_sec()`` — measured elementwise f32 throughput from
   a Pallas microkernel issuing a pure add/sub/max dependency chain on
   (512, 128) tiles (the same op class and tile shape the SW kernel uses),
   timed with the data-dependent chained-scan pattern (the dev tunnel
   dedupes identical dispatches; see bench.py).
3. speed-of-light GCUPS = vpu_ops_per_sec / ops_per_cell; MFU% =
   measured padded GCUPS / SoL. (PADDED cells: that is the work the VPU
   actually issues; real-cell GCUPS additionally pays the padding tax.)

Run: python benchmarks/roofline.py  -> one JSON line with the roofline and
the measured kernel point at m=1024 (the serving sweet spot).
"""

import functools
import json
import math
import sys
import time

import numpy as np

SUB = 8           # sublanes per f32 tile (pallas_scorer.SUB)
SMAX_MERGE = 8    # running-max merge interval (pallas_scorer._dp_steps)


def ops_per_cell(m: int) -> float:
    """VPU elementwise ops per DP cell of the ragged f32 kernel.

    Counted against pallas_scorer._dp_steps (one j step advances the full
    (m, Vk) state by one db residue; every full-tile op below touches each
    cell once) and _excl_cummax_rows (hierarchical F recovery). Fractional
    terms are ops on the (m/8, Vk) group array = 1/8 of a full tile.
    """
    nch = max(m // SUB, 1)
    ladder_rounds = max(math.ceil(math.log2(nch)), 0) if nch > 1 else 0
    return (
        3.0                                  # e = max(h - goe, e - ge)
        + 1.0                                # hd = _shift_rows(h, 1, 0)
        + 3.0                                # ht = max(max(hd + s, e), ramp)
        + (SMAX_MERGE - 1) / SMAX_MERGE      # colmax = max(colmax, ht)
        + 6.0                                # cummax in-group: 3 x (shift+max)
        + 2.0 / SUB                          # gmax slice + its shift (1/8 size)
        + 2.0 * ladder_rounds / SUB          # group-prefix ladder (1/8 size)
        + 1.0                                # broadcast group-carry merge
        + 1.0                                # final exclusive shift
        + 1.0                                # + c1 (gap-open fold)
        + 1.0                                # h = max(ht, f)
        + 1.0 / SMAX_MERGE                   # smax_ref merge every 8 steps
    )
    # Not counted: the (32, Vk) onehot compare + MXU matmul (32/m of one op
    # per cell, ~3% at m=1024, and issued under the VPU chain — see
    # _dp_steps' software-pipelining note) and scalar/SMEM bookkeeping.


def measure_vpu_ops_per_sec() -> float:
    """Measured elementwise f32 VPU ISSUE throughput (ops/sec).

    A Pallas kernel runs STREAMS independent (add, rsub, max) chains
    interleaved on (512, 128) f32 tiles — enough ILP to fill the issue
    slots (a single dependency chain measures op LATENCY, ~2x lower; the
    SW kernel's dataflow has comparable ILP). The rate is taken as the
    SLOPE between a short and a long variant of the same program, which
    cancels dispatch overhead, the dev tunnel's round-trip, and any
    fixed-cost caching artifacts (both variants are chained data-dependent
    dispatches, so the tunnel's dedupe cannot inflate them)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    UNROLL = 8        # triples per stream per loop body
    STREAMS = 4       # independent chains (ILP)
    ROWS, VK = 512, 128
    N_CALLS = 32      # scan length inside one dispatch

    def make(loops):
        def vpu_kernel(x_ref, o_ref):
            def body(_, vs):
                for _ in range(UNROLL):
                    vs = tuple(jnp.maximum(v + 1.0, 2000.0 - v)
                               for v in vs)
                return vs
            v0 = x_ref[:]
            init = tuple(v0 + 17.0 * s for s in range(STREAMS))
            vs = jax.lax.fori_loop(0, loops, body, init)
            acc = vs[0]
            for v in vs[1:]:
                acc = jnp.maximum(acc, v)
            o_ref[:] = acc

        call = pl.pallas_call(
            vpu_kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, VK), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )

        @jax.jit
        def chained(x):
            def body(v, _):
                return call(v), None
            v, _ = jax.lax.scan(body, x, None, length=N_CALLS)
            return v
        ops = 3 * UNROLL * STREAMS * loops * N_CALLS * ROWS * VK
        return chained, ops

    LO, HI = 128, 512
    fn_lo, ops_lo = make(LO)
    fn_hi, ops_hi = make(HI)
    x = jnp.linspace(0.0, 1.0, ROWS * VK,
                     dtype=jnp.float32).reshape(ROWS, VK)

    def timed(fn, x):
        y = fn(x)
        y.block_until_ready()                    # compile + warm
        t0 = time.perf_counter()
        z = fn(y)                                # distinct input: no dedupe
        z.block_until_ready()
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        w = fn(z)
        w.block_until_ready()
        return min(dt, time.perf_counter() - t0), w

    t_lo, x = timed(fn_lo, x)
    t_hi, _ = timed(fn_hi, x)
    if t_hi <= t_lo:                             # noise guard
        return ops_hi / t_hi
    return (ops_hi - ops_lo) / (t_hi - t_lo)


@functools.lru_cache(maxsize=1)
def speed_of_light_gcups(m: int = 1024) -> tuple:
    """(sol_gcups, vpu_ops_per_sec, ops_per_cell) for this chip."""
    vpu = measure_vpu_ops_per_sec()
    opc = ops_per_cell(m)
    return vpu / opc / 1e9, vpu, opc


def measure_kernel_padded_gcups(m: int = 1024) -> float:
    """Padded-cell GCUPS of the production ragged kernel at query-state
    size m (the MFU numerator: cells the VPU actually issues). Slope
    between a 2-deep and a 6-deep chained scan cancels dispatch/tunnel
    fixed costs (same method as measure_vpu_ops_per_sec)."""
    import jax
    import jax.numpy as jnp

    from swimm_tpu.ops.pallas_scorer import score_tiles

    rng = np.random.default_rng(0)
    T, jt, V = (1024, 32, 128) if jax.default_backend() == "tpu" \
        else (16, 32, 128)
    n_rows = max(T // 8, 1)
    tiles = rng.integers(0, 20, size=(T, jt, V), dtype=np.int8)
    outrow = np.repeat(np.arange(n_rows, dtype=np.int32), T // n_rows)
    qp = rng.integers(-4, 12, size=(32, m), dtype=np.int32)
    qp[24:] = -64
    dev_t = jnp.asarray(tiles)
    dev_o = jnp.asarray(outrow)
    dev_q = jnp.asarray(qp)

    def make(depth):
        @jax.jit
        def chained(t, q, s0):
            def body(carry, _):
                t2 = t ^ (carry % 2).astype(jnp.int8)
                s = score_tiles(t2, dev_o, n_rows, q, 10, 2)
                return s.sum().astype(jnp.int32), None
            tot, _ = jax.lax.scan(body, s0, None, length=depth)
            return tot
        return chained, T * jt * V * m * depth

    def timed(fn, s):
        s = fn(dev_t, dev_q, s)
        s.block_until_ready()                    # compile + warm
        t0 = time.perf_counter()
        s = fn(dev_t, dev_q, s)                  # distinct carry: no dedupe
        s.block_until_ready()
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        s = fn(dev_t, dev_q, s)
        s.block_until_ready()
        return min(dt, time.perf_counter() - t0), s

    fn_lo, cells_lo = make(2)
    fn_hi, cells_hi = make(6)
    s = jnp.zeros((), jnp.int32)
    t_lo, s = timed(fn_lo, s)
    t_hi, _ = timed(fn_hi, s)
    if t_hi <= t_lo:
        return cells_hi / t_hi / 1e9
    return (cells_hi - cells_lo) / (t_hi - t_lo) / 1e9


def main() -> int:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    m = 1024
    sol, vpu, opc = speed_of_light_gcups(m)
    meas = measure_kernel_padded_gcups(m)
    print(json.dumps({
        "m": m,
        "ops_per_cell": round(opc, 2),
        "vpu_elementwise_ops_per_sec": round(vpu / 1e12, 3),
        "vpu_unit": "Tops/s (f32 add/sub/max class, measured)",
        "speed_of_light_gcups": round(sol, 1),
        "measured_padded_gcups": round(meas, 1),
        "mfu_pct": round(100 * meas / sol, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
