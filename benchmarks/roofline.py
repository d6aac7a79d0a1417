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


def measure_vpu_ops_per_sec(reps: int = 3) -> float:
    """Measured elementwise f32 VPU throughput (ops/sec) on this chip.

    A Pallas kernel issues ITERS chained (add, rsub, max) triples on a
    (512, 128) f32 VMEM tile — the dependency chain prevents folding and
    mirrors the SW kernel's serial H/E/F structure. An outer lax.scan
    chains CALLS data-dependently (tunnel-dedupe-proof)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    ITERS = 512       # elementwise triples per kernel call
    ROWS, VK = 512, 128
    N_CALLS = 32      # scan length inside one dispatch

    def vpu_kernel(x_ref, o_ref):
        v = x_ref[:]
        for _ in range(ITERS):
            v = jnp.maximum(v + 1.0, 2000.0 - v)   # add, sub, max
        o_ref[:] = v

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

    x = jnp.linspace(0.0, 1.0, ROWS * VK, dtype=jnp.float32).reshape(ROWS, VK)
    chained(x).block_until_ready()               # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        chained(x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    total_ops = 3 * ITERS * N_CALLS * ROWS * VK
    return total_ops / best


@functools.lru_cache(maxsize=1)
def speed_of_light_gcups(m: int = 1024) -> tuple:
    """(sol_gcups, vpu_ops_per_sec, ops_per_cell) for this chip."""
    vpu = measure_vpu_ops_per_sec()
    opc = ops_per_cell(m)
    return vpu / opc / 1e9, vpu, opc


def measure_kernel_padded_gcups(m: int = 1024, reps: int = 3) -> float:
    """Padded-cell GCUPS of the production ragged kernel at query-state
    size m (the MFU numerator: cells the VPU actually issues)."""
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

    @jax.jit
    def chained(t, q):
        def body(carry, _):
            t2 = t ^ (carry % 2).astype(jnp.int8)
            s = score_tiles(t2, dev_o, n_rows, q, 10, 2)
            return s.sum().astype(jnp.int32), None
        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None,
                              length=4)
        return tot

    chained(dev_t, dev_q).block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        chained(dev_t, dev_q).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    cells = T * jt * V * m * 4
    return cells / best / 1e9


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
