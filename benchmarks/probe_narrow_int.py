import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Toolchain probe: can Mosaic compile narrow-int (int16/int8) VPU
arithmetic yet, and does it buy lane throughput?

docs/KERNEL_NOTES.md records the round-3 finding on jaxlib 0.9.0 /
libtpu 0.0.34: Mosaic cannot compile int16/int8 elementwise arithmetic
at all, and bf16 buys nothing over int32 — so the precision ladder's
saturating tiers run in 32-bit lanes (exactness is tier-independent;
only speed is on the table). The roadmap says: re-run this probe on
every jaxlib/libtpu upgrade; if narrow tiles land, the ladder tier
kernels gain 2x/4x lanes unchanged.

Prints one JSON line:
  {"jaxlib": ..., "libtpu": ..., "int16_compiles": bool,
   "int8_compiles": bool, "int16_speedup_vs_int32": float|null, ...}

Run on the TPU (exclusive chip access — do not run while bench.py is).
"""

import json
import time

import numpy as np


def _try_kernel(dtype):
    """Compile + run a minimal saturating-add/max elementwise kernel in
    `dtype`; return (ok, seconds_per_iter or None, err or None)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    lo = -1000 if dtype == jnp.int32 else -120   # python int: inlined,
    # not a captured traced constant (pallas_call rejects those)

    def body(x_ref, o_ref):
        a = x_ref[...]
        # the DP inner step's op mix: add, three maxes, subtract
        h = jnp.maximum(jnp.maximum(a + a, a - lo), jnp.maximum(a, lo))
        o_ref[...] = jnp.maximum(h - a, lo)

    x = jnp.asarray(np.random.default_rng(0).integers(
        -50, 50, size=(512, 1024)), dtype)

    @jax.jit
    def step(v):
        def one(c, _):
            r = pl.pallas_call(
                body, out_shape=jax.ShapeDtypeStruct(v.shape, dtype))(c)
            return r, ()
        out, _ = jax.lax.scan(one, v, None, length=8)
        return out

    try:
        r = step(x)
        r.block_until_ready()
    except Exception as e:  # noqa: BLE001 — the probe's whole job is
        # to report WHICH dtypes the toolchain rejects
        return False, None, f"{type(e).__name__}: {str(e)[:200]}"
    t0 = time.perf_counter()
    r = step(x)
    r.block_until_ready()
    return True, (time.perf_counter() - t0) / 8, None


def main() -> int:
    import jax
    import jaxlib

    out = {"jaxlib": jaxlib.__version__,
           "device": str(jax.devices()[0])}
    try:
        import libtpu
        out["libtpu"] = getattr(libtpu, "__version__", "?")
    except Exception:
        out["libtpu"] = None

    res = {}
    import jax.numpy as jnp
    for name, dt in [("int32", jnp.int32), ("int16", jnp.int16),
                     ("int8", jnp.int8)]:
        ok, per, err = _try_kernel(dt)
        res[name] = {"compiles": ok, "s_per_iter": per, "error": err}
        out[f"{name}_compiles"] = ok
    if res["int32"]["compiles"] and res["int16"]["compiles"]:
        out["int16_speedup_vs_int32"] = round(
            res["int32"]["s_per_iter"] / res["int16"]["s_per_iter"], 2)
    else:
        out["int16_speedup_vs_int32"] = None
    if res["int32"]["compiles"] and res["int8"]["compiles"]:
        out["int8_speedup_vs_int32"] = round(
            res["int32"]["s_per_iter"] / res["int8"]["s_per_iter"], 2)
    else:
        out["int8_speedup_vs_int32"] = None
    for name in ("int16", "int8"):
        if res[name]["error"]:
            out[f"{name}_error"] = res[name]["error"]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
