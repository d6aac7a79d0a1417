"""Device-result drain helpers.

Every host pull of a device array is a full host<->device round trip;
the dev tunnel has measured anywhere from ~55 ms to ~1.8 s per pull
across epochs (bench.py link probe), so a serving path that drains one
result tuple per work unit can spend multiples of its compute time just
pulling. The rule (learned stepwise across rounds 3-4, each application
measured): concatenate per-unit results ON DEVICE and pull once per
output array, not once per (unit, output).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def concat_groups(parts):
    """Concatenate a tuple of per-group result tuples along axis 0.

    parts: ((a0, b0, ...), (a1, b1, ...), ...) where the i-th output of
    every group shares trailing dims. Returns (cat_a, cat_b, ...). One
    jit specialization per composition of shapes — the same shape-
    bucketing cost the per-group steps already pay."""
    return tuple(jnp.concatenate(arrs) for arrs in zip(*parts))
