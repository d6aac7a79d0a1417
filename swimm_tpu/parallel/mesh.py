"""Device mesh construction (L3).

The search workload has one big parallel axis — the database — plus an
optional query-batch axis (SURVEY.md section 3, parallelism inventory):

- ``data``: DB blocks sharded across devices (the analog of the reference's
  chunk distribution over host threads + Phi coprocessors, C11/C12).
- ``query``: independent queries sharded across devices (a deliberate,
  documented divergence from the reference's serial query loop — SURVEY.md
  section 4.5).

There is no model parallelism to speak of: the "model" (query profile +
substitution matrix + gap penalties) is tiny and replicated; the *data* is
what gets sharded — the key architectural inversion called out in SURVEY.md
section 3.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, query_axis: int = 1) -> Mesh:
    """Build a ('data', 'query') mesh over local (or given #) devices.

    query_axis=1 gives a pure data-parallel mesh (the common case for one
    query at a time); query_axis>1 carves devices into a 2D grid.
    """
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} "
                "available")
        devices = devices[:n_devices]
    n = len(devices)
    if query_axis < 1:
        raise ValueError(f"query_axis must be >= 1 (got {query_axis})")
    if n % query_axis:
        raise ValueError(f"{n} devices not divisible by query_axis={query_axis}")
    arr = np.array(devices).reshape(n // query_axis, query_axis)
    return Mesh(arr, ("data", "query"))


def balanced_2d(n: int) -> tuple[int, int]:
    """Factor n into (data, query) axes, data >= query, as square as possible."""
    q = int(np.floor(np.sqrt(n)))
    while n % q:
        q -= 1
    return n // q, q
