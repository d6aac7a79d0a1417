"""Multi-host execution utilities (L3; SURVEY.md section 6.8).

Replaces the reference's single-node-only execution model with jax
multi-host SPMD: every process (host) joins via jax.distributed, the global
('data','query') mesh spans all chips (ICI within a slice, DCN across
hosts), and each host feeds only its local shard of the database.

The search itself is unchanged — sharded_search works on any mesh. What
this module adds:

- init(): jax.distributed.initialize wrapper (coordinator discovery via the
  standard env vars or explicit args).
- host_block_range(): which packed-DB blocks this host must load, so a host
  only reads its slice of the chunk files (the manifest's per-chunk block
  counts make this a pure index computation — no data redistribution).
- make_global_chunk(): assemble a globally-sharded device array from
  host-local block data via jax.make_array_from_single_device_arrays.

Cannot be exercised in this 1-host dev environment; the sharding/collective
code paths it feeds are covered by the virtual-mesh tests
(tests/test_sharded.py) which run the same shard_map program.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init(coordinator_address: str | None = None,
         num_processes: int | None = None,
         process_id: int | None = None) -> None:
    """Join the multi-host job (no-op if already initialized or 1 process)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass  # already initialized


def global_mesh(query_axis: int = 1) -> Mesh:
    """('data','query') mesh over ALL devices in the job (all hosts)."""
    devs = np.array(jax.devices())
    n = len(devs)
    if n % query_axis:
        raise ValueError(f"{n} global devices not divisible by {query_axis}")
    return Mesh(devs.reshape(n // query_axis, query_axis), ("data", "query"))


def process_data_rows(mesh: Mesh, process_index: int | None = None) -> list:
    """Sorted 'data'-axis rows that contain >= 1 device of this process.

    These are the data-shard indices whose DB slice this host must
    materialize (global_tile_shards builds exactly these shards locally)."""
    if process_index is None:
        process_index = jax.process_index()
    return sorted({i for i in range(mesh.devices.shape[0])
                   if any(d.process_index == process_index
                          for d in mesh.devices[i])})


def block_range_for_rows(n_blocks: int, n_data: int,
                         rows: list) -> tuple[int, int]:
    """Pure index math behind host_block_range: [start, stop) padded-block
    range covered by the given contiguous 'data'-axis rows, for a chunk
    whose block axis (padded to a multiple of n_data) is sharded evenly.

    Raises if the rows are non-contiguous — a strided host-to-row layout
    would silently drop blocks under a contiguous-range contract, so fail
    loudly instead (assemble per-row in that case)."""
    bp = -(-n_blocks // n_data) * n_data     # padded block count
    per_dev = bp // n_data
    if not rows:
        return 0, 0
    if list(rows) != list(range(rows[0], rows[-1] + 1)):
        raise ValueError(
            f"process rows {rows} are not contiguous on the 'data' axis; "
            "host_block_range requires a contiguous block range")
    return rows[0] * per_dev, (rows[-1] + 1) * per_dev


def host_block_range(n_blocks: int, mesh: Mesh) -> tuple[int, int]:
    """[start, stop) padded-block range this host's devices own for a chunk
    whose block axis is sharded over 'data'. Blocks are distributed
    contiguously, so a host's range is contiguous too."""
    return block_range_for_rows(n_blocks, int(mesh.shape["data"]),
                                process_data_rows(mesh))


def global_tile_shards(packed, mesh: Mesh):
    """Multi-host counterpart of sharded_search.build_tile_shards: assemble
    the globally-sharded whole-DB tile arrays with each host materializing
    ONLY the shards its devices own (the packed DB is memmapped, so the
    shard plan is an index computation; no cross-host data movement — each
    host reads its slice of the chunk files, SURVEY.md section 6.8).

    Returns (tiles_all, outrow_all, valid_all, lane2sorted_all,
    n_rows_local) exactly like build_tile_shards; feed to
    sharded_search.sharded_tiles_topk over the global mesh.
    """
    from swimm_tpu.parallel.sharded_search import plan_tile_shards

    n_data = int(mesh.shape["data"])
    shapes, build = plan_tile_shards(packed, n_data)
    T_max, R_loc, V, jt = (shapes["T_max"], shapes["R_loc"], shapes["V"],
                           shapes["jt"])
    cache: dict = {}

    def part(d: int, i: int):
        if d not in cache:
            cache[d] = build(d)
        return cache[d][i]

    def mk(shape, i, spec):
        # dtype is carried by the callback's arrays (plan_tile_shards)
        sharding = NamedSharding(mesh, spec)

        def cb(index):
            d = index[0].start or 0
            return np.ascontiguousarray(part(d, i))[None]

        return jax.make_array_from_callback(shape, sharding, cb)

    tiles_all = mk((n_data, T_max, jt, V), 0, P("data", None, None, None))
    outrow_all = mk((n_data, T_max), 1, P("data", None))
    valid_all = mk((n_data, R_loc * V), 2, P("data", None))
    l2s_all = mk((n_data, R_loc * V), 3, P("data", None))
    return tiles_all, outrow_all, valid_all, l2s_all, R_loc


def make_global_chunk(local_blocks: np.ndarray, n_blocks_global: int,
                      mesh: Mesh):
    """Build the globally-sharded (Bp, L, V) chunk array from this host's
    local blocks.

    local_blocks covers this host's [lo, hi) range from host_block_range —
    at least the real blocks in that range; the padded tail (ragged final
    shard) is PAD-filled here if the caller didn't provide it."""
    from swimm_tpu.alphabet import PAD_CODE
    n_data = int(mesh.shape["data"])
    bp = -(-n_blocks_global // n_data) * n_data
    per_dev = bp // n_data
    L, V = local_blocks.shape[1:]
    sharding = NamedSharding(mesh, P("data", None, None))
    shape = (bp, L, V)
    lo, hi = host_block_range(n_blocks_global, mesh)
    n_local_real = min(hi, n_blocks_global) - lo  # blocks that must exist
    if local_blocks.shape[0] < n_local_real:
        raise ValueError(
            f"local_blocks has {local_blocks.shape[0]} blocks; this host's "
            f"range [{lo}, {hi}) needs at least {n_local_real} real blocks")

    def cb(index):
        # index is the global slice for one device; translate to local
        start = index[0].start or 0
        sl = local_blocks[start - lo:start - lo + per_dev]
        if sl.shape[0] < per_dev:                # ragged padded tail
            pad = np.full((per_dev - sl.shape[0], L, V), PAD_CODE,
                          local_blocks.dtype)
            sl = np.concatenate([sl, pad]) if sl.size else pad
        return sl

    return jax.make_array_from_callback(shape, sharding, cb)
