"""Native C++ symbolic-analysis module vs the numpy fallback."""

import numpy as np

from madnlp_tpu.native import _jtdj_pair_map_numpy, _load, jtdj_pair_map


def _canon(maps):
    pr, pc, pa, pb, pk = maps
    order = np.lexsort((pb, pa, pc, pr, pk))
    return tuple(m[order] for m in maps)


def test_cpp_matches_numpy():
    rng = np.random.default_rng(0)
    m, nnz = 50, 400
    rows = rng.integers(0, m, nnz).astype(np.int64)
    cols = rng.integers(0, 80, nnz).astype(np.int64)
    a = _canon(jtdj_pair_map(rows, cols, m))
    b = _canon(_jtdj_pair_map_numpy(rows, cols, m))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_cpp_compiles():
    assert _load(), "g++ toolchain should be available in this image"


def test_pair_map_semantics():
    # one row with entries (cols 2, 5): pairs (2,2),(2,5),(5,2),(5,5)
    rows = np.array([0, 0], dtype=np.int64)
    cols = np.array([2, 5], dtype=np.int64)
    pr, pc, pa, pb, pk = _canon(jtdj_pair_map(rows, cols, 1))
    np.testing.assert_array_equal(sorted(zip(pr, pc)), [(2, 2), (2, 5), (5, 2), (5, 5)])
    assert (pk == 0).all()


def test_large_scale_fast():
    import time

    rng = np.random.default_rng(1)
    m, nnz = 20000, 160000
    rows = np.repeat(np.arange(m), 8).astype(np.int64)
    cols = rng.integers(0, 30000, nnz).astype(np.int64)
    t0 = time.time()
    pr, pc, pa, pb, pk = jtdj_pair_map(rows, cols, m)
    dt = time.time() - t0
    assert len(pr) == m * 64  # 8 entries/row -> 64 pairs/row
    assert dt < 5.0, f"symbolic analysis too slow: {dt:.1f}s"
