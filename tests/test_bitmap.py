import numpy as np
import pytest

from seesaw_tpu.runtime.bitmap import BitMap, FrozenBitMap, _load_native


def test_native_library_builds():
    # the C++ backend must be available in this environment (g++ is baked in)
    assert _load_native() is not None


def test_basic_ops():
    bm = BitMap([3, 1, 2, 2])
    assert len(bm) == 3
    assert 2 in bm and 5 not in bm
    bm.add(100000)
    assert 100000 in bm
    assert bm.to_array().tolist() == [1, 2, 3, 100000]
    bm.remove(2)
    assert 2 not in bm and len(bm) == 3


def test_set_algebra():
    a = BitMap([1, 2, 3, 70000])
    b = BitMap([2, 70000, 99])
    assert (a - b).to_array().tolist() == [1, 3]
    assert (a | b).to_array().tolist() == [1, 2, 3, 99, 70000]
    assert (a & b).to_array().tolist() == [2, 70000]
    assert a == BitMap([70000, 3, 2, 1])
    assert a != b


def test_update_and_copy_independent():
    a = BitMap()
    a.update(np.array([5, 6], dtype=np.int64))
    c = a.copy()
    c.add(7)
    assert len(a) == 2 and len(c) == 3


def test_contains_many():
    a = BitMap([10, 20, 65536 + 5])
    mask = a.contains_many(np.array([10, 11, 65536 + 5], dtype=np.uint32))
    assert mask.tolist() == [True, False, True]


def test_array_to_bitset_promotion():
    # cross the 4096-cardinality array->bitset boundary within one chunk
    vals = np.arange(5000, dtype=np.uint32)
    bm = BitMap(vals)
    assert len(bm) == 5000
    assert np.array_equal(bm.to_array(), vals)
    bm.remove(4999)
    assert len(bm) == 4999
    mask = bm.contains_many(np.array([0, 4998, 4999], dtype=np.uint32))
    assert mask.tolist() == [True, True, False]


def test_frozen():
    f = FrozenBitMap([1, 2])
    assert len(f) == 2
    with pytest.raises(TypeError):
        f.add(3)


def test_iteration_sorted():
    bm = BitMap([9, 1, 70000, 3])
    assert list(bm) == [1, 3, 9, 70000]
