"""functions/vectors.py — the zero-copy Arrow<->numpy bridges every
embedding / packed-set stage now rides on. Round-trips, chunked and
SLICED arrays (non-zero Arrow offsets), fixed_size_list, and the
ragged fallback."""

import numpy as np
import pyarrow as pa

from pagerank_ray.functions.vectors import (binary_flat, binary_matrix,
                                            list_matrix, pack_rows)


def test_list_matrix_list_and_fixed_size():
    m = np.arange(12, dtype=np.float64).reshape(4, 3)
    lst = pa.array([list(r) for r in m])
    assert np.array_equal(list_matrix(lst), m)
    fsl = pa.FixedSizeListArray.from_arrays(
        pa.array(m.ravel()), 3)
    assert np.array_equal(list_matrix(fsl), m)


def test_list_matrix_chunked_and_sliced():
    m = np.arange(20, dtype=np.float64).reshape(5, 4)
    a1 = pa.array([list(r) for r in m[:2]])
    a2 = pa.array([list(r) for r in m[2:]])
    chunked = pa.chunked_array([a1, a2])
    assert np.array_equal(list_matrix(chunked), m)
    # non-zero offset slice
    sliced = pa.array([list(r) for r in m]).slice(1, 3)
    assert np.array_equal(list_matrix(sliced), m[1:4])
    # sliced fixed_size_list (offset handling through flatten)
    fsl = pa.FixedSizeListArray.from_arrays(pa.array(m.ravel()), 4)
    assert np.array_equal(list_matrix(fsl.slice(2, 2)), m[2:4])


def test_list_matrix_float32_casts_and_ragged_fallback():
    m32 = np.arange(6, dtype=np.float32).reshape(2, 3)
    lst = pa.array([list(r) for r in m32], pa.list_(pa.float32()))
    out = list_matrix(lst)
    assert out.dtype == np.float64
    assert np.array_equal(out, m32.astype(np.float64))
    # ragged rows fall back to the row-wise path (np.stack raises on
    # genuinely ragged input — equal-after-first rows still work)
    ragged = pa.array([[1.0, 2.0], [3.0, 4.0]])
    assert np.array_equal(list_matrix(ragged),
                          np.array([[1.0, 2.0], [3.0, 4.0]]))


def test_pack_rows_binary_matrix_roundtrip():
    rng = np.random.RandomState(0)
    m = rng.rand(7, 5)
    packed = pack_rows(m)
    assert packed.type == pa.binary()
    assert [len(x.as_py()) for x in packed] == [40] * 7
    back = binary_matrix(pa.chunked_array([packed]))
    assert np.array_equal(back, m)


def test_binary_flat_variable_width_and_slice():
    rows = [np.array([1, 2, 3], np.uint32),
            np.array([], np.uint32),
            np.array([7, 8], np.uint32)]
    col = pa.array([r.tobytes() for r in rows], pa.binary())
    flat, lens = binary_flat(col, np.uint32)
    assert lens.tolist() == [3, 0, 2]
    assert flat.tolist() == [1, 2, 3, 7, 8]
    # sliced column: offsets no longer start at 0
    flat2, lens2 = binary_flat(col.slice(1, 2), np.uint32)
    assert lens2.tolist() == [0, 2]
    assert flat2.tolist() == [7, 8]


def test_binary_flat_chunked_roundtrip_float64():
    m = np.arange(8, dtype=np.float64).reshape(2, 4)
    c1 = pack_rows(m[:1])
    c2 = pack_rows(m[1:])
    col = pa.chunked_array([c1, c2])
    assert np.array_equal(binary_matrix(col), m)
