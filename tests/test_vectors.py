"""functions/vectors.py — zero-copy list<float> <-> matrix bridges."""
import numpy as np
import pyarrow as pa
import pytest

from sagan_ray.functions.vectors import matrix_to_list_array, vec_matrix


def test_vec_matrix_fast_path_matches_pylist():
    m = np.arange(24, dtype=np.float64).reshape(6, 4) / 7.0
    col = pa.array([r.tolist() for r in m], type=pa.list_(pa.float64()))
    out = vec_matrix(col)
    np.testing.assert_array_equal(out, m)
    # chunked input too
    ch = pa.chunked_array([col.slice(0, 2), col.slice(2)])
    np.testing.assert_array_equal(vec_matrix(ch), m)


def test_vec_matrix_sliced_offsets():
    """A sliced ListArray has a nonzero offset into shared buffers —
    the flatten path must honor it."""
    m = np.arange(20, dtype=np.float64).reshape(5, 4)
    col = pa.array([r.tolist() for r in m], type=pa.list_(pa.float64()))
    out = vec_matrix(col.slice(2, 2))
    np.testing.assert_array_equal(out, m[2:4])


def test_vec_matrix_ragged_raises():
    col = pa.array([[1.0, 2.0], [3.0]], type=pa.list_(pa.float64()))
    with pytest.raises(ValueError, match="ragged"):
        vec_matrix(col)


def test_matrix_round_trip():
    m = np.random.RandomState(3).randn(7, 5)
    arr = matrix_to_list_array(m)
    np.testing.assert_array_equal(vec_matrix(arr), m)


def test_vec_matrix_multiple_nulls_pad_nan():
    """Two+ null rows used to KeyError (destructive set.pop in the
    comprehension); they must NaN-pad instead."""
    col = pa.array([[1.0, 2.0], None, None, [3.0, 4.0]],
                   type=pa.list_(pa.float64()))
    out = vec_matrix(col)
    assert out.shape == (4, 2)
    assert np.isnan(out[1]).all() and np.isnan(out[2]).all()
    np.testing.assert_array_equal(out[0], [1.0, 2.0])
    # all-null column: zero-dim rows, no crash
    allnull = pa.array([None, None], type=pa.list_(pa.float64()))
    assert vec_matrix(allnull).shape == (2, 0)


def test_vec_matrix_round_trip_fuzz():
    """Property fuzz: arbitrary (n, dim) float64 matrices round-trip
    bit-exactly through matrix_to_list_array -> vec_matrix, including
    slices of the resulting ListArray."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 37), st.integers(1, 19), st.integers(0, 1000))
    def prop(n, d, seed):
        m = np.random.RandomState(seed).randn(n, d)
        arr = matrix_to_list_array(m)
        np.testing.assert_array_equal(vec_matrix(arr), m)
        lo = min(n - 1, seed % max(n, 1))
        sl = arr.slice(lo, max(1, n - lo - (seed % 2)))
        np.testing.assert_array_equal(vec_matrix(sl),
                                      m[lo: lo + len(sl)])

    prop()
