"""salted_join == hash_join row-set, with the hot key spread."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from pagerank_ray.stages.join import hash_join, salted_join


def _tables(hot_frac=0.4, n_big=20_000, n_small=300, seed=5):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 200, n_big)
    keys[: int(hot_frac * n_big)] = 7  # one hot key
    big = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "payload": pa.array(rng.integers(0, 10**6, n_big),
                            pa.int64())})).repartition(8)
    small = rd.from_arrow(pa.table({
        "sk": pa.array(np.arange(n_small), pa.int64()),
        "name": pa.array([f"n{i}" for i in range(n_small)],
                         pa.string())})).repartition(4)
    return big, small


def _sorted_rows(ds):
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_salted_join_equals_hash_join():
    big, small = _tables()
    heavy = pa.array([7], pa.int64())
    a = _sorted_rows(salted_join(big, small, "k", "sk", heavy,
                                 salt=8, num_partitions=8))
    b = _sorted_rows(hash_join(big, small, on=("k",),
                               right_on=("sk",), num_partitions=8))
    assert len(a) > 0 and a.equals(b)


def test_salted_join_no_heavy_keys_degenerates():
    big, small = _tables()
    heavy = pa.array([], pa.int64())  # nothing hot: pure pass-through
    a = _sorted_rows(salted_join(big, small, "k", "sk", heavy,
                                 salt=8, num_partitions=8))
    b = _sorted_rows(hash_join(big, small, on=("k",),
                               right_on=("sk",), num_partitions=8))
    assert a.equals(b)


def test_salted_join_multiple_heavy_and_dup_small():
    # duplicate small-side keys: join multiplicity must be preserved
    big, small = _tables()
    small2 = rd.from_arrow(pa.table({
        "sk": pa.array([7, 7, 12], pa.int64()),
        "name": pa.array(["a", "b", "c"], pa.string())}))
    heavy = pa.array([7, 12], pa.int64())
    a = _sorted_rows(salted_join(big, small2, "k", "sk", heavy,
                                 salt=4, num_partitions=8))
    b = _sorted_rows(hash_join(big, small2, on=("k",),
                               right_on=("sk",), num_partitions=8))
    assert len(a) > 0 and a.equals(b)
