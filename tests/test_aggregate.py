"""Skew-aware aggregation: partial counts, salted two-phase, histogram."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from pagerank_ray.stages.aggregate import (degree_histogram, grouped_count,
                                           salted_grouped_count)


def _skewed_ds(n=5000, hot="hotkey", seed=11):
    rng = np.random.RandomState(seed)
    keys = [hot if rng.rand() < 0.5 else f"k{rng.randint(100)}"
            for _ in range(n)]
    return rd.from_arrow(pa.table({"k": pa.array(keys, pa.string())})), keys


def test_grouped_count_matches_naive():
    ds, keys = _skewed_ds()
    got = {r["k"]: r["cnt"] for r in grouped_count(ds, "k").take_all()}
    want = {}
    for k in keys:
        want[k] = want.get(k, 0) + 1
    assert got == want


def test_salted_grouped_count_matches_naive():
    ds, keys = _skewed_ds()
    got = {r["k"]: r["cnt"]
           for r in salted_grouped_count(ds, "k", salt=8).take_all()}
    want = {}
    for k in keys:
        want[k] = want.get(k, 0) + 1
    assert got == want


def test_salted_grouped_count_int_keys():
    rng = np.random.RandomState(3)
    vals = rng.zipf(1.5, 2000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": pa.array(vals)}))
    got = {r["k"]: r["cnt"]
           for r in salted_grouped_count(ds, "k", salt=4).take_all()}
    uk, c = np.unique(vals, return_counts=True)
    assert got == dict(zip(uk.tolist(), c.tolist()))


def test_degree_histogram():
    ds, keys = _skewed_ds()
    h = degree_histogram(ds, "k")
    total_keys = sum(h.column("num_keys").to_pylist())
    assert total_keys == len(set(keys))
    # the hot key lands in a high bucket
    assert max(h.column("log2_bucket").to_pylist()) >= 10


def test_heavy_targets_salted_matches_naive():
    """heavy_targets (the salted production path) == a naive driver
    count over the same skewed edge stream."""
    from pagerank_ray.stages.filters import heavy_targets

    rng = np.random.RandomState(7)
    dst = [("hub" if rng.rand() < 0.4 else f"n{rng.randint(50)}")
           for _ in range(4000)]
    edges = pa.table({
        "src": pa.array([f"s{i % 97}" for i in range(len(dst))],
                        pa.string()),
        "dst": pa.array(dst, pa.string()),
    })
    num_nodes = len(set(dst))
    ratio = 0.5
    want = {k for k in set(dst)
            if dst.count(k) >= ratio * num_nodes}
    got = heavy_targets(rd.from_arrow(edges), ratio, num_nodes, salt=8)
    assert got == want
    assert "hub" in got        # the hot key is detected
