"""GNN-style feature propagation (graph/propagate.py)."""
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from pagerank_ray.graph.propagate import (feature_propagation,
                                          propagation_sql)


def _mk(src, dst, f):
    et = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                 "dst": pa.array(dst, pa.int64())}))
    ft = rd.from_arrow(pa.table({
        "node": pa.array(np.arange(len(f)), pa.int64()),
        "f": pa.array(f, pa.int64())}))
    return et, ft


def test_propagation_matches_numpy_and_duckdb():
    import duckdb
    rng = np.random.default_rng(6)
    n, m = 80, 500
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    f = rng.integers(1, 40, n)
    et, ft = _mk(src, dst, f)
    got = feature_propagation(et.repartition(4), ft, hops=2)
    g = sorted(zip(got.column("node").to_pylist(),
                   got.column("hop").to_pylist(),
                   got.column("agg").to_pylist()))

    con = duckdb.connect()
    con.register("et", pa.table({"src": pa.array(src, pa.int64()),
                                 "dst": pa.array(dst, pa.int64())}))
    con.register("ft", pa.table({
        "node": pa.array(np.arange(n), pa.int64()),
        "f": pa.array(f, pa.int64())}))
    exp = con.execute(propagation_sql("SELECT src, dst FROM et",
                                      "SELECT node, f FROM ft",
                                      2)).df()
    assert g == sorted(zip(exp["node"], exp["hop"], exp["agg"]))

    # numpy A @ f with multiplicity, hop-1 rows only for src nodes
    A = np.zeros((n, n), np.int64)
    for s, d in zip(src, dst):
        A[s, d] += 1
    h1 = A @ f
    assert {u: v for u, h, v in g if h == 1} \
        == {u: int(h1[u]) for u in range(n) if A[u].sum() > 0}


def test_propagation_multiplicity_and_chain():
    # duplicate edge (0,1) doubles node 1's contribution
    et, ft = _mk([0, 0, 1], [1, 1, 2], [5, 7, 11])
    t = feature_propagation(et, ft, hops=2)
    rows = {(n_, h): a for n_, h, a in
            zip(t.column("node").to_pylist(),
                t.column("hop").to_pylist(),
                t.column("agg").to_pylist())}
    assert rows[(0, 1)] == 14          # 2 x f(1)
    assert rows[(1, 1)] == 11          # f(2)
    assert rows[(0, 2)] == 22          # 2 x h1(1); node 2 has no h1
    assert (1, 2) not in rows          # node 2 has no hop-1 value


def test_propagation_degenerate():
    et, ft = _mk([], [], [])
    t = feature_propagation(et, ft, hops=2)
    assert t.num_rows == 0
    assert t.column_names == ["node", "hop", "agg"]
    with pytest.raises(ValueError):
        feature_propagation(et, ft, hops=0)


def test_propagation_out_dir_sink(tmp_path):
    from pagerank_ray.graph.sink import read_sunk_dataset
    et, ft = _mk([0, 1, 2], [1, 2, 0], [3, 4, 5])
    d = str(tmp_path / "prop")
    assert feature_propagation(et, ft, hops=2, out_dir=d) is None
    back = read_sunk_dataset(d).to_pandas()
    direct = feature_propagation(et, ft, hops=2).to_pandas()
    assert sorted(zip(back["node"], back["hop"], back["agg"])) \
        == sorted(zip(direct["node"], direct["hop"], direct["agg"]))
