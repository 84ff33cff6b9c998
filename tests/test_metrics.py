"""Graph scalar metrics (graph/metrics.py)."""
import numpy as np
import pyarrow as pa

import ray.data as rd

from pagerank_ray.graph.metrics import (ASSORTATIVITY_SQL,
                                        assortativity_stats)


def _edges(src, dst):
    return rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())}))


def test_assortativity_matches_duckdb_and_numpy():
    import duckdb
    rng = np.random.default_rng(12)
    src = rng.integers(0, 50, 300)
    dst = rng.integers(0, 50, 300)
    got = assortativity_stats(_edges(src, dst).repartition(4))
    g = {c: got.column(c)[0].as_py() for c in got.column_names}

    con = duckdb.connect()
    con.register("et", pa.table({"src": pa.array(src, pa.int64()),
                                 "dst": pa.array(dst, pa.int64())}))
    exp = con.execute(ASSORTATIVITY_SQL.format(
        edges="SELECT src, dst FROM et")).df()
    assert g == {c: int(exp[c][0]) for c in exp.columns}

    # numpy: x = outdeg(src), y = indeg(dst) per edge row
    od = np.bincount(src, minlength=50)
    idg = np.bincount(dst, minlength=50)
    x, y = od[src].astype(np.int64), idg[dst].astype(np.int64)
    assert g["n_edges"] == 300
    assert g["sum_xy"] == int((x * y).sum())
    assert g["sum_x2"] == int((x * x).sum())


def test_assortativity_join_path_matches_broadcast():
    from pagerank_ray.graph import metrics
    rng = np.random.default_rng(3)
    src = rng.integers(0, 30, 200)
    dst = rng.integers(0, 30, 200)
    a = assortativity_stats(_edges(src, dst))
    old = metrics.DEG_BROADCAST_MAX_ROWS
    try:
        metrics.DEG_BROADCAST_MAX_ROWS = 0
        b = assortativity_stats(_edges(src, dst))
    finally:
        metrics.DEG_BROADCAST_MAX_ROWS = old
    assert a.to_pydict() == b.to_pydict()


def test_assortativity_empty():
    t = assortativity_stats(_edges([], []))
    assert t.num_rows == 1
    assert all(t.column(c)[0].as_py() == 0 for c in t.column_names)


def test_reciprocity_matches_duckdb():
    import duckdb
    from pagerank_ray.graph.metrics import (RECIPROCITY_SQL,
                                            reciprocity_stats)
    rng = np.random.default_rng(21)
    src = rng.integers(0, 20, 250)
    dst = rng.integers(0, 20, 250)
    got = reciprocity_stats(_edges(src, dst).repartition(3))
    con = duckdb.connect()
    con.register("et", pa.table({"src": pa.array(src, pa.int64()),
                                 "dst": pa.array(dst, pa.int64())}))
    exp = con.execute(RECIPROCITY_SQL.format(
        edges="SELECT src, dst FROM et")).df()
    assert {c: got.column(c)[0].as_py() for c in got.column_names} \
        == {c: int(exp[c][0]) for c in exp.columns}


def test_reciprocity_known_and_empty():
    from pagerank_ray.graph.metrics import reciprocity_stats
    # 1<->2 reciprocal, 3->4 one-way (duplicated), 5 self-loop
    t = reciprocity_stats(_edges([1, 2, 3, 3, 5], [2, 1, 4, 4, 5]))
    g = {c: t.column(c)[0].as_py() for c in t.column_names}
    assert g == {"n_distinct_edges": 4, "n_self_loops": 1,
                 "n_reciprocal_pairs": 1}
    z = reciprocity_stats(_edges([], []))
    assert all(z.column(c)[0].as_py() == 0 for c in z.column_names)
