"""Luby maximal independent set (graph/mis.py)."""
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from pagerank_ray.graph.mis import maximal_independent_set, mis_sql


def _edges(src, dst):
    return rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())}))


def _adj(src, dst):
    adj = {}
    for s, d in zip(src, dst):
        s, d = int(s), int(d)
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    return adj


def _check_mis(src, dst, mis):
    adj = _adj(src, dst)
    assert all(not (adj.get(u, set()) & mis) for u in mis), \
        "not independent"
    assert all(u in mis or (adj.get(u, set()) & mis) for u in adj), \
        "not maximal"


def test_mis_invariants_random():
    rng = np.random.default_rng(17)
    src = rng.integers(0, 120, 600)
    dst = rng.integers(0, 120, 600)
    got = maximal_independent_set(_edges(src, dst).repartition(5),
                                  seed=5)
    _check_mis(src, dst, set(got.column("node").to_pylist()))


def test_mis_matches_duckdb_oracle():
    import duckdb
    rng = np.random.default_rng(9)
    src = rng.integers(0, 100, 500)
    dst = rng.integers(0, 100, 500)
    et = pa.table({"src": pa.array(src, pa.int64()),
                   "dst": pa.array(dst, pa.int64())})
    got = maximal_independent_set(rd.from_arrow(et).repartition(4),
                                  seed=7)
    rounds = int(got.schema.metadata[b"rounds_used"])
    con = duckdb.connect()
    con.register("edges_tbl", et)
    exp = con.execute(mis_sql("SELECT src, dst FROM edges_tbl",
                              rounds=max(rounds, 8), seed=7)).df()
    assert sorted(zip(got.column("node").to_pylist(),
                      got.column("mis_round").to_pylist())) \
        == sorted(zip(exp.node, exp.mis_round))


def test_mis_known_graphs():
    # star: center 0 has the most neighbors; MIS is either {0} or
    # all leaves — check invariants plus determinism across layouts
    src = [0] * 6
    dst = [1, 2, 3, 4, 5, 6]
    a = maximal_independent_set(_edges(src, dst))
    _check_mis(src, dst, set(a.column("node").to_pylist()))
    b = maximal_independent_set(_edges(src, dst).repartition(4),
                                join_partitions=3)
    assert a.column("node").to_pylist() == b.column("node").to_pylist()
    # triangle: exactly one node wins
    t = maximal_independent_set(_edges([1, 2, 3], [2, 3, 1]))
    assert t.num_rows == 1
    # path 1-2-3: MIS is {1,3} or {2}; invariants decide
    p = maximal_independent_set(_edges([1, 2], [2, 3]))
    _check_mis([1, 2], [2, 3], set(p.column("node").to_pylist()))


def test_mis_degenerate():
    empty = maximal_independent_set(_edges([], []))
    assert empty.num_rows == 0
    assert empty.column_names == ["node", "mis_round"]
    # self-loop-only nodes are excluded entirely
    only_loops = maximal_independent_set(_edges([5, 9], [5, 9]))
    assert only_loops.num_rows == 0
    with pytest.raises(RuntimeError):
        maximal_independent_set(_edges([1, 2, 3], [2, 3, 1]),
                                max_rounds=0)


def test_mis_out_dir_sink(tmp_path):
    from pagerank_ray.graph.sink import read_sunk_dataset
    src, dst = [1, 2, 3, 4], [2, 3, 4, 1]
    d = str(tmp_path / "mis")
    assert maximal_independent_set(_edges(src, dst),
                                   out_dir=d) is None
    back = read_sunk_dataset(d).to_pandas()
    direct = maximal_independent_set(_edges(src, dst)).to_pandas()
    assert sorted(zip(back.node, back.mis_round)) \
        == sorted(zip(direct.node, direct.mis_round))


def test_mis_dataset_path_matches_broadcast():
    from pagerank_ray.graph import mis as mis_mod
    rng = np.random.default_rng(14)
    src = rng.integers(0, 60, 350)
    dst = rng.integers(0, 60, 350)
    a = maximal_independent_set(_edges(src, dst), seed=3)
    old = mis_mod.ALIVE_BROADCAST_MAX_ROWS
    try:
        mis_mod.ALIVE_BROADCAST_MAX_ROWS = 0  # force Dataset path
        b = maximal_independent_set(_edges(src, dst), seed=3)
    finally:
        mis_mod.ALIVE_BROADCAST_MAX_ROWS = old
    assert sorted(zip(a.column("node").to_pylist(),
                      a.column("mis_round").to_pylist())) \
        == sorted(zip(b.column("node").to_pylist(),
                      b.column("mis_round").to_pylist()))
    assert a.schema.metadata[b"rounds_used"] \
        == b.schema.metadata[b"rounds_used"]
