"""Deterministic hash-argmin walks (graph/walks.py)."""
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from pagerank_ray.graph.walks import (deterministic_walks, walk_hash,
                                      walks_sql)


def _edges(src, dst):
    return rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())}))


def _brute(src, dst, num_steps, seed):
    """Independent python oracle: per-walker argmin by (h, dst)."""
    out_edges = {}
    for s, d in zip(src, dst):
        out_edges.setdefault(int(s), []).append(int(d))
    rows = []
    for start in sorted(set(int(s) for s in src)):
        cur = start
        rows.append((start, 0, start))
        for step in range(1, num_steps + 1):
            if cur not in out_edges:
                break
            cands = out_edges[cur]
            h = walk_hash(np.full(len(cands), cur, np.uint64),
                          np.array(cands, np.uint64), step, seed)
            best = min(zip(h.tolist(), cands))
            cur = best[1]
            rows.append((start, step, cur))
    return sorted(rows)


def test_walks_match_brute_random():
    rng = np.random.default_rng(11)
    src = rng.integers(0, 60, 400)
    dst = rng.integers(0, 60, 400)
    got = deterministic_walks(_edges(src, dst).repartition(5),
                              num_steps=4, seed=3).to_pandas()
    assert sorted(zip(got.start, got.step, got.node)) \
        == _brute(src, dst, 4, 3)


def test_walks_match_duckdb_oracle():
    import duckdb
    rng = np.random.default_rng(7)
    src = rng.integers(0, 80, 500)
    dst = rng.integers(0, 80, 500)
    et = pa.table({"src": pa.array(src, pa.int64()),
                   "dst": pa.array(dst, pa.int64())})
    got = deterministic_walks(rd.from_arrow(et).repartition(4),
                              num_steps=3, seed=7).to_pandas()
    con = duckdb.connect()
    con.register("edges_tbl", et)
    exp = con.execute(
        walks_sql("SELECT src, dst FROM edges_tbl", 3, 7)).df()
    assert sorted(zip(got.start, got.step, got.node)) \
        == sorted(zip(exp.start, exp.step, exp.node))


def test_walks_dangling_stops():
    # 1 -> 2 -> 3, 3 has no out-edges: walker 1 stops at step 2
    got = deterministic_walks(_edges([1, 2], [2, 3]),
                              num_steps=5).to_pandas()
    w1 = got[got.start == 1].sort_values("step")
    assert list(w1.step) == [0, 1, 2]
    assert list(w1.node) == [1, 2, 3]


def test_walks_duplicate_edges_and_self_loops():
    # duplicates of (1,2) and a self-loop on 2 don't change selection
    a = deterministic_walks(_edges([1, 2], [2, 2]),
                            num_steps=3).to_pandas()
    b = deterministic_walks(_edges([1, 1, 1, 2, 2], [2, 2, 2, 2, 2]),
                            num_steps=3).to_pandas()
    assert sorted(zip(a.start, a.step, a.node)) \
        == sorted(zip(b.start, b.step, b.node))
    # the self-loop walker loops forever
    w2 = a[a.start == 2]
    assert list(w2.node) == [2, 2, 2, 2]


def test_walks_partition_invariance():
    rng = np.random.default_rng(5)
    src = rng.integers(0, 40, 300)
    dst = rng.integers(0, 40, 300)
    a = deterministic_walks(_edges(src, dst).repartition(2),
                            num_steps=3, join_partitions=3).to_pandas()
    b = deterministic_walks(_edges(src, dst).repartition(9),
                            num_steps=3, join_partitions=8).to_pandas()
    assert sorted(zip(a.start, a.step, a.node)) \
        == sorted(zip(b.start, b.step, b.node))


def test_walks_degenerate():
    empty = deterministic_walks(_edges([], []), num_steps=3)
    assert empty.num_rows == 0
    assert empty.column_names == ["start", "step", "node"]
    zero = deterministic_walks(_edges([4], [5]), num_steps=0)
    assert sorted(zip(zero.column("start").to_pylist(),
                      zero.column("step").to_pylist(),
                      zero.column("node").to_pylist())) == [(4, 0, 4)]
    with pytest.raises(ValueError):
        deterministic_walks(_edges([1], [2]), num_steps=-1)


def test_walks_out_dir_sink(tmp_path):
    from pagerank_ray.graph.sink import read_sunk_dataset
    src, dst = [1, 2, 3], [2, 3, 1]
    d = str(tmp_path / "walks")
    assert deterministic_walks(_edges(src, dst), num_steps=2,
                               out_dir=d) is None
    back = read_sunk_dataset(d).to_pandas()
    direct = deterministic_walks(_edges(src, dst),
                                 num_steps=2).to_pandas()
    assert sorted(zip(back.start, back.step, back.node)) \
        == sorted(zip(direct.start, direct.step, direct.node))
