"""Weighted SSSP (delta-frontier Bellman-Ford, graph/bfs.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from pagerank_ray.graph.bfs import weighted_sssp


def _edges(rows):
    u, v, w = zip(*rows)
    return rd.from_arrow(pa.table({
        "u": pa.array([str(x) for x in u], pa.string()),
        "v": pa.array([str(x) for x in v], pa.string()),
        "w": pa.array(list(w), pa.int64())})).materialize()


def test_sssp_hand_checked_triangle():
    # direct edge a->c costs 5; a->b->c costs 2+2=4
    e = _edges([("a", "c", 5), ("a", "b", 2), ("b", "c", 2)])
    got = {r["node"]: r["dist"]
           for r in weighted_sssp(e, "a").to_pylist()}
    assert got == {"a": 0, "b": 2, "c": 4}


def test_sssp_unreachable_absent():
    e = _edges([("a", "b", 1), ("x", "y", 1)])
    got = {r["node"]: r["dist"]
           for r in weighted_sssp(e, "a").to_pylist()}
    assert got == {"a": 0, "b": 1}


def test_sssp_broadcast_equals_dataset_rounds():
    rng = np.random.default_rng(3)
    n, m = 40, 160
    rows = [(int(a), int(b), int(w)) for a, b, w in zip(
        rng.integers(0, n, m), rng.integers(0, n, m),
        rng.integers(1, 8, m))]
    # symmetrize so the graph is undirected
    rows = rows + [(b, a, w) for a, b, w in rows]
    e = _edges(rows)
    seed = min(str(a) for a, _, _ in rows)
    b = weighted_sssp(e, seed, mode="broadcast")
    d = weighted_sssp(e, seed, mode="dataset", join_partitions=4)
    assert b.to_pandas().equals(d.to_pandas())
    assert b.schema.metadata[b"rounds_used"] == \
        d.schema.metadata[b"rounds_used"]
    # python brute oracle (Dijkstra)
    import heapq
    adj = {}
    for a, bb, w in rows:
        adj.setdefault(str(a), []).append((str(bb), w))
    dist = {seed: 0}
    pq = [(0, seed)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, 2**62):
            continue
        for v, w in adj.get(u, []):
            if du + w < dist.get(v, 2**62):
                dist[v] = du + w
                heapq.heappush(pq, (du + w, v))
    got = {r["node"]: r["dist"] for r in b.to_pylist()}
    assert got == dist


@pytest.mark.parametrize("mode", ["broadcast", "dataset"])
def test_sssp_raises_on_round_exhaustion(mode):
    e = _edges([("a", "b", 1), ("b", "c", 1), ("c", "d", 1)])
    with pytest.raises(RuntimeError, match="did not converge"):
        weighted_sssp(e, "a", max_rounds=2, mode=mode,
                      join_partitions=4)


def test_sssp_events_contract_matches_duckdb():
    import duckdb

    import __ray_entry__ as entry
    sf = "/root/testdata/sf0.001"
    got = entry.queries()["sssp_events"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    exp = con.execute(entry.oracle_sql()["sssp_events"]).df()
    assert len(got) == len(exp) and len(got) > 0
    assert got["node"].tolist() == exp["node"].tolist()
    assert (got["dist"].to_numpy()
            == exp["dist"].to_numpy().astype("int64")).all()


@pytest.mark.parametrize("mode", ["broadcast", "dataset"])
def test_sssp_rejects_absent_seed(mode):
    e = _edges([("a", "b", 1)])
    with pytest.raises(ValueError, match="not in graph"):
        weighted_sssp(e, "z", mode=mode, join_partitions=4)


def test_sssp_rejects_unknown_mode():
    e = _edges([("a", "b", 1)])
    with pytest.raises(ValueError, match="unknown mode"):
        weighted_sssp(e, "a", mode="broadcst")


@pytest.mark.parametrize("mode", ["broadcast", "dataset"])
def test_sssp_out_dir_sink_readback(tmp_path, mode):
    from pagerank_ray.graph.sink import read_sunk_dataset

    e = _edges([("a", "c", 5), ("a", "b", 2), ("b", "c", 2)])
    d = str(tmp_path / f"sssp_{mode}")
    res = weighted_sssp(e, "a", mode=mode, join_partitions=4,
                        out_dir=d)
    assert res["n_reached"] == 3
    back = read_sunk_dataset(d).to_pandas().sort_values(
        "node").reset_index(drop=True)
    want = weighted_sssp(e, "a", mode=mode,
                         join_partitions=4).to_pandas()
    assert back.equals(want)
