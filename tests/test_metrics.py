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


def _linkpred_brute(src, dst, k):
    """Python brute force: cn for all non-adjacent pairs."""
    import itertools
    E = {(min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d}
    adj = {}
    for u, v in E:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    rows = []
    for u, v in itertools.combinations(sorted(adj), 2):
        if (u, v) in E:
            continue
        cn = len(adj[u] & adj[v])
        if cn > 0:
            rows.append((cn, u, v, len(adj[u]) * len(adj[v])))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    return [(u, v, cn, ps) for cn, u, v, ps in rows[:k]]


def test_link_prediction_matches_brute():
    from pagerank_ray.graph.linkpred import common_neighbor_candidates
    rng = np.random.default_rng(7)
    src = rng.integers(0, 40, 120)
    dst = rng.integers(0, 40, 120)
    got = common_neighbor_candidates(
        _edges(src, dst).repartition(4), k=15, join_partitions=4)
    want = _linkpred_brute(src, dst, 15)
    assert [(r["u"], r["v"], r["cn"], r["pa_score"])
            for r in got.to_pylist()] == want


def test_link_prediction_hand_checked_and_edge_cases():
    from pagerank_ray.graph.linkpred import common_neighbor_candidates
    # path graph 0-1-2-3: non-edges (0,2),(1,3) share 1 neighbor;
    # (0,3) shares none. Degrees: 0:1, 1:2, 2:2, 3:1.
    got = common_neighbor_candidates(
        _edges([0, 1, 2], [1, 2, 3]), k=10,
        join_partitions=2).to_pylist()
    assert got == [
        {"u": 0, "v": 2, "cn": 1, "pa_score": 1 * 2},
        {"u": 1, "v": 3, "cn": 1, "pa_score": 2 * 1}]
    # triangle: every pair adjacent -> no candidates
    got = common_neighbor_candidates(
        _edges([0, 1, 2], [1, 2, 0]), k=10,
        join_partitions=2).to_pylist()
    assert got == []
    # duplicate + reversed edges collapse; self-loops dropped
    got = common_neighbor_candidates(
        _edges([0, 1, 1, 2, 0, 3, 3],
               [1, 0, 2, 1, 0, 3, 1]), k=10,
        join_partitions=2).to_pylist()
    # simple graph: 0-1, 1-2, 1-3; pairs via center 1
    assert [(r["u"], r["v"], r["cn"]) for r in got] == \
        [(0, 2, 1), (0, 3, 1), (2, 3, 1)]


def test_two_hop_ball_sizes_matches_brute():
    from pagerank_ray.graph.linkpred import two_hop_ball_sizes
    rng = np.random.default_rng(11)
    src = rng.integers(0, 35, 90)
    dst = rng.integers(0, 35, 90)
    got = two_hop_ball_sizes(_edges(src, dst).repartition(4),
                             join_partitions=4).to_pylist()
    E = {(min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d}
    adj = {}
    for u, v in E:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = {}
    for u in adj:
        ball = {u} | adj[u]
        for w in adj[u]:
            ball |= adj[w]
        want[u] = len(ball)
    assert {r["node"]: r["ball2"] for r in got} == want
    assert [r["node"] for r in got] == sorted(want)  # sorted output


def test_two_hop_ball_path_graph():
    from pagerank_ray.graph.linkpred import two_hop_ball_sizes
    # path 0-1-2-3-4: balls are {0,1,2}=3, {0..3}=4, {0..4}=5, ...
    got = two_hop_ball_sizes(_edges([0, 1, 2, 3], [1, 2, 3, 4]),
                             join_partitions=2).to_pylist()
    assert [(r["node"], r["ball2"]) for r in got] == \
        [(0, 3), (1, 4), (2, 5), (3, 4), (4, 3)]


def test_degree_distribution_matches_duckdb():
    import duckdb

    from pagerank_ray.graph.metrics import degree_distribution
    from pagerank_ray.pipelines.events_graph import edges_from_events
    sf = "/root/testdata/sf0.001"
    for direction, key in (("out", "src"), ("in", "dst")):
        got = degree_distribution(edges_from_events(sf),
                                  direction=direction).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{sf}/events.parquet')")
        exp = con.execute(f"""
            WITH e AS (SELECT user_id AS src, next_user AS dst FROM
                 (SELECT user_id, lead(user_id) OVER
                    (PARTITION BY event_type ORDER BY ts, event_id)
                    AS next_user FROM events)
                 WHERE next_user IS NOT NULL),
            n AS (SELECT src AS node FROM e
                  UNION SELECT dst FROM e),
            deg AS (SELECT {key} AS node, COUNT(*) AS d
                    FROM e GROUP BY 1)
            SELECT COALESCE(deg.d, 0) AS degree,
                   COUNT(*) AS node_count
            FROM n LEFT JOIN deg USING (node)
            GROUP BY 1 ORDER BY 1""").df()
        assert got["degree"].tolist() == exp["degree"].tolist()
        assert got["node_count"].tolist() == exp["node_count"].tolist()


def test_degree_distribution_hand_checked():
    import ray.data as rd

    from pagerank_ray.graph.metrics import degree_distribution
    # 1->2, 1->2 (dup counts), 2->3; node 3 is dst-only (degree 0)
    E = rd.from_arrow(pa.table({
        "src": pa.array([1, 1, 2], pa.int64()),
        "dst": pa.array([2, 2, 3], pa.int64())}))
    got = degree_distribution(E, direction="out").to_pandas()
    assert dict(zip(got["degree"], got["node_count"])) == \
        {0: 1, 1: 1, 2: 1}
    assert got["degree"].tolist() == [0, 1, 2]
    empty = degree_distribution(rd.from_arrow(pa.table({
        "src": pa.array([], pa.int64()),
        "dst": pa.array([], pa.int64())}))).to_pandas()
    assert len(empty) == 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="direction"):
        degree_distribution(E, direction="sideways")


def test_modularity_stats_two_communities():
    import pyarrow as pa
    import ray.data as rd

    from pagerank_ray.graph.metrics import modularity_stats

    # two triangles bridged by one edge: communities A = {a,b,c},
    # B = {x,y,z}; directed edge list
    E = [("a", "b"), ("b", "c"), ("c", "a"),
         ("x", "y"), ("y", "z"), ("z", "x"),
         ("c", "x")]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in E], pa.string()),
        "dst": pa.array([e[1] for e in E], pa.string())}))
    labels = pa.table({
        "node": pa.array(list("abcxyz"), pa.string()),
        "community": pa.array(["A"] * 3 + ["B"] * 3, pa.string())})
    got = modularity_stats(edges, labels).to_pandas()
    # A: 3 internal directed edges -> 6 ends; degrees: each triangle
    # edge adds 2 ends, bridge adds 1 to c's side -> degree_sum 7
    assert got.values.tolist() == [["A", 6, 7], ["B", 6, 7]]
    # Q from the stats matches the textbook value for this graph
    two_m = got["degree_sum"].sum()
    q = sum(r.internal_ends / two_m - (r.degree_sum / two_m) ** 2
            for r in got.itertuples())
    assert abs(q - (12 / 14 - 2 * (7 / 14) ** 2)) < 1e-12


def test_modularity_stats_paths_agree_and_validate():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import pytest

    from pagerank_ray.graph.metrics import modularity_stats

    rng = np.random.default_rng(11)
    n, m = 30, 200
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    edges = rd.from_arrow(pa.table({
        "src": pa.array([f"n{i}" for i in src], pa.string()),
        "dst": pa.array([f"n{i}" for i in dst], pa.string())}))
    labels = pa.table({
        "node": pa.array([f"n{i}" for i in range(n)], pa.string()),
        "community": pa.array([f"c{i % 4}" for i in range(n)],
                              pa.string())})
    a = modularity_stats(edges, labels).to_pandas()
    b = modularity_stats(edges, labels,
                         broadcast_max_rows=0).to_pandas()
    assert a.equals(b)  # broadcast == partitioned-join path
    # totals: every endpoint counted once per direction
    assert a["degree_sum"].sum() == 2 * m
    # python brute
    lab = {f"n{i}": f"c{i % 4}" for i in range(n)}
    import collections
    deg = collections.Counter()
    inn = collections.Counter()
    for u, v in zip(src, dst):
        cu, cv = lab[f"n{u}"], lab[f"n{v}"]
        deg[cu] += 1
        deg[cv] += 1
        if cu == cv:
            inn[cu] += 2
    for r in a.itertuples():
        assert deg[r.community] == r.degree_sum
        assert inn[r.community] == r.internal_ends
    # missing endpoint -> loud failure on BOTH paths (the join path
    # would otherwise silently drop the unlabeled edges)
    with pytest.raises(Exception, match="cover every edge endpoint"):
        modularity_stats(edges, labels.slice(0, 5)).to_pandas()
    with pytest.raises(ValueError, match="cover every edge endpoint"):
        modularity_stats(edges, labels.slice(0, 5),
                         broadcast_max_rows=0)
