"""Ingest stages: M1 url filter, M2 dictionary encode, J2 in-link filter."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from pagerank_ray.sources.edge_csv import from_arrow_edges
from pagerank_ray.stages.encode import (distinct_nodes, encode_edges,
                                        nodes_table)
from pagerank_ray.stages.filters import (inlink_ratio_filter, url_filter,
                                         url_filter_batch)


def _edges(rows):
    return pa.table({"src": [r[0] for r in rows],
                     "dst": [r[1] for r in rows]})


def test_url_filter_truth_table():
    # FIXTURES.md F3 truth table (pagerank.py:42-45)
    keep_rows = [("www.x.com/topics", "1"), ("1", "2"), ("a/b", "c/d")]
    drop_rows = [("www.x.com/", "1"), ("1", "www.x.com/"),
                 ("www.x.com/topic/interrogation", "1"), ("a/b/c", "d")]
    t = _edges(keep_rows + drop_rows)
    out = url_filter_batch(t)
    got = list(zip(out.column("src").to_pylist(),
                   out.column("dst").to_pylist()))
    assert got == keep_rows


def test_distinct_nodes_sorted_and_encode():
    rows = [("b", "a"), ("c", "a"), ("a", "b"), ("b", "a")]
    ds = from_arrow_edges(_edges(rows))
    names = distinct_nodes(ds)
    assert names.to_pylist() == ["a", "b", "c"]
    enc = encode_edges(ds, names).take_all()
    pairs = sorted((r["src_id"], r["dst_id"]) for r in enc)
    assert pairs == [(0, 1), (1, 0), (1, 0), (2, 0)]
    nt = nodes_table(names)
    assert nt.column("id").to_pylist() == [0, 1, 2]


def test_partitioned_encode_matches_broadcast(tmp_path):
    """The scale encode path (Dataset-native dictionary, never collected
    to the driver: distinct -> sorted-offset id assignment -> two hash
    joins) must produce the exact same graph as the broadcast path."""
    import pyarrow.parquet as pq
    from pagerank_ray.graph import build as gb
    from pagerank_ray.stages.encode import (assign_ids_sorted,
                                            distinct_nodes_dataset,
                                            encode_edges_partitioned)

    rng = np.random.default_rng(7)
    src = rng.integers(0, 200, 3000)
    dst = rng.integers(0, 200, 3000)
    t = pa.table({"src": [f"n{int(s):03d}" for s in src],
                  "dst": [f"n{int(d):03d}" for d in dst]})
    ds = from_arrow_edges(t)

    # unit level: ids are dense 0..n-1 in sorted-name order
    nodes = assign_ids_sorted(distinct_nodes_dataset(ds)).take_all()
    nodes.sort(key=lambda r: r["id"])
    assert [r["id"] for r in nodes] == list(range(len(nodes)))
    assert [r["node"] for r in nodes] == sorted(r["node"] for r in nodes)

    enc2 = encode_edges_partitioned(ds, rd.from_items(nodes)).take_all()
    name_to_id = {r["node"]: r["id"] for r in nodes}
    expect = sorted((name_to_id[s], name_to_id[d]) for s, d in
                    zip(t.column("src").to_pylist(),
                        t.column("dst").to_pylist()))
    assert sorted((r["src_id"], r["dst_id"]) for r in enc2) == expect

    # end to end: both build paths produce identical on-disk graphs
    g_b = str(tmp_path / "g_broadcast")
    g_p = str(tmp_path / "g_partitioned")
    meta_b = gb.build_graph(ds, g_b, num_parts=4, encode_mode="broadcast")
    meta_p = gb.build_graph(ds, g_p, num_parts=4,
                            encode_mode="partitioned")
    assert meta_b["n"] == meta_p["n"]
    assert meta_b["num_edges"] == meta_p["num_edges"]
    for part in range(4):
        sb, db = gb.load_part_edges(g_b, part)
        sp, dp = gb.load_part_edges(g_p, part)
        assert (sorted(zip(sb.tolist(), db.tolist()))
                == sorted(zip(sp.tolist(), dp.tolist())))
        assert (gb.load_part_names(g_b, part, 4).tolist()
                == gb.load_part_names(g_p, part, 4).tolist())
    # the partitioned nodes layout exists and the legacy file does not
    assert (tmp_path / "g_partitioned" / "nodes" / "part=0").is_dir()
    assert not (tmp_path / "g_partitioned" / "nodes.parquet").exists()
    # legacy single-file layout is still readable
    legacy = tmp_path / "g_legacy"
    legacy.mkdir()
    pq.write_table(pa.table({"node": ["a", "b", "c", "d"],
                             "id": [0, 1, 2, 3]}),
                   str(legacy / "nodes.parquet"))
    assert gb.load_part_names(str(legacy), 1, 2).tolist() == ["b", "d"]
    assert gb.load_nodes(str(legacy)).num_rows == 4


def test_inlink_ratio_filter_semantics():
    # heavy target "h" receives 4 in-links; n = 6 nodes total
    # ratio 0.5 -> threshold 3: edges into h dropped, node h remains a
    # node (it still appears as a source), per pagerank.py:51-57.
    rows = [("a", "h"), ("b", "h"), ("c", "h"), ("d", "h"),
            ("h", "a"), ("a", "b")]
    ds = from_arrow_edges(_edges(rows))
    n = 6
    out = inlink_ratio_filter(ds, 0.5, n).take_all()
    got = sorted((r["src"], r["dst"]) for r in out)
    assert got == [("a", "b"), ("h", "a")]
    # ratio high enough keeps everything
    out2 = inlink_ratio_filter(ds, 0.9, n).take_all()
    assert len(out2) == 6
    # ratio None is a no-op
    out3 = inlink_ratio_filter(ds, None, n).take_all()
    assert len(out3) == 6
