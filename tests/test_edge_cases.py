"""Robustness: self-loops, single node, tiny graphs, empty queries."""

import pyarrow as pa
import pytest

from pagerank_ray.graph.build import build_graph
from pagerank_ray.graph.components import connected_components
from pagerank_ray.graph.pagerank import PageRankRunner, pagerank
from pagerank_ray.graph.triangles import triangle_counts
from pagerank_ray.sources.edge_csv import from_arrow_edges

from .oracle import pagerank_oracle


def _edges(rows):
    return pa.table({"src": pa.array([r[0] for r in rows]),
                     "dst": pa.array([r[1] for r in rows])})


def test_self_loop_pagerank(tmp_path):
    rows = [("a", "a"), ("a", "b"), ("b", "a")]
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(_edges(rows)), gdir, num_parts=2)
    got = {r["node"]: r["rank"] for r in pagerank(gdir).to_pylist()}
    oracle, _ = pagerank_oracle(rows)
    for k, v in oracle.items():
        assert got[k] == pytest.approx(v, abs=1e-6)


def test_single_edge_graph(tmp_path):
    rows = [("x", "y")]
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(_edges(rows)), gdir, num_parts=4)
    got = {r["node"]: r["rank"] for r in pagerank(gdir).to_pylist()}
    oracle, _ = pagerank_oracle(rows)
    assert set(got) == {"x", "y"}
    for k, v in oracle.items():
        assert got[k] == pytest.approx(v, abs=1e-6)
    assert got["y"] > got["x"]  # y receives x's mass


def test_all_dangling_except_one(tmp_path):
    rows = [("h", "a"), ("h", "b"), ("h", "c")]
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(_edges(rows)), gdir, num_parts=2)
    got = {r["node"]: r["rank"] for r in pagerank(gdir).to_pylist()}
    oracle, _ = pagerank_oracle(rows)
    for k, v in oracle.items():
        assert got[k] == pytest.approx(v, abs=1e-6)


def test_cc_isolated_selfloop(tmp_path):
    rows = [("a", "a"), ("b", "c")]
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(_edges(rows)), gdir, num_parts=2,
                undirected=True)
    got = {r["node"]: r["label"]
           for r in connected_components(gdir).to_pylist()}
    # a alone; b-c together
    assert got["a"] != got["b"]
    assert got["b"] == got["c"]


def test_triangles_no_triangles():
    rows = [("a", "b"), ("b", "c"), ("c", "d")]
    out = triangle_counts(from_arrow_edges(_edges(rows)))
    assert all(r["tri_count"] == 0 for r in out.to_pylist())


def test_more_workers_than_shards(tmp_path):
    """num_workers > P must not break (groups cap at P)."""
    rows = [("a", "b"), ("b", "a")]
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(_edges(rows)), gdir, num_parts=2)
    r = PageRankRunner(gdir, num_workers=2)  # P=2, session has 4 cpus
    try:
        t = r.run()
        assert t.num_rows == 2
    finally:
        r.close()
