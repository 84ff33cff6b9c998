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
