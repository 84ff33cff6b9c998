"""M4 predicate truth table (F4), expansion, boost, search, personalization."""

import numpy as np
import pyarrow as pa
import pytest

from pagerank_ray.functions.query import (SynonymExpander, parse_terms,
                                          satisfies_query_batch,
                                          synonym_boost_batch,
                                          url_satisfies_query)
from pagerank_ray.graph.build import build_graph
from pagerank_ray.graph.pagerank import pagerank
from pagerank_ray.pipelines.search import (format_results, search,
                                           search_boosted)
from pagerank_ray.sources.edge_csv import from_arrow_edges
from pagerank_ray.sources.synth import small_graph_edges

from .oracle import pagerank_oracle

URL = "www.lawfareblog.com/covid-19-speech"

# FIXTURES.md F4 — the reference doctest truth table (pagerank.py:203-218)
TRUTH = [
    ("covid", True),
    ("coronavirus covid", True),
    ("coronavirus", False),
    ("covid -speech", False),
    ("covid -corona", True),
    ("-speech", False),
    ("-corona", True),
    ("", True),
]


@pytest.mark.parametrize("query,expect", TRUTH)
def test_predicate_truth_table(query, expect):
    assert url_satisfies_query(URL, query) is expect


@pytest.mark.parametrize("query,expect", TRUTH)
def test_vectorized_predicate_matches_scalar(query, expect):
    arr = pa.array([URL, "www.other.com/nothing"])
    got = satisfies_query_batch(arr, query).to_pylist()
    assert got[0] is expect
    assert got[1] is url_satisfies_query("www.other.com/nothing", query)


def test_expansion_changes_predicate():
    ex = SynonymExpander()
    extra = ex.expand_terms("covid")
    assert "coronavirus" in extra
    # 'coronavirus' alone fails, but expanded 'covid' query matched via
    # the synonym on a coronavirus-only url
    url = "www.x.com/coronavirus-law"
    assert url_satisfies_query(url, "covid") is False
    assert url_satisfies_query(url, "covid", extra) is True


def test_parse_terms():
    assert parse_terms("a -b c -d") == (["a", "c"], ["b", "d"])


def test_search_and_boost(tmp_path):
    edges = small_graph_edges()
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=2)
    ranks = pagerank(gdir)

    top = search(ranks, "", max_results=3)
    assert top.column("node").to_pylist() == ["4", "6", "5"]
    lines = format_results(top)
    assert lines[0].startswith("rank=0 pagerank=6.627") and \
        lines[0].endswith("url=4")

    # query filter: only nodes containing "4"
    top4 = search(ranks, "4", max_results=10, expand=False)
    assert top4.column("node").to_pylist() == ["4"]

    # negation drops everything containing 5
    topn = search(ranks, "-5", max_results=10, expand=False)
    assert "5" not in topn.column("node").to_pylist()

    # boost with a synonym table targeting node names
    ex = SynonymExpander({"four": [("4", 0.9)]})
    boosted = search_boosted(ranks, "four", max_results=10, expander=ex,
                             s_weight=0.03, power=2)
    # "four" matches nothing, but its synonym "4" matches node 4 via
    # the expanded final filter; its rank gains the boost
    assert boosted.column("node").to_pylist() == ["4"]
    base = {r["node"]: r["rank"] for r in ranks.to_pylist()}
    want = base["4"] + 1 * (0.9 ** 2)  # new_n=1, w_weight=sim^power
    assert boosted.column("rank").to_pylist()[0] == pytest.approx(want)


def test_personalized_pagerank_matches_oracle(tmp_path):
    edges = small_graph_edges()
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=3)
    # personalize on nodes containing "4" or "5"
    pred = lambda nm: url_satisfies_query(nm, "4 5")  # noqa: E731
    got = {r["node"]: r["rank"]
           for r in pagerank(gdir, v_indicator=pred).to_pylist()}
    pairs = list(zip(edges.column("src").to_pylist(),
                     edges.column("dst").to_pylist()))
    oracle, _ = pagerank_oracle(pairs, v_indicator=pred)
    for node, want in oracle.items():
        assert got[node] == pytest.approx(want, abs=1e-6)
