"""PageRank conformance: engine vs reference semantics (F1 golden + oracle)."""

import numpy as np
import pytest

from pagerank_ray.graph.build import build_graph
from pagerank_ray.graph.pagerank import PageRankRunner, pagerank
from pagerank_ray.sources.edge_csv import from_arrow_edges
from pagerank_ray.sources.synth import generate_corpus, small_graph_edges
from pagerank_ray.stages.extract import extract_edges_batch

from .oracle import pagerank_oracle

# FIXTURES.md F1 golden values (README.md:115-148, verified oracle)
GOLDEN_SMALL = {
    "4": 6.6270e-01, "6": 5.2179e-01, "5": 4.1434e-01,
    "2": 2.3175e-01, "3": 1.8590e-01, "1": 1.6917e-01,
}


def _edge_pairs(table):
    return list(zip(table.column("src").to_pylist(),
                    table.column("dst").to_pylist()))


def _rank_dict(result):
    return {r["node"]: r["rank"] for r in result.to_pylist()}


def test_small_graph_golden(tmp_path):
    edges = small_graph_edges()
    build_graph(from_arrow_edges(edges), str(tmp_path / "g"), num_parts=3)
    runner = PageRankRunner(str(tmp_path / "g"))
    try:
    # README.md:117-141 golden trace runs i=0..23 -> 24 iterations
        res = runner.run(alpha=0.85, epsilon=1e-6)
        assert runner.iterations_run == 24
    finally:
        runner.close()
    got = _rank_dict(res)
    assert set(got) == set(GOLDEN_SMALL)
    for node, want in GOLDEN_SMALL.items():
        assert got[node] == pytest.approx(want, abs=5e-5)
    # vs float64 oracle: allclose 1e-6 (the BASELINE.json bar)
    oracle, it = pagerank_oracle(_edge_pairs(edges))
    assert it == 24
    for node, want in oracle.items():
        assert got[node] == pytest.approx(want, abs=1e-6)


@pytest.mark.parametrize("num_parts", [1, 2, 5])
def test_partition_count_invariance(tmp_path, num_parts):
    """Ranks must not depend on the partition count (determinism)."""
    edges = small_graph_edges()
    gdir = str(tmp_path / f"g{num_parts}")
    build_graph(from_arrow_edges(edges), gdir, num_parts=num_parts)
    got = _rank_dict(pagerank(gdir))
    oracle, _ = pagerank_oracle(_edge_pairs(edges))
    for node, want in oracle.items():
        assert got[node] == pytest.approx(want, abs=1e-6)


def test_split_exchange_bit_identical(tmp_path):
    """exchange='split' (per-destination-worker objects, the
    multi-node data plane) must produce bit-identical ranks."""
    edges = small_graph_edges()
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=4)
    r1 = PageRankRunner(gdir, num_workers=2)
    try:
        a = r1.run(exchange="concat")
        it_a = r1.iterations_run
    finally:
        r1.close()
    r2 = PageRankRunner(gdir, num_workers=2)
    try:
        b = r2.run(exchange="split")
        it_b = r2.iterations_run
    finally:
        r2.close()
    assert it_a == it_b
    assert a.column("rank").to_pylist() == b.column("rank").to_pylist()


def test_corpus_pagerank_with_duplicates_and_dangling(tmp_path):
    """Synth corpus (dup imports, dangling refs, heavy menu file)."""
    table, expected = generate_corpus(num_repos=2, files_per_repo=18)
    edge_tbl = extract_edges_batch(table)
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edge_tbl), gdir, num_parts=4)
    runner = PageRankRunner(gdir)
    try:
        res = runner.run(alpha=0.85, epsilon=1e-6)
        iters = runner.iterations_run
    finally:
        runner.close()
    got = _rank_dict(res)
    oracle, it_oracle = pagerank_oracle(_edge_pairs(edge_tbl))
    assert iters == it_oracle
    assert set(got) == set(oracle)
    for node, want in oracle.items():
        assert got[node] == pytest.approx(want, abs=1e-6)


def test_pagerank_dataset_variant_matches_oracle():
    """Pure-Dataset rounds (SURVEY §7 step 3) match the oracle and the
    actor engine."""
    from pagerank_ray.graph.pagerank_dataset import pagerank_dataset

    edges = small_graph_edges()
    tbl, iters = pagerank_dataset(edges, alpha=0.85, epsilon=1e-6)
    got = {r["node"]: r["rank"] for r in tbl.to_pylist()}
    oracle, it_oracle = pagerank_oracle(_edge_pairs(edges))
    assert iters == it_oracle == 24
    for node, want in oracle.items():
        assert got[node] == pytest.approx(want, abs=1e-6)


def test_filter_ratio_and_alpha_sweep(tmp_path):
    """J2 + non-default alpha against the oracle on the corpus graph."""
    table, _ = generate_corpus(num_repos=2, files_per_repo=15)
    edge_tbl = extract_edges_batch(table)
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edge_tbl), gdir, num_parts=3,
                filter_ratio=0.3)
    got = _rank_dict(pagerank(gdir, alpha=0.95))
    oracle, _ = pagerank_oracle(_edge_pairs(edge_tbl), alpha=0.95,
                                filter_ratio=0.3)
    assert set(got) == set(oracle)
    for node, want in oracle.items():
        assert got[node] == pytest.approx(want, abs=1e-6)
