"""Distributed per-worker result sink (graph/sink.py): worker-written
partition files match the driver-collected tables, reruns skip
finished partitions, and different content wipes stale files."""

import os

from pagerank_ray.graph.build import build_graph
from pagerank_ray.graph.components import connected_components
from pagerank_ray.graph.pagerank import PageRankRunner
from pagerank_ray.graph.sink import read_result_dataset, result_files
from pagerank_ray.sources.edge_csv import from_arrow_edges
from pagerank_ray.sources.synth import (component_fixture_edges,
                                        small_graph_edges)


def _sorted_table(ds):
    import pyarrow as pa
    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    return t.sort_by([("id", "ascending")])


def test_write_ranks_distributed_matches_collect(tmp_path):
    edges = small_graph_edges()
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=4)
    r = PageRankRunner(gdir)
    try:
        collected = r.run(epsilon=1e-8)
        out = str(tmp_path / "ranks")
        man = r.write_ranks_distributed(out)
        assert sorted(man["partitions"]) == list(range(4))
    finally:
        r.close()   # release worker CPUs before the Dataset read
    got = _sorted_table(read_result_dataset(out))
    assert got.column_names == ["id", "node", "rank"]
    assert got.equals(collected)


def test_write_ranks_distributed_skips_finished_partitions(tmp_path):
    edges = small_graph_edges()
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=4)
    r = PageRankRunner(gdir)
    try:
        collected = r.run(epsilon=1e-8)
        out = str(tmp_path / "ranks")
        r.write_ranks_distributed(out)
        files = result_files(out)
        # simulate a partially-failed previous run: one partition lost
        os.remove(files[1])
        inodes_before = {f: os.stat(f).st_ino for f in files
                         if os.path.exists(f)}
        man2 = r.write_ranks_distributed(out)
        # untouched partitions kept (same inode — not rewritten),
        # missing one restored
        assert set(man2["skipped"]) == {0, 2, 3}
        for f, ino in inodes_before.items():
            assert os.stat(f).st_ino == ino
        assert os.path.exists(files[1])
    finally:
        r.close()
    assert _sorted_table(read_result_dataset(out)).equals(collected)


def test_write_ranks_distributed_wipes_different_content(tmp_path):
    edges = small_graph_edges()
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=4)
    out = str(tmp_path / "ranks")
    r = PageRankRunner(gdir)
    try:
        r.run(alpha=0.85, epsilon=1e-8)
        r.write_ranks_distributed(out)
    finally:
        r.close()
    r2 = PageRankRunner(gdir)
    try:
        collected = r2.run(alpha=0.5, epsilon=1e-8)  # different result
        man = r2.write_ranks_distributed(out)
        assert man["skipped"] == []          # fingerprint changed
    finally:
        r2.close()
    assert _sorted_table(read_result_dataset(out)).equals(collected)


def test_connected_components_distributed_sink(tmp_path):
    edges, _ = component_fixture_edges()
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=4,
                undirected=True)
    collected = connected_components(gdir)
    out = str(tmp_path / "labels")
    man = connected_components(gdir, out_dir=out)
    assert isinstance(man, dict) and man["kind"] == "label"
    got = _sorted_table(read_result_dataset(out))
    assert got.equals(collected)


def test_lpa_distributed_sink(tmp_path):
    from pagerank_ray.graph.labelprop import label_propagation

    edges, _ = component_fixture_edges()
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=3,
                undirected=True)
    collected = label_propagation(gdir, rounds=10)
    out = str(tmp_path / "labels")
    man = label_propagation(gdir, rounds=10, out_dir=out)
    assert isinstance(man, dict) and man["kind"] == "label"
    assert _sorted_table(read_result_dataset(out)).equals(collected)
