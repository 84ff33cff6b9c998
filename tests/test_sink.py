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


def test_sink_dataset_commit_marker(tmp_path):
    """sink_dataset commits _SUCCESS.json only after a complete write;
    read_sunk_dataset refuses an uncommitted dir (a crashed writer's
    partial file set must not read back as a result); rewriting wipes
    both the stale files and the stale marker first."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from pagerank_ray.graph.sink import (SUCCESS_MARKER,
                                         read_sunk_dataset,
                                         sink_dataset)

    out = str(tmp_path / "res")
    t1 = pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]})

    # uncommitted dir (simulates a crash mid-write): reader refuses
    os.makedirs(out)
    rd.from_arrow(t1).write_parquet(out)
    with pytest.raises(RuntimeError, match="did not complete"):
        read_sunk_dataset(out)

    sink_dataset(rd.from_arrow(t1), out)
    assert os.path.exists(os.path.join(out, SUCCESS_MARKER))
    got = read_sunk_dataset(out).to_pandas().sort_values("k") \
        .reset_index(drop=True)
    assert got["v"].tolist() == ["a", "b", "c"]

    # rewrite with different content: stale files + marker wiped, the
    # new result is exactly the new content (accepts a pa.Table too)
    t2 = pa.table({"k": [9], "v": ["z"]})
    sink_dataset(t2, out)
    got = read_sunk_dataset(out).to_pandas()
    assert got["k"].tolist() == [9] and got["v"].tolist() == ["z"]
    # plain read_parquet over the dir ignores the _-prefixed marker
    assert rd.read_parquet(out).count() == 1


def test_scc_empty_input_out_dir_contract(tmp_path):
    """scc_labels on an empty edge table honors the out_dir contract:
    stale parquet is wiped, a manifest + empty result is committed,
    and readback is an empty (id, node, label) table."""
    import pyarrow as pa

    from pagerank_ray.graph.scc import scc_labels
    from pagerank_ray.sources.edge_csv import from_arrow_edges

    empty = pa.table({"src": pa.array([], pa.string()),
                      "dst": pa.array([], pa.string())})
    out = str(tmp_path / "scc")
    os.makedirs(out)
    with open(os.path.join(out, "stale.parquet"), "wb") as f:
        f.write(b"junk")
    man = scc_labels(from_arrow_edges(empty), out_dir=out,
                     checkpoint_dir=str(tmp_path / "ckpt"))
    assert isinstance(man, dict) and man["kind"] == "label"
    assert not os.path.exists(os.path.join(out, "stale.parquet"))
    assert read_result_dataset(out).count() == 0
    import pyarrow.parquet as pq

    from pagerank_ray.graph.sink import result_files
    schema = pq.read_table(result_files(out)[0]).schema
    assert schema.names == ["id", "node", "label"]
