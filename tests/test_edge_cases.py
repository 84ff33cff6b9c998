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


def test_triangles_all_self_loops():
    rows = [("a", "a"), ("b", "b")]
    out = triangle_counts(from_arrow_edges(_edges(rows)))
    assert all(r["tri_count"] == 0 for r in out.to_pylist())


def test_rebuild_into_same_dir_no_stale_edges(tmp_path):
    """A rebuild with a filter must not merge the previous build's
    edge files (write_parquet adds uniquely-named files)."""
    from pagerank_ray.graph.build import read_meta

    rows = [("a", "h"), ("b", "h"), ("c", "h"), ("d", "h"),
            ("h", "a"), ("a", "b")]
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(_edges(rows)), gdir, num_parts=2)
    assert read_meta(gdir)["num_edges"] == 6
    build_graph(from_arrow_edges(_edges(rows)), gdir, num_parts=2,
                filter_ratio=0.5)
    assert read_meta(gdir)["num_edges"] == 2  # only (h,a) and (a,b)


def test_write_ranks_rewrites_on_different_content(tmp_path):
    import os

    import pyarrow.parquet as pq

    from pagerank_ray.graph.pagerank import write_ranks

    rows = [("a", "b"), ("b", "a")]
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(_edges(rows)), gdir, num_parts=2)
    r1 = pagerank(gdir, alpha=0.85)
    r2 = pagerank(gdir, alpha=0.5)
    out = str(tmp_path / "ranks")
    write_ranks(r1, out, num_partitions=2)
    write_ranks(r2, out, num_partitions=2)  # different content: rewrite
    files = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    got = pa.concat_tables([pq.read_table(os.path.join(out, f))
                            for f in files])
    assert sorted(got.column("rank").to_pylist()) == \
        sorted(r2.column("rank").to_pylist())


def test_knn_missing_query_raises():
    import pytest as _pytest

    from pagerank_ray.pipelines.similarity import knn_bruteforce
    t = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                              pa.list_(pa.float32())),
    })
    with _pytest.raises(ValueError, match="999"):
        knn_bruteforce(t, query_ids=[0, 999], k=1)


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


def test_triangles_partitioned_path_edge_cases():
    """The fully-partitioned triangles path must survive graphs that
    leave most join hash partitions EMPTY (the empty-schema-block
    trap): no triangles, and all-self-loops (empty wedge/closed
    datasets end-to-end)."""
    rows = [("a", "b"), ("b", "c"), ("c", "d")]
    out = triangle_counts(from_arrow_edges(_edges(rows)),
                          broadcast_threshold=0)
    assert sorted(r["node"] for r in out.to_pylist()) == \
        ["a", "b", "c", "d"]
    assert all(r["tri_count"] == 0 for r in out.to_pylist())

    rows = [("a", "a"), ("b", "b")]
    out = triangle_counts(from_arrow_edges(_edges(rows)),
                          broadcast_threshold=0)
    assert all(r["tri_count"] == 0 for r in out.to_pylist())


def test_partitioned_encode_sparse_key_spread(tmp_path):
    """Partitioned encode with join partitions far above the key
    spread (8 nodes, default cluster-sized partitions -> most hash
    partitions empty) must match the broadcast build exactly — the
    round-2 ADVICE race."""
    import pyarrow as pa

    from pagerank_ray.graph import build as gb
    from pagerank_ray.graph.build import load_nodes

    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "e"),
            ("e", "f"), ("g", "h")]
    ds = from_arrow_edges(_edges(rows))
    g_a = str(tmp_path / "bc")
    g_b = str(tmp_path / "pt")
    meta_a = gb.build_graph(ds, g_a, num_parts=4,
                            encode_mode="broadcast")
    # join_partitions: well above the 8-key spread (empty partitions
    # guaranteed) but sized so two chained 0.1-CPU aggregator pools
    # (2 x 10 x 0.1 = 2 CPUs) leave headroom for 1-CPU map tasks on
    # the 4-CPU test cluster — 32 here deadlocks (see stages/join.py)
    ds2 = from_arrow_edges(_edges(rows))
    meta_b = gb.build_graph(ds2, g_b, num_parts=4,
                            encode_mode="partitioned",
                            join_partitions=10)
    assert meta_a["n"] == meta_b["n"] == 8
    assert meta_a["num_edges"] == meta_b["num_edges"] == len(rows)
    na = load_nodes(g_a).sort_by("id").to_pylist()
    nb = load_nodes(g_b).sort_by("id").to_pylist()
    assert na == nb


def test_top_terms_empty_and_whitespace_docs():
    import pyarrow as pa
    import ray.data as rd

    from pagerank_ray.pipelines.textstats import top_terms

    docs = rd.from_arrow(pa.table({
        "text": pa.array(["", "   ", "\t\n"], pa.string())}))
    out = top_terms(docs, k=5).to_pandas()
    assert len(out) == 0


def test_bloom_empty_small_side_prunes_everything():
    import pyarrow as pa
    import ray.data as rd

    from pagerank_ray.stages.bloom import bloom_prune, build_bloom

    empty = rd.from_arrow(pa.table({"key": pa.array([], pa.int64())}))
    bloom = build_bloom(empty, "key", n_expected=0, fp_rate=0.01)
    big = rd.from_arrow(pa.table({"key": pa.array(range(100),
                                                  pa.int64())}))
    pruned = bloom_prune(big, bloom, "key", concurrency=(1, 2))
    assert pruned.count() == 0


def test_hash_join_empty_first_block_regression():
    """Pin the _sanitize null-sentinel assumption (stages/join.py):
    Ray's hash shuffle broadcasts typed empty shards only from the
    FIRST shuffle task of each side, and a zero-row first block
    consumes that broadcast silently. This test forces a zero-row
    first block on one side; if a Ray upgrade changes the scheduler
    behavior the sentinel relies on, this fails loudly instead of
    reopening the race in production joins."""
    import pyarrow as pa
    import ray.data as rd

    from pagerank_ray.stages.join import hash_join

    schema = pa.schema([("k", pa.int64()), ("v", pa.string())])
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "v": pa.array([], pa.string())})
    full = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                     "v": pa.array(["a", "b", "c"], pa.string())})
    # from_arrow with a list keeps one block per table, in order —
    # the empty block is the side's first shuffle task
    left = rd.from_arrow([empty, full])
    assert left.num_blocks() == 2
    right = rd.from_arrow(pa.table({
        "k2": pa.array([2, 3, 4], pa.int64()),
        "w": pa.array(["x", "y", "z"], pa.string()),
    }))
    out = hash_join(left, right, on=("k",), right_on=("k2",),
                    num_partitions=8, left_schema=schema)
    rows = sorted((r["k"], r["v"], r["w"]) for r in out.take_all())
    assert rows == [(2, "b", "x"), (3, "c", "y")]

    # and the symmetric case: zero-row first block on the RIGHT side
    right2 = rd.from_arrow([
        pa.table({"k2": pa.array([], pa.int64()),
                  "w": pa.array([], pa.string())}),
        pa.table({"k2": pa.array([2, 3, 4], pa.int64()),
                  "w": pa.array(["x", "y", "z"], pa.string())})])
    out2 = hash_join(rd.from_arrow(full), right2, on=("k",),
                     right_on=("k2",), num_partitions=8)
    rows2 = sorted((r["k"], r["v"], r["w"]) for r in out2.take_all())
    assert rows2 == rows
