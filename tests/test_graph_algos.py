"""CC / LPA / triangles vs exact oracles (FIXTURES.md F5) + resume (F7)."""

import numpy as np
import pytest

from pagerank_ray.graph.build import build_graph
from pagerank_ray.graph.components import connected_components
from pagerank_ray.graph.labelprop import label_propagation
from pagerank_ray.graph.pagerank import PageRankRunner
from pagerank_ray.graph.triangles import triangle_counts
from pagerank_ray.sources.edge_csv import from_arrow_edges
from pagerank_ray.sources.synth import (component_fixture_edges,
                                        generate_corpus, small_graph_edges)
from pagerank_ray.stages.extract import extract_edges_batch

from .oracle import (connected_components_oracle, lpa_oracle,
                     pagerank_oracle, triangles_oracle)


def _pairs(table):
    return list(zip(table.column("src").to_pylist(),
                    table.column("dst").to_pylist()))


def test_connected_components_exact(tmp_path):
    edges, n_comp = component_fixture_edges()
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=4, undirected=True)
    res = connected_components(gdir)
    got = {r["node"]: r["label"] for r in res.to_pylist()}
    want = connected_components_oracle(_pairs(edges))
    assert got == want
    assert len(set(got.values())) == n_comp


def test_connected_components_small_graph(tmp_path):
    edges = small_graph_edges()
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=2, undirected=True)
    res = connected_components(gdir)
    got = {r["node"]: r["label"] for r in res.to_pylist()}
    want = connected_components_oracle(_pairs(edges))
    assert got == want
    assert len(set(got.values())) == 1  # small graph is one component


def test_cc_split_exchange_matches_concat(tmp_path):
    """Split (per-destination-segment) CC exchange returns the exact
    same labels as the concat exchange — min-combine is commutative."""
    edges, _ = component_fixture_edges()
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=4,
                undirected=True)
    a = connected_components(gdir, exchange="concat")
    b = connected_components(gdir, exchange="split")
    assert a.to_pylist() == b.to_pylist()
    # also exact vs oracle through the split path
    got = {r["node"]: r["label"] for r in b.to_pylist()}
    assert got == connected_components_oracle(_pairs(edges))


def test_label_propagation_exact(tmp_path):
    edges, _ = component_fixture_edges()
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=3, undirected=True)
    res = label_propagation(gdir, rounds=10)
    got = {r["node"]: r["label"] for r in res.to_pylist()}
    want = lpa_oracle(_pairs(edges), rounds=10)
    assert got == want
    # cliques collapse to a single community each
    k4 = {got[str(i)] for i in range(4)}
    k5 = {got[str(i)] for i in range(10, 15)}
    assert len(k4) == 1 and len(k5) == 1


def test_triangles_exact():
    edges, _ = component_fixture_edges()
    res = triangle_counts(from_arrow_edges(edges))
    got = {r["node"]: r["tri_count"] for r in res.to_pylist()}
    want = triangles_oracle(_pairs(edges))
    assert got == want
    # K4 -> 3 per vertex, K5 -> 6 per vertex, chain -> 0
    assert got["0"] == 3 and got["10"] == 6 and got["20"] == 0


def test_triangles_random_graph_heterogeneous_degrees():
    """Dense random graph where (deg,id) order != id order — regression
    for wedge-pair ordering vs orientation order."""
    import pyarrow as pa
    rng = np.random.RandomState(3)
    n, m = 30, 200
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    t = pa.table({"src": pa.array([str(x) for x in src]),
                  "dst": pa.array([str(x) for x in dst])})
    res = triangle_counts(from_arrow_edges(t))
    got = {r["node"]: r["tri_count"] for r in res.to_pylist()}
    want = triangles_oracle(list(zip([str(x) for x in src],
                                     [str(x) for x in dst])))
    assert got == want


def test_triangles_duplicate_edges_deduped():
    import pyarrow as pa
    rows = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "c")]
    t = pa.table({"src": [r[0] for r in rows], "dst": [r[1] for r in rows]})
    res = triangle_counts(from_arrow_edges(t))
    got = {r["node"]: r["tri_count"] for r in res.to_pylist()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_triangles_partitioned_join_path_matches_broadcast():
    """broadcast_threshold=0 forces the scale path (union + groupby
    hash join); results must match the broadcast fast path exactly."""
    edges, _ = component_fixture_edges()
    fast = triangle_counts(from_arrow_edges(edges))
    slow = triangle_counts(from_arrow_edges(edges), broadcast_threshold=0)
    assert fast.to_pylist() == slow.to_pylist()

    # dense random graph: (deg,id) order != id order, so a wedge
    # self-join with the wrong pair orientation would undercount
    import pyarrow as pa
    rng = np.random.RandomState(5)
    n, m = 30, 250
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    t = pa.table({"src": pa.array([str(x) for x in src]),
                  "dst": pa.array([str(x) for x in dst])})
    fast2 = triangle_counts(from_arrow_edges(t))
    slow2 = triangle_counts(from_arrow_edges(t), broadcast_threshold=0)
    assert fast2.to_pylist() == slow2.to_pylist()


def test_pagerank_checkpoint_resume_bit_identical(tmp_path):
    """F7: kill after k iterations, resume, bit-identical final ranks."""
    table, _ = generate_corpus(num_repos=2, files_per_repo=15)
    edge_tbl = extract_edges_batch(table)
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edge_tbl), gdir, num_parts=3)

    r1 = PageRankRunner(gdir)
    try:
        full = r1.run(alpha=0.85, epsilon=1e-6)
        full_iters = r1.iterations_run
    finally:
        r1.close()

    ck = str(tmp_path / "ck")
    r2 = PageRankRunner(gdir)
    try:
        r2.run(alpha=0.85, epsilon=1e-6, checkpoint_dir=ck,
               checkpoint_every=2, stop_after=5)
        assert r2.iterations_run == 5
    finally:
        r2.close()

    r3 = PageRankRunner(gdir)
    try:
        resumed = r3.run(alpha=0.85, epsilon=1e-6, checkpoint_dir=ck,
                         resume=True)
        assert r3.iterations_run == full_iters
    finally:
        r3.close()

    a = {r["node"]: r["rank"] for r in full.to_pylist()}
    b = {r["node"]: r["rank"] for r in resumed.to_pylist()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k]  # BIT-identical, not just close


def test_resume_on_different_worker_count(tmp_path):
    """Checkpoints are per-SHARD: a run checkpointed with 2 workers
    resumes on 3 workers (different cluster size) to the same ranks
    within float round-off (reduction grouping changes)."""
    import pytest

    table, _ = generate_corpus(num_repos=2, files_per_repo=15)
    edge_tbl = extract_edges_batch(table)
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edge_tbl), gdir, num_parts=6)

    r0 = PageRankRunner(gdir, num_workers=2)
    try:
        full = {r["node"]: r["rank"] for r in r0.run().to_pylist()}
    finally:
        r0.close()

    ck = str(tmp_path / "ck")
    r1 = PageRankRunner(gdir, num_workers=2)
    try:
        r1.run(checkpoint_dir=ck, checkpoint_every=2, stop_after=4)
    finally:
        r1.close()
    r2 = PageRankRunner(gdir, num_workers=3)
    try:
        resumed = {r["node"]: r["rank"]
                   for r in r2.run(checkpoint_dir=ck,
                                   resume=True).to_pylist()}
    finally:
        r2.close()
    assert full.keys() == resumed.keys()
    for k in full:
        assert resumed[k] == pytest.approx(full[k], abs=1e-9)


def test_actor_death_recovery(tmp_path):
    """max_restarts: kill a worker mid-run; the pool rebuilds (shards
    reload from parquet) and resumes from the last checkpoint to the
    same final ranks as an uninterrupted run."""
    import ray

    table, _ = generate_corpus(num_repos=2, files_per_repo=15)
    edge_tbl = extract_edges_batch(table)
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edge_tbl), gdir, num_parts=4)

    r0 = PageRankRunner(gdir, num_workers=2)
    try:
        full = {r["node"]: r["rank"] for r in r0.run().to_pylist()}
    finally:
        r0.close()

    ck = str(tmp_path / "ck")
    r = PageRankRunner(gdir, num_workers=2)
    try:
        r.run(checkpoint_dir=ck, checkpoint_every=2, stop_after=4)
        ray.kill(r.workers[0])  # simulate node/actor failure
        got = r.run(checkpoint_dir=ck, checkpoint_every=2, resume=True,
                    max_restarts=1)
        recovered = {x["node"]: x["rank"] for x in got.to_pylist()}
    finally:
        r.close()
    assert recovered.keys() == full.keys()
    import pytest as _pytest
    for k in full:
        assert recovered[k] == _pytest.approx(full[k], abs=1e-12)


def test_write_ranks_resumable(tmp_path):
    from pagerank_ray.graph.pagerank import write_ranks
    import pyarrow.parquet as pq
    import os

    edges = small_graph_edges()
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=2)
    r = PageRankRunner(gdir)
    try:
        ranks = r.run()
    finally:
        r.close()
    out = str(tmp_path / "ranks")
    write_ranks(ranks, out, num_partitions=3)
    files = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert len(files) == 3
    # second write skips existing partitions (mtime unchanged)
    before = [os.path.getmtime(os.path.join(out, f)) for f in files]
    write_ranks(ranks, out, num_partitions=3)
    after = [os.path.getmtime(os.path.join(out, f)) for f in files]
    assert before == after
    total = sum(pq.read_table(os.path.join(out, f)).num_rows
                for f in files)
    assert total == ranks.num_rows
    # SAME ranks at a DIFFERENT partition count is a different layout:
    # stale higher-numbered files must be wiped, not merged (the
    # fingerprint covers row and partition counts, not just values)
    write_ranks(ranks, out, num_partitions=2)
    files2 = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert len(files2) == 2
    total2 = sum(pq.read_table(os.path.join(out, f)).num_rows
                 for f in files2)
    assert total2 == ranks.num_rows


def test_cc_checkpoint_resume_exact(tmp_path):
    """CC stopped mid-convergence resumes from the per-shard
    checkpoint to EXACTLY the straight-run labels (min-label
    propagation is idempotent, so the continuation is exact)."""
    edges, _ = component_fixture_edges()
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=4,
                undirected=True)
    want = connected_components(gdir)

    ckpt = str(tmp_path / "ckpt")
    stopped = connected_components(gdir, checkpoint_dir=ckpt,
                                   stop_after=2)
    assert stopped is None                     # did not converge yet
    from pagerank_ray.graph.components import load_labels_manifest
    man = load_labels_manifest(ckpt)
    assert man["round"] == 2 and not man["converged"]

    got = connected_components(gdir, checkpoint_dir=ckpt, resume=True)
    assert got.to_pylist() == want.to_pylist()
    assert load_labels_manifest(ckpt)["converged"]


def test_cc_resume_on_different_worker_count(tmp_path):
    """Checkpoints key on SHARDS: a run stopped at worker count A
    resumes on a different count and still lands on exact labels."""
    edges, _ = component_fixture_edges()
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=4,
                undirected=True)
    want = connected_components(gdir)
    ckpt = str(tmp_path / "ckpt")
    assert connected_components(gdir, num_workers=4,
                                checkpoint_dir=ckpt,
                                stop_after=2) is None
    got = connected_components(gdir, num_workers=2,
                               checkpoint_dir=ckpt, resume=True)
    assert got.to_pylist() == want.to_pylist()


def test_lpa_checkpoint_resume_exact(tmp_path):
    """LPA is a FIXED-round algorithm: a resumed run executes exactly
    the remaining rounds and matches the straight 10-round labels."""
    edges, _ = component_fixture_edges()
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=3,
                undirected=True)
    want = label_propagation(gdir, rounds=10)
    ckpt = str(tmp_path / "ckpt")
    assert label_propagation(gdir, rounds=10, checkpoint_dir=ckpt,
                             stop_after=4) is None
    from pagerank_ray.graph.components import load_labels_manifest
    assert load_labels_manifest(ckpt)["round"] == 4
    got = label_propagation(gdir, rounds=10, checkpoint_dir=ckpt,
                            resume=True)
    assert got.to_pylist() == want.to_pylist()


def test_bfs_distances_exact(tmp_path):
    """BFS hop distances == plain-python BFS; unreached components
    excluded; seed resolution by name."""
    from pagerank_ray.graph.bfs import bfs_distances

    from .oracle import bfs_oracle

    edges, n_comp = component_fixture_edges()
    assert n_comp > 1           # unreached nodes exist
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=4,
                undirected=True)
    seed = min(edges.column("src").to_pylist())
    res = bfs_distances(gdir, seed_nodes=[seed])
    got = {r["node"]: r["dist"] for r in res.to_pylist()}
    want = bfs_oracle(_pairs(edges), [seed])
    assert got == want
    # a node outside the seed's component is absent
    all_nodes = {u for e in _pairs(edges) for u in e}
    assert set(got) < all_nodes


def test_bfs_directed_and_split_exchange(tmp_path):
    """Directed distances differ from undirected where edges only
    point away; split exchange returns identical distances."""
    from pagerank_ray.graph.bfs import bfs_distances

    from .oracle import bfs_oracle

    edges = small_graph_edges()
    gdir = str(tmp_path / "gd")
    build_graph(from_arrow_edges(edges), gdir, num_parts=3)  # directed
    seed = min(edges.column("src").to_pylist())
    res = bfs_distances(gdir, seed_nodes=[seed])
    got = {r["node"]: r["dist"] for r in res.to_pylist()}
    assert got == bfs_oracle(_pairs(edges), [seed], undirected=False)
    b = bfs_distances(gdir, seed_nodes=[seed], exchange="split")
    assert b.to_pylist() == res.to_pylist()


def test_bfs_checkpoint_resume_exact(tmp_path):
    from pagerank_ray.graph.bfs import bfs_distances

    edges, _ = component_fixture_edges()
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=4,
                undirected=True)
    seed = min(edges.column("src").to_pylist())
    want = bfs_distances(gdir, seed_nodes=[seed])
    ckpt = str(tmp_path / "ckpt")
    assert bfs_distances(gdir, seed_nodes=[seed], checkpoint_dir=ckpt,
                         stop_after=1) is None
    got = bfs_distances(gdir, seed_nodes=[seed], checkpoint_dir=ckpt,
                        resume=True)
    assert got.to_pylist() == want.to_pylist()
    # a mismatched seed set refuses to resume
    import pytest as _pytest
    other = sorted({u for e in _pairs(edges) for u in e})[-1]
    with _pytest.raises(ValueError, match="checkpoint mismatch"):
        bfs_distances(gdir, seed_nodes=[other], checkpoint_dir=ckpt,
                      resume=True)


def test_kcore_exact_vs_peeling_oracle(tmp_path):
    from pagerank_ray.graph.kcore import kcore_members

    from .oracle import kcore_oracle

    edges, _ = component_fixture_edges()
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=4,
                undirected=True)
    for k in (1, 2, 3, 4):
        res = kcore_members(gdir, k=k)
        got = {r["node"]: r["core_deg"] for r in res.to_pylist()}
        assert got == kcore_oracle(_pairs(edges), k), f"k={k}"
    # partition-count invariance
    gdir2 = str(tmp_path / "g2")
    build_graph(from_arrow_edges(edges), gdir2, num_parts=2,
                undirected=True)
    a = kcore_members(gdir, k=2).to_pylist()
    b = kcore_members(gdir2, k=2).to_pylist()
    assert a == b


def test_kcore_random_multigraph(tmp_path):
    """Random graph with duplicate edges and self-loops — the
    multigraph degree convention must match the oracle exactly."""
    import numpy as np
    import pyarrow as pa

    from pagerank_ray.graph.kcore import kcore_members

    from .oracle import kcore_oracle

    rng = np.random.RandomState(11)
    src = rng.randint(0, 30, 300).astype(str)
    dst = rng.randint(0, 30, 300).astype(str)  # self-loops likely
    edges = pa.table({"src": pa.array(src.astype(object), pa.string()),
                      "dst": pa.array(dst.astype(object), pa.string())})
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=3,
                undirected=True)
    for k in (3, 10, 25):
        res = kcore_members(gdir, k=k)
        got = {r["node"]: r["core_deg"] for r in res.to_pylist()}
        assert got == kcore_oracle(_pairs(edges), k), f"k={k}"


def test_scc_exact_random_directed():
    import numpy as np
    import pyarrow as pa

    from pagerank_ray.graph.scc import scc_labels

    from .oracle import scc_oracle

    rng = np.random.RandomState(13)
    src = rng.randint(0, 40, 200).astype(str)
    dst = rng.randint(0, 40, 200).astype(str)
    edges = pa.table({"src": pa.array(src.astype(object), pa.string()),
                      "dst": pa.array(dst.astype(object), pa.string())})
    res = scc_labels(edges, num_parts=3)
    got = {r["node"]: r["root"] for r in res.to_pylist()}
    assert got == scc_oracle(_pairs(edges))


def test_scc_chain_of_cycles():
    """Two 3-cycles joined by one directed bridge + a tail: three
    multi-node levels forces multiple pivot-min rounds."""
    import pyarrow as pa

    from pagerank_ray.graph.scc import scc_labels

    from .oracle import scc_oracle

    pairs = [("a", "b"), ("b", "c"), ("c", "a"),      # cycle 1
             ("c", "x"),                              # bridge
             ("x", "y"), ("y", "z"), ("z", "x"),      # cycle 2
             ("z", "t")]                              # tail singleton
    edges = pa.table({
        "src": pa.array([p[0] for p in pairs], pa.string()),
        "dst": pa.array([p[1] for p in pairs], pa.string())})
    res = scc_labels(edges, num_parts=2)
    got = {r["node"]: r["root"] for r in res.to_pylist()}
    want = scc_oracle(pairs)
    assert got == want
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["x"] == got["y"] == got["z"] == "x"
    assert got["t"] == "t"


def test_triangles_return_degrees_both_paths():
    """return_degrees emits simple-graph distinct-neighbor degrees,
    identical across broadcast and partitioned paths and vs a naive
    set-based count (self-loops excluded)."""
    edges, _ = component_fixture_edges()
    tri_f, deg_f = triangle_counts(from_arrow_edges(edges),
                                   return_degrees=True)
    tri_p, deg_p = triangle_counts(from_arrow_edges(edges),
                                   broadcast_threshold=0,
                                   return_degrees=True)
    assert tri_f.to_pylist() == tri_p.to_pylist()
    assert deg_f.to_pylist() == deg_p.to_pylist()
    nbrs = {}
    for s, d in _pairs(edges):
        if s == d:
            continue
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    want = {n: len(v) for n, v in nbrs.items()}
    got = {r["node"]: r["deg"] for r in deg_f.to_pylist()}
    for n, d in want.items():
        assert got[n] == d


def test_kcore_split_exchange_matches_concat(tmp_path):
    """Split (per-destination-segment) k-core decrements return the
    exact same membership as the concat exchange — sum-combine is
    commutative — across different worker counts."""
    import pyarrow as pa

    from pagerank_ray.graph.kcore import kcore_members

    from .oracle import kcore_oracle

    rng = np.random.RandomState(23)
    src = rng.randint(0, 50, 400).astype(str)
    dst = rng.randint(0, 50, 400).astype(str)
    edges = pa.table({"src": pa.array(src.astype(object), pa.string()),
                      "dst": pa.array(dst.astype(object), pa.string())})
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=4,
                undirected=True)
    a = kcore_members(gdir, k=3, exchange="concat")
    b = kcore_members(gdir, k=3, exchange="split")
    c = kcore_members(gdir, k=3, exchange="split", num_workers=2)
    assert a.to_pylist() == b.to_pylist() == c.to_pylist()
    got = {r["node"]: r["core_deg"] for r in b.to_pylist()}
    assert got == kcore_oracle(_pairs(edges), 3)


def test_scc_checkpoint_resume_and_sink(tmp_path):
    """Kill-at-outer-round-k -> resume (on a DIFFERENT worker count)
    -> identical roots; out_dir sink readback equals the collected
    table; resume without checkpoint_dir is rejected."""
    import pyarrow as pa

    from pagerank_ray.graph.scc import scc_labels
    from pagerank_ray.graph.sink import read_result_dataset

    from .oracle import scc_oracle

    # a CHAIN of 3-cycles (lexicographically increasing names):
    # pivot-min resolves exactly one cycle level per outer round and
    # the trim phase cannot peel cycles, so stop_after=1 genuinely
    # stops mid-run (a random graph's singleton tail now trims away
    # before the first pivot round)
    pairs = []
    tags = ["a", "b", "c", "d"]
    for i, tag in enumerate(tags):
        pairs += [(f"{tag}0", f"{tag}1"), (f"{tag}1", f"{tag}2"),
                  (f"{tag}2", f"{tag}0")]
        if i + 1 < len(tags):
            pairs.append((f"{tag}2", f"{tags[i + 1]}0"))
    edges = pa.table({
        "src": pa.array([p[0] for p in pairs], pa.string()),
        "dst": pa.array([p[1] for p in pairs], pa.string())})
    want = scc_oracle(_pairs(edges))

    ck = str(tmp_path / "ck")
    stopped = scc_labels(edges, num_parts=3, checkpoint_dir=ck,
                         stop_after=1, num_workers=3)
    assert stopped is None
    res = scc_labels(edges, num_parts=3, checkpoint_dir=ck,
                     resume=True, num_workers=2)
    got = {r["node"]: r["root"] for r in res.to_pylist()}
    assert got == want

    od = str(tmp_path / "out")
    man = scc_labels(edges, num_parts=3, out_dir=od)
    assert man["kind"] == "label"
    t = read_result_dataset(od).to_pandas().sort_values(
        "id").reset_index(drop=True)
    names = t["node"].to_numpy()
    got_sink = {str(nm): str(names[lab])
                for nm, lab in zip(names, t["label"].to_numpy())}
    assert got_sink == want

    with pytest.raises(ValueError, match="requires checkpoint_dir"):
        scc_labels(edges, num_parts=3, resume=True)


def test_resume_requires_checkpoint_dir(tmp_path):
    """resume=True with checkpoint_dir=None raises a clear
    ValueError (not an opaque TypeError from os.path.join) in every
    iterative algorithm."""
    from pagerank_ray.graph.bfs import bfs_distances
    from pagerank_ray.graph.pagerank import PageRankRunner

    edges, _ = component_fixture_edges()
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=2,
                undirected=True)
    with pytest.raises(ValueError, match="requires checkpoint_dir"):
        connected_components(gdir, resume=True)
    with pytest.raises(ValueError, match="requires checkpoint_dir"):
        label_propagation(gdir, resume=True)
    with pytest.raises(ValueError, match="requires checkpoint_dir"):
        bfs_distances(gdir, seed_ids=[0], resume=True)
    runner = PageRankRunner(gdir)
    try:
        with pytest.raises(ValueError, match="requires checkpoint_dir"):
            runner.run(resume=True)
    finally:
        runner.close()


def test_cc_bfs_raise_on_round_exhaustion(tmp_path):
    """A truncated propagation must fail loudly, not return partial
    labels/distances (ADVICE r4)."""
    from pagerank_ray.graph.bfs import bfs_distances

    edges, _ = component_fixture_edges()
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=2,
                undirected=True)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(gdir, max_rounds=1)
    with pytest.raises(RuntimeError, match="did not converge"):
        bfs_distances(gdir, seed_ids=[0], max_rounds=1)


def test_triangles_clustering_sink_and_partitioned(tmp_path):
    """triangle_counts(out_dir=) / clustering_coefficients(out_dir=)
    write sharded parquet that reads back equal to the driver tables,
    on BOTH paths; the partitioned clustering path (Dataset tri⋈deg
    join) matches the broadcast driver composition; a reused out_dir
    is wiped (no file mixing)."""
    import pyarrow as pa
    import ray.data as rd

    from pagerank_ray.graph.triangles import (clustering_coefficients,
                                              triangle_counts)

    edges, _ = component_fixture_edges()
    ds = from_arrow_edges(edges)

    want_tri = triangle_counts(ds)
    want_clu = clustering_coefficients(ds)
    # partitioned path parity (threshold 0 forces it)
    got_clu_p = clustering_coefficients(ds, broadcast_threshold=0)
    assert got_clu_p.to_pylist() == want_clu.to_pylist()

    def readback(d):
        t = rd.read_parquet(d).to_pandas()
        t = t.sort_values("node").reset_index(drop=True)
        return pa.Table.from_pandas(t, preserve_index=False)

    for thresh in (2_000_000, 0):  # broadcast, partitioned
        td = str(tmp_path / f"tri{thresh}")
        assert triangle_counts(ds, broadcast_threshold=thresh,
                               out_dir=td) is None
        assert readback(td).select(
            ["node", "tri_count"]).to_pylist() == want_tri.to_pylist()
        cd = str(tmp_path / f"clu{thresh}")
        assert clustering_coefficients(ds, broadcast_threshold=thresh,
                                       out_dir=cd) is None
        assert readback(cd).select(
            ["node", "deg", "tri_count", "coeff_ppm"]
        ).to_pylist() == want_clu.to_pylist()

    # reuse wipe: write a stray parquet, rewrite, stray must be gone
    import os
    stray = str(tmp_path / "tri0" / "stale.parquet")
    with open(stray, "wb") as f:
        f.write(b"junk")
    triangle_counts(ds, broadcast_threshold=0,
                    out_dir=str(tmp_path / "tri0"))
    assert not os.path.exists(stray)
    assert readback(str(tmp_path / "tri0")).select(
        ["node", "tri_count"]).to_pylist() == want_tri.to_pylist()

    with pytest.raises(ValueError, match="mutually exclusive"):
        triangle_counts(ds, return_degrees=True, out_dir=str(tmp_path))


def test_scc_trim_only_dag():
    """A pure DAG (no cycles) resolves entirely through the trim
    phase — every node is its own SCC — and matches Kosaraju."""
    import pyarrow as pa

    from pagerank_ray.graph.scc import scc_labels

    from .oracle import scc_oracle

    rng = np.random.RandomState(31)
    # random DAG: edges only from lower to higher node index
    lo = rng.randint(0, 50, 200)
    hi = lo + 1 + rng.randint(0, 20, 200)
    pairs = [(f"v{a:03d}", f"v{b:03d}") for a, b in zip(lo, hi)]
    edges = pa.table({
        "src": pa.array([p[0] for p in pairs], pa.string()),
        "dst": pa.array([p[1] for p in pairs], pa.string())})
    res = scc_labels(edges, num_parts=3)
    got = {r["node"]: r["root"] for r in res.to_pylist()}
    want = scc_oracle(pairs)
    assert got == want
    assert all(k == v for k, v in got.items())  # all singletons


def test_closeness_stats_matches_python_bfs(tmp_path):
    """Per-seed (n_reached, sum_dist, max_dist) == plain-python BFS
    sums; worker-count invariance; id order; seed included at d=0."""
    from pagerank_ray.graph.bfs import closeness_stats

    from .oracle import bfs_oracle

    edges, n_comp = component_fixture_edges()
    assert n_comp > 1
    gdir = str(tmp_path / "g")
    build_graph(from_arrow_edges(edges), gdir, num_parts=4,
                undirected=True)
    import pagerank_ray.graph.build as gb
    nodes = gb.load_nodes(gdir)
    id2name = dict(zip(nodes.column("id").to_pylist(),
                       nodes.column("node").to_pylist()))
    got = closeness_stats(gdir, seed_ids=[0, 2, 5]).to_pylist()
    assert [r["id"] for r in got] == [0, 2, 5]
    for r in got:
        d = bfs_oracle(_pairs(edges), [id2name[r["id"]]])
        assert r["n_reached"] == len(d)
        assert r["sum_dist"] == sum(d.values())
        assert r["max_dist"] == max(d.values())
    # invariant across worker counts and duplicate/unsorted seeds
    got2 = closeness_stats(gdir, seed_ids=[5, 0, 2, 0],
                           num_workers=2).to_pylist()
    assert got2 == got


def test_closeness_stats_seed_validation(tmp_path):
    from pagerank_ray.graph.bfs import closeness_stats

    edges, _ = component_fixture_edges()
    gdir = str(tmp_path / "gv")
    build_graph(from_arrow_edges(edges), gdir, num_parts=2,
                undirected=True)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        closeness_stats(gdir, seed_ids=[])
    with _pytest.raises(ValueError):
        closeness_stats(gdir, seed_ids=[-1])
    with _pytest.raises(ValueError):
        closeness_stats(gdir, seed_ids=[10**9])
