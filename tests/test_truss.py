"""Edge-level triangle analytics (graph/truss.py) vs brute-force
oracles: per-edge support + exact-integer neighborhood Jaccard, and
k-truss membership via iterated peeling. Engine extensions beyond
the reference (reference/pagerank.py has no edge-level operators)."""

import numpy as np
import pyarrow as pa
import pytest

from pagerank_ray.graph.truss import edge_support, ktruss_edges
from pagerank_ray.sources.edge_csv import from_arrow_edges
from pagerank_ray.sources.synth import component_fixture_edges


def _mixed_edges() -> pa.Table:
    """K4 (a..d) + pendant d-e + triangle e-f-g + dup + self-loop."""
    e = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
         ("c", "d"), ("d", "e"), ("e", "f"), ("f", "g"), ("e", "g"),
         ("b", "a"), ("c", "c")]
    return pa.table({"src": [x[0] for x in e],
                     "dst": [x[1] for x in e]})


def _simple_pairs(table) -> set[tuple[str, str]]:
    out = set()
    for s, d in zip(table.column("src").to_pylist(),
                    table.column("dst").to_pylist()):
        if s != d:
            out.add((min(s, d), max(s, d)))
    return out


def _adj(E):
    adj: dict[str, set[str]] = {}
    for u, v in E:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


def _brute_support(E):
    adj = _adj(E)
    return {(u, v): (len(adj[u] & adj[v]),
                     len((adj[u] - {v}) | (adj[v] - {u})))
            for u, v in E}


def _brute_truss(E, k: int):
    E = set(E)
    while True:
        adj = _adj(E)
        drop = {(u, v) for u, v in E if len(adj[u] & adj[v]) < k - 2}
        if not drop:
            return E
        E -= drop


def _support_dict(t: pa.Table):
    return {(t.column("src")[i].as_py(), t.column("dst")[i].as_py()):
            (t.column("common_cnt")[i].as_py(),
             t.column("union_cnt")[i].as_py())
            for i in range(t.num_rows)}


def test_edge_support_mixed_graph():
    edges = _mixed_edges()
    got = _support_dict(edge_support(from_arrow_edges(edges)))
    assert got == _brute_support(_simple_pairs(edges))


def test_edge_support_random_graph():
    edges, _ = component_fixture_edges()
    t = edge_support(from_arrow_edges(edges))
    assert got_sorted(t)
    assert _support_dict(t) == _brute_support(_simple_pairs(edges))


def got_sorted(t: pa.Table) -> bool:
    pairs = list(zip(t.column("src").to_pylist(),
                     t.column("dst").to_pylist()))
    return pairs == sorted(pairs)


@pytest.mark.parametrize("k", [3, 4, 5])
def test_ktruss_exact(k):
    edges = _mixed_edges()
    want = _brute_truss(_simple_pairs(edges), k)
    t, rounds = ktruss_edges(from_arrow_edges(edges), k=k,
                             return_rounds=True)
    got = set(zip(t.column("src").to_pylist(),
                  t.column("dst").to_pylist()))
    assert got == want
    assert rounds >= 1
    # support column = support WITHIN the truss (fixpoint recompute)
    adj = _adj(want)
    sup = {(t.column("src")[i].as_py(), t.column("dst")[i].as_py()):
           t.column("support")[i].as_py() for i in range(t.num_rows)}
    assert sup == {(u, v): len(adj[u] & adj[v]) for u, v in want}


def test_ktruss_random_graph():
    edges, _ = component_fixture_edges()
    want = _brute_truss(_simple_pairs(edges), 4)
    t = ktruss_edges(from_arrow_edges(edges), k=4)
    got = set(zip(t.column("src").to_pylist(),
                  t.column("dst").to_pylist()))
    assert got == want


def test_ktruss_k_validation():
    with pytest.raises(ValueError):
        ktruss_edges(from_arrow_edges(_mixed_edges()), k=2)


def test_ktruss_max_rounds_exhaustion():
    with pytest.raises(RuntimeError):
        ktruss_edges(from_arrow_edges(_mixed_edges()), k=4,
                     max_rounds=1)


def test_truss_degenerate_inputs():
    # all self-loops -> empty simple graph
    loops = pa.table({"src": ["a", "b"], "dst": ["a", "b"]})
    t = edge_support(from_arrow_edges(loops))
    assert t.num_rows == 0
    assert t.column_names == ["src", "dst", "common_cnt", "union_cnt"]
    k = ktruss_edges(from_arrow_edges(loops), k=3)
    assert k.num_rows == 0
    assert k.column_names == ["src", "dst", "support"]
    # triangle-free graph: every edge has zero support, truss empty
    path = pa.table({"src": ["a", "b", "c"], "dst": ["b", "c", "d"]})
    t = edge_support(from_arrow_edges(path))
    assert _support_dict(t) == _brute_support(_simple_pairs(path))
    assert ktruss_edges(from_arrow_edges(path), k=3).num_rows == 0


def test_truss_out_dir_sink(tmp_path):
    from pagerank_ray.graph.sink import read_sunk_dataset
    edges = _mixed_edges()
    d1 = str(tmp_path / "sup")
    assert edge_support(from_arrow_edges(edges), out_dir=d1) is None
    back = read_sunk_dataset(d1).to_pandas().sort_values(
        ["src", "dst"]).reset_index(drop=True)
    direct = edge_support(from_arrow_edges(edges)).to_pandas()
    assert back.equals(direct)

    d2 = str(tmp_path / "truss")
    assert ktruss_edges(from_arrow_edges(edges), k=4,
                        out_dir=d2) is None
    back = read_sunk_dataset(d2).to_pandas().sort_values(
        ["src", "dst"]).reset_index(drop=True)
    direct = ktruss_edges(from_arrow_edges(edges), k=4).to_pandas()
    assert back.equals(direct)


def test_scc_condensation_exact():
    from pagerank_ray.graph.scc import scc_condensation
    # two cycles (a,b,c), (d,e); cross edges; singleton f; g->a
    e = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "e"), ("e", "d"),
         ("c", "d"), ("a", "e"), ("e", "f"), ("f", "f"), ("b", "b"),
         ("g", "a")]
    edges = pa.table({"src": [x[0] for x in e],
                      "dst": [x[1] for x in e]})
    t = scc_condensation(from_arrow_edges(edges), num_parts=3)
    got = list(zip(t.column("src_comp").to_pylist(),
                   t.column("dst_comp").to_pylist()))
    assert got == [("a", "d"), ("d", "f"), ("g", "a")]


def test_scc_condensation_acyclic_random():
    """Condensation of a random directed graph is a DAG whose roots
    partition the nodes — checked against a reachability oracle."""
    from pagerank_ray.graph.scc import scc_condensation, scc_labels
    rng = np.random.default_rng(7)
    src = rng.integers(0, 30, 120)
    dst = rng.integers(0, 30, 120)
    edges = pa.table({"src": [str(x) for x in src],
                      "dst": [str(x) for x in dst]})
    labels = scc_labels(from_arrow_edges(edges), num_parts=4)
    root = dict(zip(labels.column("node").to_pylist(),
                    labels.column("root").to_pylist()))
    want = sorted({(root[str(s)], root[str(d)])
                   for s, d in zip(src, dst)
                   if root[str(s)] != root[str(d)]})
    t = scc_condensation(from_arrow_edges(edges), num_parts=4)
    got = list(zip(t.column("src_comp").to_pylist(),
                   t.column("dst_comp").to_pylist()))
    assert got == want
    # DAG check: no cycle among condensation edges (Kahn's algorithm)
    nodes = {x for p in got for x in p}
    indeg = {x: 0 for x in nodes}
    adj: dict[str, list[str]] = {x: [] for x in nodes}
    for u, v in got:
        adj[u].append(v)
        indeg[v] += 1
    q = [x for x in nodes if indeg[x] == 0]
    seen = 0
    while q:
        u = q.pop()
        seen += 1
        for v in adj[u]:
            indeg[v] -= 1
            if indeg[v] == 0:
                q.append(v)
    assert seen == len(nodes), "condensation has a cycle"


def test_scc_condensation_degenerate(tmp_path):
    from pagerank_ray.graph.scc import scc_condensation
    from pagerank_ray.graph.sink import read_sunk_dataset
    empty = pa.table({"src": pa.array([], pa.string()),
                      "dst": pa.array([], pa.string())})
    t = scc_condensation(from_arrow_edges(empty))
    assert t.num_rows == 0
    assert t.column_names == ["src_comp", "dst_comp"]
    # one big cycle -> single SCC -> empty condensation, sink form
    cyc = pa.table({"src": ["a", "b", "c"], "dst": ["b", "c", "a"]})
    d = str(tmp_path / "cond")
    assert scc_condensation(from_arrow_edges(cyc), num_parts=2,
                            out_dir=d) is None
    assert read_sunk_dataset(d).count() == 0
