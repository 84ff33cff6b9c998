"""HITS hubs & authorities vs a numpy power-iteration oracle.

The engine (graph/hits.py) runs the multiplicity-weighted HITS
updates on the twin actor pools; the oracle replays the identical
iteration order (normalize h by its pending L2 norm, a = M^T h,
normalize, h = M a, normalize) with np.add.at scatter-adds, so a
fixed-iteration run must agree to float64 round-off.
"""

import numpy as np
import pyarrow as pa
import pytest


def hits_oracle(src_names, dst_names, iters):
    names = sorted(set(src_names) | set(dst_names))
    idx = {nm: i for i, nm in enumerate(names)}
    n = len(names)
    s = np.array([idx[x] for x in src_names], dtype=np.int64)
    d = np.array([idx[x] for x in dst_names], dtype=np.int64)
    h = np.full(n, 1.0) / np.sqrt(n)
    a = np.zeros(n)
    for _ in range(iters):
        h = h / np.linalg.norm(h)
        a_un = np.zeros(n)
        np.add.at(a_un, d, h[s])
        a = a_un / np.linalg.norm(a_un)
        h_un = np.zeros(n)
        np.add.at(h_un, s, a[d])
        h = h_un
    # engine returns the NORMALIZED hub vector at the break point
    h = h / np.linalg.norm(h)
    return names, h, a


def _random_edges(seed, n_nodes=60, n_edges=400):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    return ([f"n{x:03d}" for x in src], [f"n{x:03d}" for x in dst])


def test_hits_fixed_iterations_match_numpy():
    from pagerank_ray.graph.hits import hits_scores
    src, dst = _random_edges(7)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    res = hits_scores(t, num_parts=3, max_iter=8, tol=0.0)
    names, h, a = hits_oracle(src, dst, 8)
    assert res.column("node").to_pylist() == names
    np.testing.assert_allclose(res.column("hub").to_numpy(), h,
                               atol=1e-12)
    np.testing.assert_allclose(res.column("authority").to_numpy(), a,
                               atol=1e-12)


def test_hits_converged_and_split_exchange_match():
    from pagerank_ray.graph.hits import hits_scores
    src, dst = _random_edges(11, n_nodes=40, n_edges=300)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    res = hits_scores(t, num_parts=4, max_iter=200, tol=1e-12)
    # converged run agrees with a long oracle run
    names, h, a = hits_oracle(src, dst, 200)
    np.testing.assert_allclose(res.column("hub").to_numpy(), h,
                               atol=1e-9)
    np.testing.assert_allclose(res.column("authority").to_numpy(), a,
                               atol=1e-9)
    # split exchange is bit-comparable to concat
    res2 = hits_scores(t, num_parts=4, max_iter=200, tol=1e-12,
                       exchange="split")
    np.testing.assert_allclose(res2.column("hub").to_numpy(),
                               res.column("hub").to_numpy(),
                               atol=1e-13)
    np.testing.assert_allclose(res2.column("authority").to_numpy(),
                               res.column("authority").to_numpy(),
                               atol=1e-13)


def test_hits_hand_graph_star():
    """Star u->v1..v3: u is the sole hub, leaves split authority."""
    from pagerank_ray.graph.hits import hits_scores
    t = pa.table({"src": pa.array(["u", "u", "u"]),
                  "dst": pa.array(["v1", "v2", "v3"])})
    res = hits_scores(t, num_parts=2, max_iter=50, tol=1e-12)
    d = {n: (hh, aa) for n, hh, aa in zip(
        res.column("node").to_pylist(),
        res.column("hub").to_numpy(),
        res.column("authority").to_numpy())}
    assert d["u"][0] == pytest.approx(1.0)
    for v in ("v1", "v2", "v3"):
        assert d[v][1] == pytest.approx(1.0 / np.sqrt(3))
        assert d[v][0] == pytest.approx(0.0)
    assert d["u"][1] == pytest.approx(0.0)


def test_hits_duplicate_edges_sum():
    """Parallel edges weight the adjacency (reference COO-coalesce
    semantics): doubling u->v1 must tilt authority toward v1."""
    from pagerank_ray.graph.hits import hits_scores
    t = pa.table({"src": pa.array(["u", "u", "u"]),
                  "dst": pa.array(["v1", "v1", "v2"])})
    res = hits_scores(t, num_parts=2, max_iter=50, tol=1e-12)
    d = dict(zip(res.column("node").to_pylist(),
                 res.column("authority").to_numpy()))
    assert d["v1"] > d["v2"] > 0
    names, h, a = hits_oracle(["u", "u", "u"], ["v1", "v1", "v2"], 50)
    np.testing.assert_allclose(res.column("authority").to_numpy(), a,
                               atol=1e-12)


def test_hits_empty_and_sink(tmp_path):
    from pagerank_ray.graph.hits import hits_scores
    from pagerank_ray.graph.sink import read_result_dataset
    empty = pa.table({"src": pa.array([], pa.string()),
                      "dst": pa.array([], pa.string())})
    res = hits_scores(empty)
    assert res.num_rows == 0
    # out_dir form writes hub/ and authority/ worker-side
    src, dst = _random_edges(3, n_nodes=20, n_edges=80)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    od = str(tmp_path / "hits_out")
    man = hits_scores(t, num_parts=3, max_iter=30, tol=1e-12,
                      out_dir=od)
    assert set(man) == {"hub", "authority"}
    ref = hits_scores(t, num_parts=3, max_iter=30, tol=1e-12)
    hub = read_result_dataset(f"{od}/hub").to_pandas() \
        .sort_values("node").reset_index(drop=True)
    np.testing.assert_allclose(
        hub["rank"].to_numpy(),
        ref.column("hub").to_numpy(), atol=1e-13)
    auth = read_result_dataset(f"{od}/authority").to_pandas() \
        .sort_values("node").reset_index(drop=True)
    np.testing.assert_allclose(
        auth["rank"].to_numpy(),
        ref.column("authority").to_numpy(), atol=1e-13)
