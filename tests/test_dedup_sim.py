"""Dedup families + similarity search vs brute-force truth."""

import numpy as np
import pyarrow as pa
import pytest

from pagerank_ray.functions.hashing import (jaccard, shingle_hashes,
                                            simhash64, word_shingles)
from pagerank_ray.pipelines.dedup import (embedding_cosine_pairs,
                                          exact_dedup, minhash_lsh_pairs,
                                          ngram_jaccard_pairs, simhash_pairs)
from pagerank_ray.pipelines.similarity import knn_bruteforce, knn_lsh


def _dup_docs():
    """Fixture with exact dups, near dups, and unrelated docs."""
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest tonight")
    near = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest today")  # 1 word changed
    other = ("completely different content about database engines and "
             "distributed query processing with ray data pipelines")
    texts = [base, near, base, other, "tiny", "tiny"]
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def test_exact_dedup():
    out = exact_dedup(_dup_docs())
    # doc 2 dups doc 0; doc 5 dups doc 4
    assert out.column("doc_id").to_pylist() == [0, 1, 3, 4]


def test_ngram_jaccard_exact_pairs():
    out = ngram_jaccard_pairs(_dup_docs(), n=3, threshold=0.5)
    pairs = list(zip(out.column("a").to_pylist(),
                     out.column("b").to_pylist()))
    # brute-force truth
    docs = _dup_docs()
    texts = docs.column("text").to_pylist()
    want = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a = shingle_hashes(texts[i])
            b = shingle_hashes(texts[j])
            if len(a) and len(b) and \
                    jaccard(np.sort(a), np.sort(b)) >= 0.5:
                want.append((i, j))
    assert pairs == sorted(want)
    assert (0, 2) in pairs and (0, 1) in pairs and (4, 5) in pairs
    # verify int columns consistent
    for r in out.to_pylist():
        assert r["inter_size"] <= r["union_size"]


def test_minhash_lsh_finds_near_dups():
    out = minhash_lsh_pairs(_dup_docs(), threshold=0.5)
    pairs = set(zip(out.column("a").to_pylist(),
                    out.column("b").to_pylist()))
    assert {(0, 1), (0, 2), (1, 2), (4, 5)} <= pairs
    jac = {(r["a"], r["b"]): r["jaccard"] for r in out.to_pylist()}
    assert jac[(0, 2)] == 1.0  # exact dup
    assert 0.5 <= jac[(0, 1)] < 1.0


def test_dedup_clusters_union_find_oracle():
    """dedup_clusters == union-find over the minhash pair graph,
    with singletons canonicalized as themselves."""
    from pagerank_ray.pipelines.dedup import dedup_clusters

    docs = _dup_docs()
    out = dedup_clusters(docs, threshold=0.5)

    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    parent = {i: i for i in docs.column("doc_id").to_pylist()}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs.column("a").to_pylist(),
                    pairs.column("b").to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for d in parent:
        comp.setdefault(find(d), []).append(d)
    expect = {d: min(members) for members in comp.values()
              for d in members}

    got = dict(zip(out.column("doc_id").to_pylist(),
                   out.column("canonical_id").to_pylist()))
    assert got == expect
    # the fixture's known clusters: {0,1,2} and {4,5}; 3 singleton
    assert got[0] == got[1] == got[2] == 0
    assert got[4] == got[5] == 4
    assert got[3] == 3


def test_simhash_pairs():
    out = simhash_pairs(_dup_docs(), max_hamming=6)
    pairs = set(zip(out.column("a").to_pylist(),
                    out.column("b").to_pylist()))
    assert (0, 2) in pairs  # identical text -> hamming 0
    ham = {(r["a"], r["b"]): r["hamming"] for r in out.to_pylist()}
    assert ham[(0, 2)] == 0
    # near-dup should be within a few bits
    assert simhash64(_dup_docs().column("text")[0].as_py()) == \
        simhash64(_dup_docs().column("text")[2].as_py())


def _emb_table(n=40, dim=16, seed=7):
    rng = np.random.RandomState(seed)
    m = rng.randn(n, dim)
    # plant near-duplicates: 1≈0, 11≈10
    m[1] = m[0] + 0.01 * rng.randn(dim)
    m[11] = m[10] + 0.01 * rng.randn(dim)
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([row.astype(np.float32).tolist()
                               for row in m], pa.list_(pa.float32())),
    })


def test_embedding_cosine_pairs():
    out = embedding_cosine_pairs(_emb_table(), threshold=0.99)
    pairs = set(zip(out.column("a").to_pylist(),
                    out.column("b").to_pylist()))
    assert (0, 1) in pairs and (10, 11) in pairs


def test_knn_bruteforce_matches_numpy():
    t = _emb_table()
    out = knn_bruteforce(t, query_ids=[0, 10], k=5)
    got = {}
    for r in out.to_pylist():
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    # numpy truth
    m = np.stack([np.asarray(v, np.float64)
                  for v in t.column("embedding").to_pylist()])
    m = m / np.linalg.norm(m, axis=1)[:, None]
    for q in (0, 10):
        sims = m @ m[q]
        sims[q] = -np.inf
        want = list(np.argsort(-sims, kind="stable")[:5])
        assert got[q] == want
    assert got[0][0] == 1 and got[10][0] == 11


def test_knn_lsh_recall():
    t = _emb_table(n=60)
    exact = knn_bruteforce(t, query_ids=[0, 10], k=5)
    # nbits=4: own + Hamming-1 probes cover 5/16 of bucket space on a
    # UNIFORM random corpus (cosine ~0 everywhere — the hard case for
    # SRP); measured recall 0.5 with the deterministic ±1 planes
    approx = knn_lsh(t, query_ids=[0, 10], k=5, nbits=4)
    ex = {}
    for r in exact.to_pylist():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ap = {}
    for r in approx.to_pylist():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # nearest planted neighbor must be found; overall recall >= 40%
    assert 1 in ap[0] and 11 in ap[10]
    total = sum(len(ex[q] & ap.get(q, set())) for q in ex)
    assert total >= 0.4 * sum(len(v) for v in ex.values())


def test_embedding_lsh_recall_vs_bruteforce():
    """LSH-bucketed near-dup pairs: every pair it reports is a true
    near-dup (precision 1.0 — cosine is exact-verified) and recall vs
    the brute-force baseline is high at 8 bits + Hamming-1 probes."""
    import ray.data as rd

    from pagerank_ray.pipelines.dedup import (embedding_cosine_pairs,
                                              embedding_cosine_pairs_lsh)

    sf = "/root/testdata/sf0.001"
    truth = embedding_cosine_pairs(
        rd.read_parquet(f"{sf}/embeddings.parquet"), threshold=0.45)
    got = embedding_cosine_pairs_lsh(
        rd.read_parquet(f"{sf}/embeddings.parquet"), threshold=0.45)
    t_pairs = set(zip(truth.column("a").to_pylist(),
                      truth.column("b").to_pylist()))
    g_pairs = set(zip(got.column("a").to_pylist(),
                      got.column("b").to_pylist()))
    assert g_pairs <= t_pairs          # precision 1.0
    if t_pairs:
        assert len(g_pairs) / len(t_pairs) >= 0.6   # probe-LSH recall


def test_knn_lsh_matches_numpy_lsh_oracle():
    """The probe-join knn_lsh must reproduce EXACTLY the candidates +
    ranking of a pure-numpy oracle with the same hasher and probe set
    (own bucket + Hamming-1): the join/partial-top-k machinery may not
    change semantics, only distribution."""
    import numpy as np

    from pagerank_ray.pipelines.similarity import (_HyperplaneHasher,
                                                   _normalize)

    t = _emb_table(n=80)
    qs, k, nbits = [0, 10, 25], 5, 6
    ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = _normalize(np.stack([np.asarray(v, np.float64)
                             for v in t.column("embedding").to_pylist()]))
    h = _HyperplaneHasher(m.shape[1], nbits, 42)
    buckets = h.sign_bits(m)
    want = []
    for q in qs:
        qi = int(np.flatnonzero(ids == q)[0])
        probed = {int(buckets[qi])} | {int(buckets[qi]) ^ (1 << i)
                                       for i in range(nbits)}
        cand = np.flatnonzero(np.isin(buckets, list(probed)) & (ids != q))
        sims = m[cand] @ m[qi]
        order = np.lexsort((ids[cand], -sims))[:k]
        for rnk, j in enumerate(order, 1):
            want.append((q, int(ids[cand][j]), rnk,
                         round(float(sims[j]), 9)))

    out = knn_lsh(t, query_ids=qs, k=k, nbits=nbits)
    got = [(r["query_id"], r["neighbor_id"], r["rnk"],
            round(r["cos_sim"], 9)) for r in out.to_pylist()]
    assert sorted(got) == sorted(want)


def test_knn_ivf_matches_numpy_ivf_oracle():
    """knn_ivf must reproduce EXACTLY a pure-numpy oracle with the
    same deterministic sample, k-means centroids, bucket assignment,
    and n_probe probing — the distribution machinery may not change
    semantics."""
    import numpy as np

    from pagerank_ray.pipelines.similarity import (_normalize,
                                                   kmeans_fit, knn_ivf)

    t = _emb_table(n=80)
    qs, k, nc, npb = [0, 10, 25], 5, 8, 3
    ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = _normalize(np.stack([np.asarray(v, np.float64)
                             for v in t.column("embedding").to_pylist()]))
    step = max(1, len(ids) // 2048)
    cent = kmeans_fit(m[ids % step == 0], nc, seed=42)
    buckets = np.argmax(m @ cent.T, axis=1)
    want = []
    for q in qs:
        qi = int(np.flatnonzero(ids == q)[0])
        probed = np.argsort(-(cent @ m[qi]), kind="stable")[:npb]
        cand = np.flatnonzero(np.isin(buckets, probed) & (ids != q))
        sims = m[cand] @ m[qi]
        order = np.lexsort((ids[cand], -sims))[:k]
        for rnk, j in enumerate(order, 1):
            want.append((q, int(ids[cand][j]), rnk,
                         round(float(sims[j]), 9)))

    out = knn_ivf(t, query_ids=qs, k=k, n_clusters=nc, n_probe=npb)
    got = [(r["query_id"], r["neighbor_id"], r["rnk"],
            round(r["cos_sim"], 9)) for r in out.to_pylist()]
    assert sorted(got) == sorted(want)


def test_knn_ivf_recall():
    """Planted nearest neighbors must be found; recall vs brute force
    is high when probing 1/4 of the lists."""
    t = _emb_table(n=60)
    from pagerank_ray.pipelines.similarity import knn_ivf

    exact = knn_bruteforce(t, query_ids=[0, 10], k=5)
    approx = knn_ivf(t, query_ids=[0, 10], k=5, n_clusters=8, n_probe=4)
    ex, ap = {}, {}
    for r in exact.to_pylist():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx.to_pylist():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert 1 in ap[0] and 11 in ap[10]   # planted near-dups found
    total = sum(len(ex[q] & ap.get(q, set())) for q in ex)
    assert total >= 0.6 * sum(len(v) for v in ex.values())


def test_label_centroids_matches_duckdb_and_numpy():
    import duckdb

    from pagerank_ray.pipelines.similarity import (LABEL_CENTROIDS_SQL,
                                                   label_centroids)

    sf = "/root/testdata/sf0.001"
    got = label_centroids(sf).to_pandas().sort_values(
        ["label", "dim"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    exp = con.execute(LABEL_CENTROIDS_SQL).df().sort_values(
        ["label", "dim"]).reset_index(drop=True)
    cols = ["label", "dim", "centroid"]
    assert got[cols].equals(exp[cols])
    # spot-check one label against plain numpy
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf}/embeddings.parquet")
    lab = t.column("label").to_numpy()
    m = np.stack([np.asarray(v, np.float64)
                  for v in t.column("embedding").to_pylist()])
    l0 = lab[0]
    want = np.round(m[lab == l0].mean(axis=0), 6)
    have = got[got["label"] == l0].sort_values("dim")["centroid"].to_numpy()
    assert np.array_equal(have, want)


def test_minhash_lsh_pairs_dataset_form_matches_table():
    """return_dataset=True yields the same verified pairs as the
    sorted driver table (the composition form dedup_clusters feeds
    into build_graph without a driver round-trip)."""
    want = minhash_lsh_pairs(_dup_docs(), threshold=0.5).to_pylist()
    ds = minhash_lsh_pairs(_dup_docs(), threshold=0.5,
                           return_dataset=True)
    import ray.data as rd
    assert isinstance(ds, rd.Dataset)
    got = sorted(ds.to_pandas().itertuples(index=False),
                 key=lambda r: (r.a, r.b))
    want_t = [(r["a"], r["b"], r["jaccard"]) for r in want]
    assert [(r.a, r.b, r.jaccard) for r in got] == want_t
