"""Approximate-nearest-neighbor search over an embedding column.

``knn_bruteforce`` — the correctness baseline: the (small) query
matrix is broadcast once with ray.put; every batch computes a float64
cosine block-matmul against it and emits per-batch top-k candidates;
the driver merges the tiny candidate set. One pass over the data, no
shuffle.

``knn_lsh`` — scale path #1: random-hyperplane LSH signatures bucket
the corpus; queries probe their own bucket plus all Hamming-1
neighbors via a (bucket, query) probe-table hash join.

``knn_ivf`` — scale path #2: IVF coarse quantizer (k-means on a
bounded deterministic sample) buckets the corpus into inverted lists;
queries probe their n_probe nearest centroids through the same
probe-join machinery. Both are approximate — recall is tested against
the brute-force baseline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


from ..functions.vectors import binary_matrix, list_matrix, pack_rows


def _to_ds(x):
    return rd.from_arrow(x) if isinstance(x, pa.Table) else x


def _fetch_rows(ds, vec_ids) -> list[dict]:
    """Rows for a handful of vec_ids via a FILTERED distributed scan —
    only the matching rows ever reach the driver (the round-1 version
    take_all()'d the whole dataset for 5 query rows)."""
    value_set = pa.array(sorted(set(vec_ids)), pa.int64())

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("vec_id"), value_set=value_set))

    return ds.map_batches(pick, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1), 1e-300)[:, None]


def knn_bruteforce(embs, query_ids: list[int], k: int = 10,
                   round_to: int | None = 6) -> pa.Table:
    """Exact cosine top-k. Returns (query_id, neighbor_id, cos_sim, rnk)
    sorted by (query_id, rnk); self-matches excluded; ties broken by
    neighbor_id asc. ``round_to`` rounds cos_sim for cross-engine
    hash parity (None = raw)."""
    ds = _to_ds(embs)
    qset = sorted(query_ids)
    qs = set(qset)

    q_rows = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
              for r in _fetch_rows(ds, qs)}
    missing = qs - q_rows.keys()
    if missing:
        raise ValueError(f"query_ids not found in dataset: "
                         f"{sorted(missing)}")
    qmat = _normalize(np.stack([q_rows[i] for i in qset]))
    qids = np.array(qset, dtype=np.int64)
    # broadcast once via ray.put; STATELESS TASKS read it (zero-copy
    # plasma get per batch, ~µs once local) — an actor pool here pays
    # 1-2 s of spin-up for a stage whose only "state" is a lookup ref,
    # and tasks scale with the cluster instead of a fixed pool
    qref = ray.put((qids, qmat))

    def partial_topk(t: pa.Table, *, qref, k) -> pa.Table:
        qids, qmat = ray.get(qref) if isinstance(
            qref, ray.ObjectRef) else qref
        bid = t.column("vec_id").to_numpy()
        bm = _normalize(list_matrix(t.column("embedding")))
        sims = qmat @ bm.T                          # (Q, B)
        # mask self-matches
        for qi, qv in enumerate(qids):
            sims[qi, bid == qv] = -np.inf
        kk = min(k, sims.shape[1])
        # per query: top-k by (sim desc, id asc)
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        q_out = np.repeat(qids, kk)
        n_out = bid[idx].ravel()
        s_out = np.take_along_axis(sims, idx, axis=1).ravel()
        keep = np.isfinite(s_out)
        return pa.table({"query_id": pa.array(q_out[keep]),
                         "neighbor_id": pa.array(n_out[keep]),
                         "cos_sim": pa.array(s_out[keep])})

    partial = ds.map_batches(partial_topk,
                             fn_kwargs={"qref": qref, "k": k},
                             batch_format="pyarrow")
    cand = partial.to_pandas()
    cand = cand.sort_values(["query_id", "cos_sim", "neighbor_id"],
                            ascending=[True, False, True], kind="stable")
    cand = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    cand["rnk"] = cand.groupby("query_id").cumcount() + 1
    if round_to is not None:
        cand["cos_sim"] = cand["cos_sim"].round(round_to)
    return pa.Table.from_pandas(cand, preserve_index=False)


class _HyperplaneHasher:
    """Signed-random-projection hasher with DETERMINISTIC ±1 planes:
    plane[j, i] = ±1 by the parity of the first hex nibble of
    sha256("plane:{seed}:{j}:{i}") (i is 1-based to match SQL array
    indexing). A symmetric ±1 sign distribution preserves the
    cosine-LSH collision guarantee (Charikar 2002 SRP admits any
    symmetric distribution), and — unlike gaussian RNG planes — the
    bucketing is replicable in DuckDB (sha256 + strpos), so the
    approximate LSH paths get full value-hash SQL oracles
    (``knn_lsh_sql`` below, ``embedding_lsh_pairs_sql`` in dedup).
    Bucket bits are scale-invariant (sign of the raw dot == sign of
    the normalized dot), so the SQL side skips normalization."""

    def __init__(self, dim: int, nbits: int = 8, seed: int = 42):
        import hashlib
        planes = np.empty((nbits, dim), np.float64)
        for j in range(nbits):
            for i in range(1, dim + 1):
                digest = hashlib.sha256(
                    f"plane:{seed}:{j}:{i}".encode()).hexdigest()
                planes[j, i - 1] = 1.0 if int(digest[0], 16) % 2 else -1.0
        self.planes = planes
        self.nbits = nbits

    def sign_bits(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes.T) > 0
        weights = (1 << np.arange(self.nbits)).astype(np.int64)
        return bits.astype(np.int64) @ weights


# shared SQL fragment: the ±1 plane matrix as a (j, i, s) relation —
# identical integers to _HyperplaneHasher (DuckDB sha256 == hashlib)
_SIGNS_SQL = """
        signs AS (
            SELECT j.j, i.i,
                   CASE WHEN (strpos('0123456789abcdef',
                              substr(sha256('plane:{seed}:'
                                     || CAST(j.j AS VARCHAR) || ':'
                                     || CAST(i.i AS VARCHAR)), 1, 1))
                              - 1) % 2 = 1
                        THEN 1.0 ELSE -1.0 END AS s
            FROM (SELECT unnest(range(0, {total_bits})) AS j) j,
                 (SELECT unnest(range(1,
                      (SELECT max(len(embedding)) FROM embeddings) + 1))
                      AS i) i),
        dots AS (
            SELECT e.vec_id, s.j, SUM(e.v[s.i] * s.s) AS d
            FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                  FROM embeddings) e
            JOIN signs s ON s.i <= len(e.v)
            GROUP BY e.vec_id, s.j)
"""


def knn_lsh_sql(query_ids: list[int], k: int, nbits: int = 8,
                seed: int = 42) -> str:
    """DuckDB oracle for ``knn_lsh``: replays the deterministic SRP
    bucketing (sign of Σ v[i]·plane[j,i] > 0, bit j weight 2^j), the
    own+Hamming-1 probe set (xor single-bit flips), and the exact
    cosine top-k with (cos desc, id asc) tiebreak."""
    qids = ", ".join(str(int(q)) for q in query_ids)
    signs = _SIGNS_SQL.format(seed=seed, total_bits=nbits)
    return f"""
        WITH {signs},
        bkts AS (
            SELECT vec_id,
                   CAST(SUM(CASE WHEN d > 0 THEN power(2, j)
                            ELSE 0 END) AS BIGINT) AS bucket
            FROM dots GROUP BY vec_id),
        q AS (SELECT vec_id AS query_id, bucket FROM bkts
              WHERE vec_id IN ({qids})),
        probes AS (
            SELECT query_id, bucket AS pb FROM q
            UNION ALL
            SELECT query_id,
                   xor(bucket, CAST(power(2, f.f) AS BIGINT))
            FROM q, (SELECT unnest(range(0, {nbits})) AS f) f),
        cand AS (
            SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
            FROM probes p JOIN bkts c ON c.bucket = p.pb
            WHERE c.vec_id <> p.query_id),
        sims AS (
            SELECT cand.query_id, cand.neighbor_id,
                   list_cosine_similarity(
                       CAST(qe.embedding AS DOUBLE[]),
                       CAST(ne.embedding AS DOUBLE[])) AS cs
            FROM cand
            JOIN embeddings qe ON qe.vec_id = cand.query_id
            JOIN embeddings ne ON ne.vec_id = cand.neighbor_id),
        ranked AS (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cs DESC,
                                               neighbor_id ASC) AS rnk
            FROM sims)
        SELECT query_id, neighbor_id, rnk FROM ranked WHERE rnk <= {k}
    """


_SRP_HASHER_CACHE: dict = {}


def _bucketize_srp(t: pa.Table, *, nbits: int, seed: int) -> pa.Table:
    """(vec_id, packed normalized vec, SRP bucket) per row — the
    hasher is built once per worker process per (dim, nbits, seed)."""
    m = _normalize(list_matrix(t.column("embedding")))
    key = (m.shape[1], nbits, seed)
    h = _SRP_HASHER_CACHE.get(key)
    if h is None:
        h = _SRP_HASHER_CACHE[key] = _HyperplaneHasher(*key)
    return pa.table({
        "vec_id": t.column("vec_id"),
        "vec": pack_rows(m),
        "bucket": pa.array(h.sign_bits(m)),
    })


def knn_lsh(embs, query_ids: list[int], k: int = 10, nbits: int = 8,
            seed: int = 42, num_partitions: int | None = None
            ) -> pa.Table:
    """LSH-bucketed approximate top-k (probes own + Hamming-1 buckets).

    Scale shape (no per-bucket map_groups, no pandas hop): the corpus
    buckets ONCE — each vector lands in exactly one bucket, its
    normalized vector packed as ``binary`` (Acero joins reject list<>
    payloads); the tiny (bucket, query) PROBE table — one row per
    query per probed bucket, Q*(nbits+1) rows total — hash-joins onto
    the bucketed corpus, so only the query side fans out and per-
    partition work is bounded by the join partitioning, never by a
    bucket's group size. Cosine + per-batch partial top-k run
    vectorized inside map_batches; the driver merges <= Q*k candidate
    rows per batch.

    Same output schema as knn_bruteforce (cos_sim unrounded);
    approximate — compare by recall, not equality.
    """
    from ..stages.join import hash_join

    ds = _to_ds(embs)
    # STATELESS-TASK bucketizer: the hasher is deterministic from
    # (dim, nbits, seed) and dim is visible in every batch, so each
    # worker process builds it lazily ONCE (module cache) — no
    # driver-side take(1) probe, no ray.put, no actor-pool spin-up.
    bucketed = ds.map_batches(_bucketize_srp,
                              fn_kwargs={"nbits": nbits, "seed": seed},
                              batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    if bucketed.count() == 0:
        raise ValueError("empty embeddings dataset")

    # probe table from the query rows (filtered scan — only the query
    # rows reach the driver): own bucket + all Hamming-1 neighbors
    qrows = _fetch_rows(bucketed, query_ids)
    missing = set(query_ids) - {r["vec_id"] for r in qrows}
    if missing:
        raise ValueError(f"query_ids not found in dataset: "
                         f"{sorted(missing)}")
    pb, pq, pv = [], [], []
    for r in qrows:
        b = r["bucket"]
        for tgt in [b] + [b ^ (1 << i) for i in range(nbits)]:
            pb.append(tgt)
            pq.append(r["vec_id"])
            pv.append(r["vec"])
    probes = rd.from_arrow(pa.table({
        "pbucket": pa.array(pb, pa.int64()),
        "query_id": pa.array(pq, pa.int64()),
        "qvec": pa.array(pv, pa.binary()),
    }))
    return _probe_join_topk(bucketed, probes, k, num_partitions)


def _probe_join_topk(bucketed, probes, k: int,
                     num_partitions: int | None) -> pa.Table:
    """Shared tail of the bucketed-ANN paths (LSH and IVF): hash-join
    the (pbucket, query_id, qvec) probe table onto the (bucket,
    vec_id, vec) corpus, verify cosine + partial top-k vectorized per
    batch, merge <= Q*k rows per batch on the driver."""
    from ..stages.join import default_join_partitions, hash_join

    if num_partitions is None:
        # size the join to the DATA, not the cluster: the probe side
        # is Q*(probes) rows and the corpus is materialized upstream
        # (count is metadata) — a cluster-wide aggregator pool on a
        # small corpus multiplies the join's fixed cost for nothing
        num_partitions = int(max(8, min(default_join_partitions(),
                                        bucketed.count() // 500_000)))

    def verify(t: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "cos_sim": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        vid = t.column("vec_id").to_numpy()
        qid = t.column("query_id").to_numpy()
        v = binary_matrix(t.column("vec"))
        qv = binary_matrix(t.column("qvec"))
        sims = np.einsum("ij,ij->i", v, qv)
        keep = vid != qid              # drop self-matches
        vid, qid, sims = vid[keep], qid[keep], sims[keep]
        if not len(vid):
            return empty
        # partial top-k per query: order (qid asc, sim desc, id asc),
        # keep each query's first k rows of this batch
        order = np.lexsort((vid, -sims, qid))
        qs = qid[order]
        starts = np.flatnonzero(
            np.concatenate(([True], qs[1:] != qs[:-1])))
        counts = np.diff(np.concatenate((starts, [len(qs)])))
        rank = np.arange(len(qs)) - np.repeat(starts, counts)
        sel = order[rank < k]
        return pa.table({"query_id": pa.array(qid[sel]),
                         "neighbor_id": pa.array(vid[sel]),
                         "cos_sim": pa.array(sims[sel])})

    cand = hash_join(bucketed, probes, on=("bucket",),
                     right_on=("pbucket",),
                     num_partitions=num_partitions
                     ).map_batches(verify, batch_format="pyarrow",
                                   zero_copy_batch=True)
    df = cand.to_pandas().drop_duplicates(["query_id", "neighbor_id"])
    df = df.sort_values(["query_id", "cos_sim", "neighbor_id"],
                        ascending=[True, False, True], kind="stable")
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rnk"] = df.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(df, preserve_index=False)


def kmeans_fit(sample: np.ndarray, n_clusters: int, iters: int = 10,
               seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd k-means on UNIT vectors (cosine = dot);
    returns L2-normalized centroids. Runs on a BOUNDED sample on the
    driver — the IVF coarse quantizer's training cost must not grow
    with the corpus."""
    rng = np.random.RandomState(seed)
    n = len(sample)
    cent = sample[rng.choice(n, size=min(n_clusters, n),
                             replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-300)
    return cent


def knn_ivf(embs, query_ids: list[int], k: int = 10,
            n_clusters: int = 16, n_probe: int = 4,
            sample_size: int = 2048, seed: int = 42,
            num_partitions: int | None = None) -> pa.Table:
    """IVF (inverted-file) approximate top-k — the second scale path
    next to ``knn_lsh``: a coarse k-means quantizer trained on a
    deterministic bounded sample buckets the corpus (one list per
    centroid); each query probes its ``n_probe`` nearest centroids.

    Stages: (1) sample scan -> driver k-means (O(sample) only);
    (2) broadcast centroids, assign buckets vectorized per batch;
    (3) tiny (bucket, query) probe table hash-joins onto the bucketed
    corpus; (4) shared vectorized verify + partial top-k
    (``_probe_join_topk``). Approximate — recall-tested against brute
    force. Same output schema as knn_bruteforce.
    """
    ds = _to_ds(embs)
    first = ds.take(1)
    if not first:
        raise ValueError("empty embeddings dataset")

    # deterministic sample: every step-th vec_id (filtered scan)
    n_rows = ds.count()
    step = max(1, n_rows // sample_size)

    def pick_sample(t: pa.Table) -> pa.Table:
        vid = t.column("vec_id").to_numpy()
        return t.filter(pa.array(vid % step == 0))

    sample_rows = ds.map_batches(pick_sample, batch_format="pyarrow",
                                 zero_copy_batch=True).take_all()
    sample = _normalize(np.stack([
        np.asarray(r["embedding"], np.float64) for r in sample_rows]))
    cent = kmeans_fit(sample, n_clusters, seed=seed)
    # broadcast centroids once; stateless tasks read the local plasma
    # copy per batch (same rationale as knn_bruteforce's partial_topk)
    cref = ray.put(cent)

    def assign(t: pa.Table, *, cref) -> pa.Table:
        cent = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
        m = _normalize(list_matrix(t.column("embedding")))
        bucket = np.argmax(m @ cent.T, axis=1).astype(np.int64)
        return pa.table({
            "vec_id": t.column("vec_id"),
            "vec": pack_rows(m),
            "bucket": pa.array(bucket),
        })

    bucketed = ds.map_batches(assign, fn_kwargs={"cref": cref},
                              batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    qrows = _fetch_rows(bucketed, query_ids)
    missing = set(query_ids) - {r["vec_id"] for r in qrows}
    if missing:
        raise ValueError(f"query_ids not found in dataset: "
                         f"{sorted(missing)}")
    npb = min(n_probe, len(cent))
    pb, pq, pv = [], [], []
    for r in qrows:
        qv = np.frombuffer(r["vec"], np.float64)
        near = np.argsort(-(cent @ qv), kind="stable")[:npb]
        for tgt in near:
            pb.append(int(tgt))
            pq.append(r["vec_id"])
            pv.append(r["vec"])
    probes = rd.from_arrow(pa.table({
        "pbucket": pa.array(pb, pa.int64()),
        "query_id": pa.array(pq, pa.int64()),
        "qvec": pa.array(pv, pa.binary()),
    }))
    return _probe_join_topk(bucketed, probes, k, num_partitions)


def label_centroids(sf_dir: str, round_to: int = 6):
    """Per-label mean embedding (class prototypes), as one
    (label, dim, centroid) row per vector component.

    Vector-column aggregation with a per-batch combiner: each batch
    scatter-adds its vectors into per-label partial sums (numpy
    add.at), so the groupby shuffle carries labels x dims partial
    rows per batch — never the vectors. centroid rounds to
    ``round_to`` decimals for cross-engine float parity (sum order
    differs; quotient error ~1e-14 << the rounding grid).
    """

    def partial(t: pa.Table) -> pa.Table:
        lab = t.column("label").to_numpy().astype(np.int64)
        m = list_matrix(t.column("embedding"))
        labs, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(labs), m.shape[1]), np.float64)
        np.add.at(sums, inv, m)
        cnts = np.bincount(inv, minlength=len(labs)).astype(np.int64)
        d = m.shape[1]
        return pa.table({
            "label": pa.array(np.repeat(labs, d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    len(labs))),
            "s": pa.array(sums.ravel()),
            "cnt": pa.array(np.repeat(cnts, d)),
        })

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])
    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["label", "dim"]).sum(["s", "cnt"]))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "centroid": pa.array([], pa.float64())})
        s = t.column("sum(s)").to_numpy()
        c = t.column("sum(cnt)").to_numpy()
        return pa.table({
            "label": t.column("label"),
            "dim": t.column("dim"),
            "centroid": pa.array(np.round(s / c, round_to)),
        })

    return out.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


LABEL_CENTROIDS_SQL = """
    SELECT CAST(e.label AS BIGINT) AS label, i.i AS dim,
           ROUND(SUM(e.v[i.i]) / COUNT(*), 6) AS centroid
    FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings) e,
         (SELECT unnest(range(1,
              (SELECT max(len(embedding)) FROM embeddings) + 1))
              AS i) i
    WHERE i.i <= len(e.v)
    GROUP BY e.label, i.i
"""
