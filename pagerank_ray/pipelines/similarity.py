"""Approximate-nearest-neighbor search over an embedding column.

``knn_bruteforce`` — the correctness baseline: the (small) query
matrix is broadcast once with ray.put; every batch computes a float64
cosine block-matmul against it and emits per-batch top-k candidates;
the driver merges the tiny candidate set. One pass over the data, no
shuffle.

``knn_lsh`` — the scale path: random-hyperplane LSH signatures bucket
the corpus (groupby shuffle keyed on the signature); queries probe
their own bucket plus all Hamming-1 neighbors. Approximate — recall
is tested against the brute-force baseline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


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
    qref = ray.put((qids, qmat))

    class PartialTopK:
        def __init__(self, qref, k):
            self.qids, self.qmat = ray.get(qref) if isinstance(
                qref, ray.ObjectRef) else qref
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            bid = t.column("vec_id").to_numpy()
            bm = _normalize(np.stack([
                np.asarray(v, dtype=np.float64)
                for v in t.column("embedding").to_pylist()]))
            sims = self.qmat @ bm.T                     # (Q, B)
            # mask self-matches
            for qi, qv in enumerate(self.qids):
                sims[qi, bid == qv] = -np.inf
            kk = min(self.k, sims.shape[1])
            # per query: top-k by (sim desc, id asc)
            idx = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
            q_out = np.repeat(self.qids, kk)
            n_out = bid[idx].ravel()
            s_out = np.take_along_axis(sims, idx, axis=1).ravel()
            keep = np.isfinite(s_out)
            return pa.table({"query_id": pa.array(q_out[keep]),
                             "neighbor_id": pa.array(n_out[keep]),
                             "cos_sim": pa.array(s_out[keep])})

    partial = ds.map_batches(PartialTopK, fn_constructor_args=(qref, k),
                             batch_format="pyarrow", concurrency=(1, 4))
    cand = partial.to_pandas()
    cand = cand.sort_values(["query_id", "cos_sim", "neighbor_id"],
                            ascending=[True, False, True], kind="stable")
    cand = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    cand["rnk"] = cand.groupby("query_id").cumcount() + 1
    if round_to is not None:
        cand["cos_sim"] = cand["cos_sim"].round(round_to)
    return pa.Table.from_pandas(cand, preserve_index=False)


class _HyperplaneHasher:
    def __init__(self, dim: int, nbits: int = 8, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(nbits, dim)
        self.nbits = nbits

    def sign_bits(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes.T) > 0
        weights = (1 << np.arange(self.nbits)).astype(np.int64)
        return bits.astype(np.int64) @ weights


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
    first = ds.take(1)   # one block executes, not the dataset
    if not first:
        raise ValueError("empty embeddings dataset")
    dim = len(first[0]["embedding"])
    hasher = _HyperplaneHasher(dim, nbits, seed)
    href = ray.put(hasher)

    class Bucketize:
        def __init__(self, href):
            self.h = ray.get(href) if isinstance(
                href, ray.ObjectRef) else href

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _normalize(np.stack([
                np.asarray(v, dtype=np.float64)
                for v in t.column("embedding").to_pylist()]))
            return pa.table({
                "vec_id": t.column("vec_id"),
                "vec": pa.array([row.tobytes() for row in m],
                                pa.binary()),
                "bucket": pa.array(self.h.sign_bits(m)),
            })

    bucketed = ds.map_batches(Bucketize, fn_constructor_args=(href,),
                              batch_format="pyarrow",
                              concurrency=(1, 4)).materialize()

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

    def verify(t: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "cos_sim": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        vid = t.column("vec_id").to_numpy()
        qid = t.column("query_id").to_numpy()
        v = np.frombuffer(b"".join(t.column("vec").to_pylist()),
                          np.float64).reshape(len(vid), -1)
        qv = np.frombuffer(b"".join(t.column("qvec").to_pylist()),
                           np.float64).reshape(len(vid), -1)
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
