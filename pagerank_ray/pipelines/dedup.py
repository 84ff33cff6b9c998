"""Deduplication operators for training-data pipelines.

Five dedup families (SURVEY-extension mandated by the build brief),
each streaming over the ``documents`` table:

  exact_dedup           sha256(text) hash-partition groupby -> min doc_id
  ngram_jaccard_pairs   EXACT all-pairs word-n-gram Jaccard (the oracle
                        for the approximate families; O(Σ hot-gram d²)
                        pair blowup documented — LSH is the scale path)
  minhash_lsh_pairs     MinHash signatures -> banded LSH buckets ->
                        candidate pairs -> exact-Jaccard verification
  simhash_pairs         64-bit SimHash -> 16-bit band buckets ->
                        Hamming-verified pairs
  embedding_cosine_pairs near-dup pairs by cosine over an embedding
                        column (brute-force verify; LSH-bucketed at scale)

All pair outputs are canonical (a < b), sorted, with integer columns
(int intersection/union sizes instead of float Jaccard where a DuckDB
oracle compares value hashes).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


import ray
import ray.data as rd

from ..functions.hashing import (MinHasher, band_keys, hamming64, jaccard,
                                 shingle_hashes, simhash64, word_shingles)


def _to_ds(x):
    return rd.from_arrow(x) if isinstance(x, pa.Table) else x


# ---------------------------------------------------------------- exact

def exact_dedup(docs) -> pa.Table:
    """Keep min doc_id per distinct text. Returns (doc_id) sorted.

    Hash first (sha256 inside map_batches) so the groupby shuffles
    64-char keys, not document bodies.
    """
    ds = _to_ds(docs)

    def hash_batch(t: pa.Table) -> pa.Table:
        hs = [hashlib.sha256(x.encode("utf-8")).hexdigest()
              for x in t.column("text").to_pylist()]
        return pa.table({"h": pa.array(hs, pa.string()),
                         "doc_id": t.column("doc_id")})

    kept = (ds.map_batches(hash_batch, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("h").min("doc_id"))
    ids = sorted(r["min(doc_id)"] for r in kept.take_all())
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


# ------------------------------------------------- exact n-gram Jaccard

def _explode_grams(t: pa.Table, n: int) -> pa.Table:
    gram_out, id_out = [], []
    for doc_id, text in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
        for g in set(word_shingles(text, n)):
            gram_out.append(g)
            id_out.append(doc_id)
    return pa.table({"gram": pa.array(gram_out, pa.string()),
                     "doc_id": pa.array(id_out, pa.int64())})


def ngram_jaccard_pairs(docs, n: int = 3, threshold: float = 0.8) -> pa.Table:
    """Exact all-pairs Jaccard over distinct word n-grams.

    Returns (a, b, inter_size, union_size) for pairs with
    inter/union >= threshold, sorted by (a, b).
    """
    ds = _to_ds(docs)
    grams = ds.map_batches(lambda t: _explode_grams(t, n),
                           batch_format="pyarrow", zero_copy_batch=True)
    grams = grams.materialize()

    sizes_rows = grams.groupby("doc_id").count().take_all()
    sizes = {r["doc_id"]: r["count()"] for r in sizes_rows}
    sizes_ref = ray.put(sizes)

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        k = len(ids)
        if k < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        iu, ju = np.triu_indices(k, k=1)
        return pd.DataFrame({"a": ids[iu], "b": ids[ju]})

    inter = (grams.groupby("gram").map_groups(pairs_in_group,
                                              batch_format="pandas")
             .groupby(["a", "b"]).count())

    class Verify:
        def __init__(self, sizes_ref, threshold):
            self.sizes = ray.get(sizes_ref) if isinstance(
                sizes_ref, ray.ObjectRef) else sizes_ref
            self.threshold = threshold

        def __call__(self, t: pa.Table) -> pa.Table:
            a = t.column("a").to_numpy()
            b = t.column("b").to_numpy()
            inter_n = t.column("count()").to_numpy()
            sa = np.array([self.sizes[x] for x in a])
            sb = np.array([self.sizes[x] for x in b])
            union_n = sa + sb - inter_n
            keep = inter_n >= self.threshold * union_n
            return pa.table({
                "a": pa.array(a[keep]), "b": pa.array(b[keep]),
                "inter_size": pa.array(inter_n[keep].astype(np.int64)),
                "union_size": pa.array(union_n[keep].astype(np.int64)),
            })

    out = inter.map_batches(Verify, fn_constructor_args=(sizes_ref,
                                                         threshold),
                            batch_format="pyarrow", concurrency=(1, 4))
    res = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return res.sort_by([("a", "ascending"), ("b", "ascending")])


# --------------------------------------------------------- MinHash+LSH

def minhash_lsh_pairs(docs, n: int = 3, num_perm: int = 128,
                      num_bands: int = 16,
                      threshold: float = 0.8) -> pa.Table:
    """MinHash banding candidates, exact-Jaccard verified.

    Returns (a, b, jaccard) sorted. The verification step broadcasts
    the doc -> shingle-hash sets (small at test scale; at 100 TB the
    verify becomes a bucketed join of candidate pairs back to shingle
    sets — same contract).
    """
    ds = _to_ds(docs).materialize()

    sigs = ds.map_batches(MinHasher, fn_constructor_args=(num_perm, n),
                          batch_format="pyarrow", concurrency=(1, 4))

    def explode_bands(t: pa.Table) -> pa.Table:
        band_out, key_out, id_out = [], [], []
        for doc_id, sig in zip(t.column("doc_id").to_pylist(),
                               t.column("minhash").to_pylist()):
            keys = band_keys(np.asarray(sig, dtype=np.int64).view(np.uint64),
                             num_bands)
            for bi, kv in enumerate(keys):
                band_out.append(bi)
                key_out.append(np.int64(kv.astype(np.int64)))
                id_out.append(doc_id)
        return pa.table({"band": pa.array(band_out, pa.int32()),
                         "key": pa.array(key_out, pa.int64()),
                         "doc_id": pa.array(id_out, pa.int64())})

    buckets = sigs.map_batches(explode_bands, batch_format="pyarrow")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        iu, ju = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[iu], "b": ids[ju]})

    cands = (buckets.groupby(["band", "key"])
             .map_groups(pairs_in_bucket, batch_format="pandas")
             .groupby(["a", "b"]).count())

    # broadcast shingle sets for exact verification
    shingle_map = {}
    for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            shingle_map[doc_id] = np.sort(shingle_hashes(text, n))
    sh_ref = ray.put(shingle_map)

    class VerifyJac:
        def __init__(self, sh_ref, threshold):
            self.sh = ray.get(sh_ref) if isinstance(
                sh_ref, ray.ObjectRef) else sh_ref
            self.threshold = threshold

        def __call__(self, t: pa.Table) -> pa.Table:
            a = t.column("a").to_pylist()
            b = t.column("b").to_pylist()
            keep_a, keep_b, jac = [], [], []
            for x, y in zip(a, b):
                j = jaccard(self.sh[x], self.sh[y])
                if j >= self.threshold:
                    keep_a.append(x)
                    keep_b.append(y)
                    jac.append(j)
            return pa.table({"a": pa.array(keep_a, pa.int64()),
                             "b": pa.array(keep_b, pa.int64()),
                             "jaccard": pa.array(jac, pa.float64())})

    out = cands.map_batches(VerifyJac, fn_constructor_args=(sh_ref,
                                                            threshold),
                            batch_format="pyarrow", concurrency=(1, 4))
    res = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return res.sort_by([("a", "ascending"), ("b", "ascending")])


# -------------------------------------------------------------- SimHash

def simhash_pairs(docs, max_hamming: int = 3) -> pa.Table:
    """SimHash near-dup pairs: 4×16-bit band buckets, Hamming-verified.

    A pair within Hamming distance <= 3 shares at least one exact
    16-bit band (pigeonhole), so banding is recall-lossless for
    max_hamming <= 3. Returns (a, b, hamming) sorted.
    """
    ds = _to_ds(docs)

    def sims(t: pa.Table) -> pa.Table:
        vals = [np.int64(simhash64(x).astype(np.int64))
                for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "simhash": pa.array(vals, pa.int64())})

    sh = ds.map_batches(sims, batch_format="pyarrow", zero_copy_batch=True)

    def explode(t: pa.Table) -> pa.Table:
        band_out, key_out, id_out, sh_out = [], [], [], []
        for doc_id, v in zip(t.column("doc_id").to_pylist(),
                             t.column("simhash").to_pylist()):
            u = int(np.int64(v).view(np.uint64))
            for bi in range(4):
                key = (u >> (16 * bi)) & 0xFFFF
                band_out.append(bi)
                key_out.append(key)
                id_out.append(doc_id)
                sh_out.append(v)
        return pa.table({"band": pa.array(band_out, pa.int32()),
                         "key": pa.array(key_out, pa.int32()),
                         "doc_id": pa.array(id_out, pa.int64()),
                         "simhash": pa.array(sh_out, pa.int64())})

    buckets = sh.map_batches(explode, batch_format="pyarrow")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sub = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = sub["doc_id"].to_numpy()
        vals = sub["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        k = len(ids)
        if k < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        iu, ju = np.triu_indices(k, k=1)
        d = hamming64(vals[iu], vals[ju])
        keep = d <= max_hamming
        return pd.DataFrame({"a": ids[iu][keep], "b": ids[ju][keep],
                             "hamming": d[keep]})

    pairs = (buckets.groupby(["band", "key"])
             .map_groups(pairs_in_bucket, batch_format="pandas")
             .groupby(["a", "b"]).min("hamming"))
    rows = sorted((r["a"], r["b"], r["min(hamming)"])
                  for r in pairs.take_all())
    return pa.table({
        "a": pa.array([r[0] for r in rows], pa.int64()),
        "b": pa.array([r[1] for r in rows], pa.int64()),
        "hamming": pa.array([r[2] for r in rows], pa.int64()),
    })


# ------------------------------------------------- embedding near-dup

def embedding_cosine_pairs(embs, threshold: float = 0.95) -> pa.Table:
    """Near-duplicate pairs by cosine similarity over an embedding
    column (vec_id, embedding: list<float>).

    Brute-force verify against the broadcast normalized matrix — the
    correct baseline; the LSH-bucketed variant in similarity.py is the
    scale path. Returns (a, b) int pairs sorted (float-free output for
    oracle hash parity).
    """
    ds = _to_ds(embs)
    mat_rows = ds.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in mat_rows], dtype=np.int64)
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                    for r in mat_rows])
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1)
    mat = mat / np.maximum(norms, 1e-300)[:, None]
    ref = ray.put((ids, mat))

    class CosPairs:
        def __init__(self, ref, threshold):
            self.ids, self.mat = ray.get(ref) if isinstance(
                ref, ray.ObjectRef) else ref
            self.threshold = threshold

        def __call__(self, t: pa.Table) -> pa.Table:
            bid = t.column("vec_id").to_numpy()
            bm = np.stack([np.asarray(v, dtype=np.float64)
                           for v in t.column("embedding").to_pylist()])
            bm = bm / np.maximum(np.linalg.norm(bm, axis=1),
                                 1e-300)[:, None]
            sims = bm @ self.mat.T
            rows, cols = np.nonzero(sims >= self.threshold)
            a = bid[rows]
            b = self.ids[cols]
            keep = a < b
            return pa.table({"a": pa.array(a[keep]),
                             "b": pa.array(b[keep])})

    out = ds.map_batches(CosPairs, fn_constructor_args=(ref, threshold),
                         batch_format="pyarrow", concurrency=(1, 4))
    res = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return res.sort_by([("a", "ascending"), ("b", "ascending")])
