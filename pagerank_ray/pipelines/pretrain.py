"""End-to-end pretraining-corpus preparation — the composition this
engine exists for, every stage one of its tested operators:

  1. near-dup CLUSTER dedup (MinHash+LSH pairs -> distributed
     connected components -> keep each cluster's canonical member;
     subsumes exact dedup, since identical texts share a cluster),
  2. language gate,
  3. token-count band,
  4. deterministic sha256 sampling,
  5. optional lang-partitioned parquet output (one directory per
     language, many files per partition — a failed run reruns only
     missing shards, never one giant file).

The whole composition is DuckDB-expressible (recursive CTE over the
near-dup pair graph + the curation predicates), so the driver
verifies the END-TO-END result, not just the pieces.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions.text import token_count
from .curation import _sha256_buckets
from .dedup import dedup_clusters


def prepare_corpus(sf_dir: str, lang: str = "en",
                   min_tokens: int = 20, max_tokens: int = 2000,
                   sample_pct: int = 50,
                   dedup_threshold: float = 0.5,
                   out_dir: str | None = None):
    """-> Dataset of kept documents (doc_id, lang, n_tokens).

    The cluster stage's heavy work (shingling, banded candidate
    joins, Jaccard verify, CC iterations) is fully distributed; the
    canonical-keeper id set (<= one id per document, ids only)
    broadcasts once via ray.put — the same small-side pattern as
    curation's broadcast mode (its ``keeper_mode="join"`` semi-join
    is the 100-TB alternative). The filter pass streams: one
    vectorized is_in + lang + token-band + sha256-bucket mask per
    batch.

    With ``out_dir``, the kept documents (incl. text) are written as
    lang-partitioned parquet via ``partition_cols``.
    """
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    clusters = dedup_clusters(docs, threshold=dedup_threshold)
    keep_mask = pc.equal(clusters.column("doc_id"),
                         clusters.column("canonical_id"))
    keep_ref = ray.put(clusters.column("doc_id").filter(keep_mask)
                       .combine_chunks())

    # stateless tasks: the broadcast keeper set is a zero-copy plasma
    # get per batch — no actor-pool spin-up for a lookup ref
    def keep_batch(t: pa.Table, *, keep_ref, lang, lo, hi,
                   pct) -> pa.Table:
        keep_ids = ray.get(keep_ref) if isinstance(
            keep_ref, ray.ObjectRef) else keep_ref
        ntok = token_count(t.column("text"))
        mask = pc.is_in(t.column("doc_id"),
                        value_set=keep_ids).to_numpy(
                            zero_copy_only=False)
        mask &= pc.equal(t.column("lang"), pa.scalar(
            lang)).to_numpy(zero_copy_only=False)
        nt = ntok.to_numpy()
        mask &= (nt >= lo) & (nt <= hi)
        mask &= _sha256_buckets(
            t.column("text").to_pylist()) < pct
        return t.append_column("n_tokens", ntok).filter(
            pa.array(mask))

    kept = docs.map_batches(
        keep_batch,
        fn_kwargs={"keep_ref": keep_ref, "lang": lang,
                   "lo": min_tokens, "hi": max_tokens,
                   "pct": sample_pct},
        batch_format="pyarrow", zero_copy_batch=True)

    if out_dir is not None:
        kept.write_parquet(out_dir, partition_cols=["lang"])

    return kept.select_columns(["doc_id", "lang", "n_tokens"])


def prepare_corpus_sql(lang: str = "en", min_tokens: int = 20,
                       max_tokens: int = 2000, sample_pct: int = 50,
                       grams_sql: str | None = None) -> str:
    """End-to-end oracle: cluster-canonical keepers via recursive CTE
    over the exact-Jaccard pair graph (== LSH candidates at these
    thresholds, as for minhash_lsh) + the curation predicates.
    ``grams_sql`` is the shared word-3-gram relation (doc_id, g)."""
    grams = grams_sql or r"""
        SELECT DISTINCT doc_id,
               w[i.i] || ' ' || w[i.i+1] || ' ' || w[i.i+2] AS g
        FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS w
              FROM documents),
             (SELECT unnest(range(1, 100000)) AS i) i
        WHERE i.i + 2 <= len(w)
    """
    return f"""
        WITH RECURSIVE grams AS ({grams}),
             sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams
                       GROUP BY doc_id),
             inter AS (SELECT a.doc_id AS a, b.doc_id AS b,
                              COUNT(*) AS i
                       FROM grams a JOIN grams b
                         ON a.g = b.g AND a.doc_id < b.doc_id
                       GROUP BY 1, 2),
             pairs AS (SELECT inter.a, inter.b
                       FROM inter
                       JOIN sizes sa ON sa.doc_id = inter.a
                       JOIN sizes sb ON sb.doc_id = inter.b
                       WHERE inter.i >=
                             0.5 * (sa.sz + sb.sz - inter.i)),
             und AS (SELECT a AS u, b AS v FROM pairs
                     UNION SELECT b, a FROM pairs),
             r AS (SELECT doc_id AS node, doc_id AS lab
                   FROM documents
                   UNION
                   SELECT und.v AS node, r.lab
                   FROM r JOIN und ON und.u = r.node),
             canon AS (SELECT node AS doc_id, min(lab) AS canonical
                       FROM r GROUP BY node),
             keep AS (SELECT doc_id FROM canon
                      WHERE doc_id = canonical)
        SELECT d.doc_id, d.lang,
               len(regexp_extract_all(d.text, '\\S+')) AS n_tokens
        FROM documents d JOIN keep k ON k.doc_id = d.doc_id
        WHERE d.lang = '{lang}'
          AND len(regexp_extract_all(d.text, '\\S+'))
              BETWEEN {min_tokens} AND {max_tokens}
          AND CAST(('0x' || substr(sha256(d.text), 1, 8)) AS UBIGINT)
              % 100 < {sample_pct}
    """
