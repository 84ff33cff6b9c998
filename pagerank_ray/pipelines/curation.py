"""End-to-end corpus curation — the training-data flagship composition.

Chains the engine's operators the way a 100 TB pretraining pipeline
would: exact dedup -> language filter -> quality gate -> deterministic
hash sampling, all streaming, all SQL-oracle-expressible so the driver
verifies the WHOLE composition, not just the pieces.

Deterministic sampling uses the first 8 hex chars of sha256(text) as
an integer mod 100 — reproducible across engines and runs (unlike
random_sample), and DuckDB-parity-checked
(CAST('0x'||substr(sha256(text),1,8) AS UBIGINT) % 100).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.text import quality_counts_batch


def hash_bucket_batch(t: pa.Table, key: str = "text") -> pa.Table:
    """Add a deterministic [0,100) bucket from sha256(key)."""
    buckets = [
        int(hashlib.sha256(x.encode("utf-8")).hexdigest()[:8], 16) % 100
        for x in t.column(key).to_pylist()]
    return t.append_column("bucket", pa.array(buckets, pa.int64()))


def hash_sample(docs_ds, pct: int, key: str = "text"):
    """Keep rows whose sha256-derived bucket < pct (deterministic)."""

    def flt(t: pa.Table) -> pa.Table:
        t = hash_bucket_batch(t, key)
        keep = pc.less(t.column("bucket"), pa.scalar(pct))
        return t.filter(keep).drop_columns(["bucket"])

    return docs_ds.map_batches(flt, batch_format="pyarrow",
                               zero_copy_batch=True)


def curate_documents(sf_dir: str, lang: str = "en",
                     min_tokens: int = 20, max_tokens: int = 2000,
                     sample_pct: int = 50):
    """-> Dataset of curated (doc_id): dedup ∩ lang ∩ quality ∩ sample.

    Stages stream in one pipeline; the dedup keeper set (min doc_id
    per distinct text) is computed with a groupby and broadcast as a
    filter set (small relative to the corpus).
    """
    from ..pipelines.dedup import exact_dedup

    import ray

    keepers = exact_dedup(rd.read_parquet(f"{sf_dir}/documents.parquet"))
    keep_ref = ray.put(set(keepers.column("doc_id").to_pylist()))

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])

    class Curate:
        def __init__(self, keep_ref, lang, lo, hi, pct):
            self.keep = ray.get(keep_ref) if isinstance(
                keep_ref, ray.ObjectRef) else keep_ref
            self.lang = lang
            self.lo, self.hi, self.pct = lo, hi, pct

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            mask = np.array([i in self.keep for i in ids])
            mask &= pc.equal(t.column("lang"),
                             pa.scalar(self.lang)).to_numpy(
                                 zero_copy_only=False)
            q = quality_counts_batch(t)
            ntok = q.column("n_tokens").to_numpy()
            mask &= (ntok >= self.lo) & (ntok <= self.hi)
            buckets = np.array([
                int(hashlib.sha256(x.encode()).hexdigest()[:8], 16) % 100
                for x in t.column("text").to_pylist()])
            mask &= buckets < self.pct
            return pa.table({"doc_id": pa.array(ids[mask])})

    return docs.map_batches(
        Curate, fn_constructor_args=(keep_ref, lang, min_tokens,
                                     max_tokens, sample_pct),
        batch_format="pyarrow", concurrency=(1, 4))


CURATE_SQL = r"""
    WITH keepers AS (SELECT min(doc_id) AS doc_id FROM documents
                     GROUP BY text)
    SELECT d.doc_id
    FROM documents d JOIN keepers k ON k.doc_id = d.doc_id
    WHERE d.lang = '{lang}'
      AND len(regexp_extract_all(d.text, '\S+'))
          BETWEEN {min_tokens} AND {max_tokens}
      AND CAST(('0x' || substr(sha256(d.text), 1, 8)) AS UBIGINT)
          % 100 < {sample_pct}
"""
