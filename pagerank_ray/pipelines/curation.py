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


def _sha256_buckets(texts: list[str]) -> np.ndarray:
    """[0,100) bucket per text from the first 4 sha256 bytes.

    hashlib releases the GIL per call and the arithmetic is numpy —
    the per-row loop is just the digest calls (sha256 of variable-
    length strings has no batch kernel anywhere)."""
    raw = np.empty(len(texts), dtype=np.uint32)
    for i, x in enumerate(texts):
        raw[i] = int.from_bytes(
            hashlib.sha256(x.encode("utf-8")).digest()[:4], "big")
    return (raw % 100).astype(np.int64)


def hash_bucket_batch(t: pa.Table, key: str = "text") -> pa.Table:
    """Add a deterministic [0,100) bucket from sha256(key)."""
    buckets = _sha256_buckets(t.column(key).to_pylist())
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
                     sample_pct: int = 50,
                     keeper_mode: str = "broadcast"):
    """-> Dataset of curated (doc_id): dedup ∩ lang ∩ quality ∩ sample.

    Stages stream in one pipeline. The dedup keeper set (min doc_id
    per distinct text) is applied either as a broadcast ``pc.is_in``
    filter (``keeper_mode="broadcast"`` — ids only, small relative to
    the corpus) or as a partitioned semi-join on doc_id
    (``keeper_mode="join"`` — the 100-TB path: the keeper set never
    touches the driver).
    """
    import ray

    from ..stages.join import hash_join

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])

    def filters(t: pa.Table) -> pa.Table:
        """lang ∩ token-band ∩ deterministic sample — all vectorized
        except the per-row sha256 digests (no batch kernel exists)."""
        mask = pc.equal(t.column("lang"), pa.scalar(lang)).to_numpy(
            zero_copy_only=False)
        ntok = quality_counts_batch(t).column("n_tokens").to_numpy()
        mask &= (ntok >= min_tokens) & (ntok <= max_tokens)
        mask &= _sha256_buckets(
            t.column("text").to_pylist()) < sample_pct
        return pa.table({"doc_id": t.column("doc_id").filter(
            pa.array(mask))})

    filtered = docs.map_batches(filters, batch_format="pyarrow",
                                zero_copy_batch=True)

    if keeper_mode == "join":
        # keeper ids as a DATASET, semi-joined onto the filtered ids
        from ..pipelines.dedup import exact_dedup_dataset
        keepers_ds = exact_dedup_dataset(docs).map_batches(
            lambda t: t.rename_columns(["keep_id"]),
            batch_format="pyarrow", zero_copy_batch=True)
        return hash_join(filtered, keepers_ds, on=("doc_id",),
                         right_on=("keep_id",))

    from ..pipelines.dedup import exact_dedup
    keepers = exact_dedup(rd.read_parquet(f"{sf_dir}/documents.parquet"))
    keep_ref = ray.put(keepers.column("doc_id").combine_chunks())

    # stateless tasks: the broadcast keeper-id array is a zero-copy
    # plasma get per batch — no actor-pool spin-up for a lookup ref
    def keeper_filter(t: pa.Table, *, keep_ref) -> pa.Table:
        keep_ids = ray.get(keep_ref) if isinstance(
            keep_ref, ray.ObjectRef) else keep_ref
        keep = pc.is_in(t.column("doc_id"), value_set=keep_ids)
        return t.filter(keep)

    return filtered.map_batches(
        keeper_filter, fn_kwargs={"keep_ref": keep_ref},
        batch_format="pyarrow", zero_copy_batch=True)


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
