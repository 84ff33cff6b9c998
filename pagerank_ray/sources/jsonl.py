"""JSONL document source/sink — the interchange format most
pretraining corpora ship in (one JSON object per line, optionally
gzipped).

Reading uses Ray Data's native ``read_json`` (pyarrow JSON reader
underneath: C-level parse, blocks stream through the object store;
``.gz`` decompresses transparently by extension via
``arrow_open_stream_args``). Writing shards one file per block —
resumable, never one giant file.

Schema normalization: JSON inference can widen or reorder columns per
file; ``read_documents_jsonl`` projects and casts to the canonical
documents schema so downstream operators see identical types no
matter which source format fed them.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

DOCUMENTS_SCHEMA: list[tuple[str, pa.DataType]] = [
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("source", pa.string()),
]


def read_documents_jsonl(path: str, columns=None):
    """Read a JSONL (or .jsonl.gz) documents corpus -> Dataset with
    the canonical documents schema (projected + cast)."""
    want = [(n, t) for n, t in DOCUMENTS_SCHEMA
            if columns is None or n in columns]
    names = [n for n, _ in want]

    def normalize(t: pa.Table) -> pa.Table:
        return pa.table({n: t.column(n).cast(typ) for n, typ in want})

    kwargs = {}
    if path.endswith(".gz"):
        kwargs["arrow_open_stream_args"] = {"compression": "gzip"}
    return rd.read_json(path, **kwargs).map_batches(
        normalize, batch_format="pyarrow",
        zero_copy_batch=True).select_columns(names)


def write_documents_jsonl(ds, out_dir: str):
    """Write a documents Dataset as sharded JSONL (one file per
    block — a failed run reruns only missing shards)."""
    ds.write_json(out_dir)
    return out_dir
