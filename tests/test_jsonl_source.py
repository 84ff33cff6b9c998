"""JSONL source/sink round-trip against the parquet ground truth."""

import glob
import gzip
import json
import os

import pyarrow.parquet as pq

import ray.data as rd

from pagerank_ray.sources.jsonl import (read_documents_jsonl,
                                        write_documents_jsonl)

SF = "/root/testdata/sf0.001"


def _canon(df):
    cols = ["doc_id", "text", "lang", "source"]
    return (df[cols].sort_values("doc_id").reset_index(drop=True))


def test_jsonl_roundtrip(tmp_path):
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "lang", "source"])
    out = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, out)
    files = glob.glob(f"{out}/*.json")
    assert files, "sink wrote no shards"

    back = read_documents_jsonl(out).to_pandas()
    truth = pq.read_table(
        f"{SF}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"]).to_pandas()
    assert _canon(back).equals(_canon(truth))


def test_jsonl_gz_read(tmp_path):
    truth = pq.read_table(
        f"{SF}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"]).to_pandas()
    path = str(tmp_path / "docs.jsonl.gz")
    with gzip.open(path, "wt", encoding="utf-8") as f:
        for rec in truth.to_dict("records"):
            f.write(json.dumps(rec) + "\n")
    back = read_documents_jsonl(path).to_pandas()
    assert _canon(back).equals(_canon(truth))


def test_jsonl_column_projection(tmp_path):
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "lang", "source"])
    out = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, out)
    back = read_documents_jsonl(out, columns=["doc_id", "lang"])
    assert back.schema().names == ["doc_id", "lang"]
    assert back.count() == 500
