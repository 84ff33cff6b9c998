"""End-to-end corpus preparation vs the one-shot SQL oracle."""

import os
import shutil

import duckdb

from pagerank_ray.pipelines.pretrain import (prepare_corpus,
                                             prepare_corpus_sql)

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    return con


def test_prepare_corpus_matches_sql_and_writes_partitions(tmp_path):
    out = str(tmp_path / "corpus")
    got = prepare_corpus(SF, out_dir=out).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    con = _con()
    exp = con.execute(prepare_corpus_sql()).df().sort_values(
        "doc_id").reset_index(drop=True)
    cols = ["doc_id", "lang", "n_tokens"]
    assert got[cols].astype({"n_tokens": "int64"}).equals(
        exp[cols].astype({"n_tokens": "int64"}))
    assert len(got) > 0

    # lang-partitioned layout; written rows re-read to the same set
    assert sorted(os.listdir(out)) == ["lang=en"]
    n = con.execute(f"SELECT COUNT(*) FROM "
                    f"read_parquet('{out}/lang=en/*.parquet')"
                    ).fetchone()[0]
    assert n == len(got)


def test_prepare_corpus_drops_cluster_duplicates():
    """A non-canonical near-dup member never survives, even when it
    passes every scalar filter (cluster dedup subsumes exact dedup)."""
    from pagerank_ray.pipelines.dedup import dedup_clusters

    import ray.data as rd

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    clusters = dedup_clusters(docs, threshold=0.5).to_pandas()
    dupes = set(clusters.loc[
        clusters["doc_id"] != clusters["canonical_id"], "doc_id"])
    kept = set(prepare_corpus(SF).to_pandas()["doc_id"])
    assert not (kept & dupes)


def test_dedup_clusters_out_dir_matches_driver_table(tmp_path):
    """The parquet scale path emits the same (doc_id, canonical_id)
    mapping as the driver-table form."""
    import pyarrow as pa
    import ray.data as rd

    from pagerank_ray.pipelines.dedup import dedup_clusters

    texts = (["alpha beta gamma delta epsilon zeta"] * 3
             + ["one two three four five six"] * 2
             + ["lone wolf document completely unique here"])
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    want = dedup_clusters(rd.from_arrow(docs))
    out = str(tmp_path / "clusters")
    assert dedup_clusters(rd.from_arrow(docs), out_dir=out) is None
    got = (rd.read_parquet(out).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.equals(want.to_pandas())
