"""Curation pipeline composition + HLL sketch accuracy."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from pagerank_ray.functions.sketch import HyperLogLog, hll_distinct
from pagerank_ray.pipelines.curation import curate_documents, hash_sample

SF = "/root/testdata/sf0.001"


def test_hash_sample_deterministic():
    docs = rd.read_parquet(f"{SF}/documents.parquet")
    a = sorted(r["doc_id"]
               for r in hash_sample(docs, 30).take_all())
    docs2 = rd.read_parquet(f"{SF}/documents.parquet")
    b = sorted(r["doc_id"]
               for r in hash_sample(docs2, 30).take_all())
    assert a == b
    n_total = rd.read_parquet(f"{SF}/documents.parquet").count()
    assert 0 < len(a) < n_total
    # pct=100 keeps everything, pct=0 keeps nothing
    assert hash_sample(rd.read_parquet(f"{SF}/documents.parquet"),
                       100).count() == n_total
    assert hash_sample(rd.read_parquet(f"{SF}/documents.parquet"),
                       0).count() == 0


def test_curate_documents_matches_brute_force():
    import hashlib

    import pyarrow.parquet as pq

    got = sorted(r["doc_id"]
                 for r in curate_documents(SF, lang="en", min_tokens=20,
                                           max_tokens=2000,
                                           sample_pct=50).take_all())
    docs = pq.read_table(f"{SF}/documents.parquet").to_pylist()
    first_by_text = {}
    for d in sorted(docs, key=lambda x: x["doc_id"]):
        first_by_text.setdefault(d["text"], d["doc_id"])
    keepers = set(first_by_text.values())
    want = []
    for d in docs:
        if d["doc_id"] not in keepers or d["lang"] != "en":
            continue
        ntok = len(d["text"].split())
        if not (20 <= ntok <= 2000):
            continue
        b = int(hashlib.sha256(
            d["text"].encode()).hexdigest()[:8], 16) % 100
        if b < 50:
            want.append(d["doc_id"])
    assert got == sorted(want)
    assert len(got) > 0

    # the semi-join keeper path (100-TB shape: keeper set never on the
    # driver) selects the exact same documents
    got_join = sorted(r["doc_id"]
                      for r in curate_documents(
                          SF, lang="en", min_tokens=20, max_tokens=2000,
                          sample_pct=50, keeper_mode="join").take_all())
    assert got_join == got


def test_hll_accuracy():
    h = HyperLogLog(p=12)
    h.add_strings([f"item-{i}" for i in range(50_000)])
    est = h.estimate()
    assert est == pytest.approx(50_000, rel=0.05)
    # mergeability: two halves == one pass
    h1 = HyperLogLog(p=12)
    h2 = HyperLogLog(p=12)
    h1.add_strings([f"item-{i}" for i in range(25_000)])
    h2.add_strings([f"item-{i}" for i in range(25_000, 50_000)])
    h1.merge(h2)
    assert h1.estimate() == pytest.approx(est, rel=1e-12)
    # serialization round-trip
    h3 = HyperLogLog.from_bytes(h1.to_bytes(), p=12)
    assert h3.estimate() == h1.estimate()


def test_hll_distinct_dataset():
    t = pa.table({"user": pa.array(
        [f"u{i % 137}" for i in range(5000)], pa.string())})
    est = hll_distinct(rd.from_arrow(t), "user", p=12)
    assert est == pytest.approx(137, rel=0.08)


def test_hll_int_path_accuracy_and_merge():
    """The vectorized splitmix64 int path meets the same accuracy bar
    as the blake2b string path and merges register-wise."""
    rng = np.random.default_rng(11)
    vals = rng.choice(200_000, size=80_000, replace=False)
    h = HyperLogLog(p=12)
    h.add_ints(vals)
    est = h.estimate()
    assert abs(est - len(vals)) / len(vals) < 0.05
    # merge of two halves == one sketch over the union
    h1, h2 = HyperLogLog(p=12), HyperLogLog(p=12)
    h1.add_ints(vals[:40_000])
    h2.add_ints(vals[40_000:])
    h1.merge(h2)
    assert (h1.registers == h.registers).all()


def test_hll_sql_oracle_matches_engine():
    """hll_distinct_sql replays splitmix64 + registers + estimate in
    DuckDB exactly — both the linear-counting branch (few users) and
    the raw-estimate branch (many users)."""
    import duckdb

    from pagerank_ray.functions.sketch import hll_distinct_sql

    rng = np.random.default_rng(3)
    for n in (40, 30_000):  # linear-counting vs raw-estimate branch
        vals = rng.choice(10_000_000, size=n, replace=False)
        con = duckdb.connect()
        con.register("events_df", pa.table({
            "user_id": pa.array(vals, pa.int64())}))
        con.execute("CREATE VIEW events AS SELECT * FROM events_df")
        sql_est = con.execute(
            hll_distinct_sql("user_id", "events", 12)).fetchone()[0]
        h = HyperLogLog(p=12)
        h.add_ints(vals)
        assert sql_est == int(np.floor(h.estimate() + 0.5))


def test_hll_distinct_per_group_matches_duckdb_and_truth():
    import duckdb
    import pyarrow.parquet as pq
    import ray.data as rd

    from pagerank_ray.functions.sketch import (
        hll_distinct_per_group, hll_distinct_per_group_sql)
    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "user_id"])
    got = hll_distinct_per_group(ds, "event_type", "user_id"
                                 ).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    exp = con.execute(hll_distinct_per_group_sql()).df()
    assert got["event_type"].tolist() == exp["event_type"].tolist()
    assert (got["estimate"].to_numpy()
            == exp["estimate"].to_numpy().astype("int64")).all()
    # estimates within HLL error of the exact truth (p=12 -> ~1.6%)
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    truth = ev.groupby("event_type")["user_id"].nunique()
    for _, r in got.iterrows():
        t = truth[r.event_type]
        assert abs(r.estimate - t) <= max(3, 0.1 * t)
