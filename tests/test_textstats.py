"""Corpus text statistics: top_terms, stratified sampling, redaction."""

import duckdb
import numpy as np
import pyarrow as pa

import ray.data as rd

from pagerank_ray.pipelines.textstats import (REDACT_SQL, TOP_TERMS_SQL,
                                              redact_documents,
                                              stratified_sample_docs,
                                              stratified_sample_sql,
                                              top_terms)

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    return con


def _sorted_df(x):
    df = x.to_pandas() if not hasattr(x, "columns") or callable(
        getattr(x, "to_pandas", None)) else x
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_top_terms_counts_and_order():
    docs = rd.from_arrow(pa.table({
        "text": ["b a a", "  a  c ", "", "c b x"],
    }))
    out = top_terms(docs, k=3).to_pandas()
    # counts: a=3, b=2, c=2, x=1 -> top3 = a, b, c (cnt desc, term asc)
    assert out["term"].tolist() == ["a", "b", "c"]
    assert out["cnt"].tolist() == [3, 2, 2]


def test_top_terms_matches_duckdb():
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    got = _sorted_df(top_terms(docs, k=25))
    exp = _sorted_df(_con().execute(TOP_TERMS_SQL.format(k=25)).df())
    assert got.equals(exp)


def test_stratified_sample_matches_duckdb_and_rates():
    got = _sorted_df(stratified_sample_docs(
        SF, pcts={"en": 20, "de": 80}, default_pct=50))
    exp = _sorted_df(_con().execute(
        stratified_sample_sql({"en": 20, "de": 80}, 50)).df())
    assert got.equals(exp)
    # strata actually sample at different rates
    tot = _con().execute(
        "SELECT lang, COUNT(*) c FROM documents GROUP BY lang").df()
    tot = dict(zip(tot["lang"], tot["c"]))
    kept = got.groupby("lang").size().to_dict()
    if tot.get("en", 0) >= 50 and tot.get("de", 0) >= 50:
        assert kept.get("en", 0) / tot["en"] < kept.get("de", 0) / tot["de"]


def test_redact_documents():
    out = redact_documents(SF).to_pandas()
    # every synthesized contact line has exactly one email + one URL
    assert (out["n_emails"] == 1).all()
    assert (out["n_urls"] == 1).all()
    assert out["redacted"].str.contains("<EMAIL>").all()
    assert out["redacted"].str.contains("<URL>").all()
    assert out["redacted"].str.contains("<NUM>").all()
    # no digits survive redaction
    assert not out["redacted"].str.contains(r"[0-9]").any()
    got = _sorted_df(out)
    exp = _sorted_df(_con().execute(REDACT_SQL).df())
    assert got.equals(exp)


def test_tfidf_top_terms_matches_brute():
    import ray.data as rd
    from collections import Counter
    from pagerank_ray.pipelines.textstats import tfidf_top_terms
    import pyarrow.parquet as pq
    sf = "/root/testdata/sf0.001"
    t = tfidf_top_terms(
        rd.read_parquet(f"{sf}/documents.parquet",
                        columns=["doc_id", "text"]), k=5).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    tf = {}
    df = Counter()
    for _, row in docs.iterrows():
        c = Counter(tok for tok in row.text.split() if tok)
        tf[row.doc_id] = c
        df.update(c.keys())
    want = []
    for doc_id, c in tf.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        for term, cnt in top:
            want.append((doc_id, term, cnt, df[term]))
    got = sorted(zip(t.doc_id, t.term, t.tf, t.df))
    assert got == sorted(want)
    # every doc with >= 5 distinct terms contributes exactly 5 rows
    n5 = sum(1 for c in tf.values() if len(c) >= 5)
    from collections import Counter as C2
    per_doc = C2(t.doc_id)
    assert sum(1 for v in per_doc.values() if v == 5) >= n5


def test_bigram_collocations_matches_duckdb():
    import ray.data as rd
    from pagerank_ray.pipelines.textstats import (BIGRAM_SQL,
                                                  bigram_collocations)
    sf = "/root/testdata/sf0.001"
    got = bigram_collocations(
        rd.read_parquet(f"{sf}/documents.parquet",
                        columns=["doc_id", "text"]), k=20).to_pandas()
    exp = _con().execute(BIGRAM_SQL.format(k=20)).df().astype(
        {"cnt": "int64", "c1": "int64", "c2": "int64"})
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))
    # PMI inputs sane: unigram counts bound the bigram count
    assert (got.cnt <= got.c1).all() and (got.cnt <= got.c2).all()
    assert (got.cnt.values[:-1] >= got.cnt.values[1:]).all()


def test_cooccurrence_terms_matches_duckdb():
    import ray.data as rd

    from pagerank_ray.pipelines.textstats import (COOCCURRENCE_SQL,
                                                  cooccurrence_terms)
    sf = "/root/testdata/sf0.001"
    got = cooccurrence_terms(
        rd.read_parquet(f"{sf}/documents.parquet",
                        columns=["doc_id", "text"]),
        window=4, k=20).to_pandas()
    exp = _con().execute(COOCCURRENCE_SQL.format(
        window=4, k=20)).df().astype({"cnt": "int64"})
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))
    assert (got.w1 < got.w2).all()  # canonical unordered pairs
    assert (got.cnt.values[:-1] >= got.cnt.values[1:]).all()


def test_cooccurrence_window1_equals_unordered_bigrams():
    # window=1 co-occurrence == adjacency: every pair must also be a
    # bigram (in one of the two orders) with cnt >= the co-occurrence
    # count only when orders collapse; check against a brute force.
    import ray.data as rd

    from pagerank_ray.pipelines.textstats import cooccurrence_terms
    sf = "/root/testdata/sf0.001"
    got = cooccurrence_terms(
        rd.read_parquet(f"{sf}/documents.parquet",
                        columns=["doc_id", "text"]),
        window=1, k=10).to_pandas()
    import collections

    import pyarrow.parquet as _pq
    cnt = collections.Counter()
    for txt in _pq.read_table(
            f"{sf}/documents.parquet",
            columns=["text"]).column("text").to_pylist():
        toks = [w for w in txt.split() if w]
        for a, b in zip(toks, toks[1:]):
            if a != b:
                cnt[(min(a, b), max(a, b))] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [((r.w1, r.w2), r.cnt)
            for r in got.itertuples()] == want


def test_heavy_hitter_terms_equals_top_terms():
    import ray.data as rd

    from pagerank_ray.pipelines.textstats import (heavy_hitter_terms,
                                                  top_terms)
    sf = "/root/testdata/sf0.001"
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    got = heavy_hitter_terms(docs, k=12).to_pandas()
    want = top_terms(docs, k=12).to_pandas()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["cnt"].tolist() == want["cnt"].astype("int64").tolist()


def test_heavy_hitter_width_too_narrow_raises():
    import pytest as _pytest
    import ray.data as rd

    from pagerank_ray.pipelines.textstats import heavy_hitter_terms
    sf = "/root/testdata/sf0.001"
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    # width=1 cannot certify a top-12 over a long-tailed vocabulary
    with _pytest.raises(RuntimeError, match="cannot certify"):
        heavy_hitter_terms(docs, k=12, width=1)


def test_inverted_index_matches_duckdb():
    import duckdb

    from pagerank_ray.pipelines.textstats import (_docs,
                                                  inverted_index_sql,
                                                  inverted_index_stats)
    sf = "/root/testdata/sf0.001"
    got = inverted_index_stats(_docs(sf, ["doc_id", "text"])).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    exp = con.execute(inverted_index_sql()).df()
    assert len(got) == len(exp) and len(got) > 0
    assert got["term"].tolist() == exp["term"].tolist()
    for c in ("df", "tf", "posting_fp"):
        assert (got[c].to_numpy()
                == exp[c].to_numpy().astype("int64")).all(), c
    assert (got["tf"] >= got["df"]).all()


def test_inverted_index_fingerprint_order_invariant():
    # the posting fingerprint is a commutative sum: hand-check it on
    # a tiny corpus against the definition, in both row orders
    import ray.data as rd

    import numpy as np
    import pyarrow as pa

    from pagerank_ray.functions.sketch import splitmix64
    from pagerank_ray.pipelines.textstats import (_FP_MOD,
                                                  inverted_index_stats)

    rows = {"doc_id": [5, 9, 12], "text": ["a b a", "b c", "a"]}
    rev = {"doc_id": [12, 9, 5], "text": ["a", "b c", "a b a"]}
    outs = []
    for r in (rows, rev):
        ds = rd.from_arrow(pa.table(r)).repartition(3)
        outs.append(inverted_index_stats(ds, k=10).to_pandas()
                    .sort_values("term").reset_index(drop=True))
    assert outs[0].equals(outs[1])
    # int() BEFORE the mod: numpy uint64 % python-int promotes to
    # float64 and corrupts low bits
    h = {d: int(splitmix64(np.array([d], np.uint64))[0]) % _FP_MOD
         for d in (5, 9, 12)}
    got = outs[0].set_index("term")
    assert got.loc["a", "df"] == 2 and got.loc["a", "tf"] == 3
    assert got.loc["a", "posting_fp"] == (h[5] + h[12]) % _FP_MOD
    assert got.loc["b", "posting_fp"] == (h[5] + h[9]) % _FP_MOD
    assert got.loc["c", "posting_fp"] == h[9] % _FP_MOD
