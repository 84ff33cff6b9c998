"""Text analysis: token counts, quality counts, langid, fingerprints."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from pagerank_ray.functions.text import (LangId, fingerprint64,
                                         fingerprint_batch,
                                         quality_counts_batch,
                                         quality_score_batch, token_count)


def _docs(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_token_count():
    t = _docs(["a b  c", "", "  x ", "one,two three."])
    got = token_count(t.column("text")).to_pylist()
    assert got == [3, 0, 1, 2]  # "one,two" and "three." are 2 tokens


def test_quality_counts():
    t = _docs(["the cat, and the dog!", "xyz"])
    out = quality_counts_batch(t)
    row = out.to_pylist()[0]
    assert row["n_chars"] == 21
    assert row["n_tokens"] == 5
    assert row["n_punct"] == 2       # ',' and '!'
    assert row["n_stopwords"] == 3   # the, and, the
    assert out.to_pylist()[1]["n_stopwords"] == 0


def test_quality_score_range():
    t = _docs(["the and of to is in " * 20, "zzz"])
    out = quality_score_batch(t)
    scores = out.column("quality").to_pylist()
    assert 0.0 <= scores[1] < scores[0] <= 1.0


def test_langid():
    t = _docs([
        "the cat is in the house and it was good",
        "el perro y la casa de los vecinos en un día",
        "le chat est dans les maisons et une de des",
        "qqq www zzz",
        "我的书是好的和不错的",  # CJK: \b-free matching (RE2 \b is ASCII)
    ])
    out = LangId()(t)
    preds = out.column("lang_pred").to_pylist()
    assert preds == ["en", "es", "fr", "und", "zh"]


def test_fingerprint_deterministic_and_distinct():
    texts = ["hello world", "hello world!", "hello world", ""]
    a = fingerprint64(texts)
    b = fingerprint64(texts)
    assert (a == b).all()
    assert a[0] == a[2] and a[0] != a[1]
    assert a[3] == 0

    out = fingerprint_batch(_docs(texts))
    assert out.column("fingerprint").to_pylist()[0] == \
        np.int64(a[0].astype(np.int64))


def test_langid_dataset_actor_pool():
    t = _docs(["the cat is the best and it is good"] * 10)
    out = rd.from_arrow(t).map_batches(
        LangId, batch_format="pyarrow", batch_size=4,
        concurrency=2).take_all()
    assert len(out) == 10
    assert all(r["lang_pred"] == "en" for r in out)


def test_bpe_token_count_known_values_and_duckdb_parity():
    import duckdb
    import pyarrow as pa

    from pagerank_ray.functions.text import (BPE_TOKEN_PATTERN,
                                             bpe_token_count)

    texts = ["Hello world!", "it's 2026, let's tokenize...",
             "", "  spaces   and\ttabs\n", "naïve café №42"]
    got = bpe_token_count(pa.array(texts, pa.string())).to_pylist()
    assert got == [3, 8, 0, 7, 4]
    pat = BPE_TOKEN_PATTERN.replace("'", "''")
    con = duckdb.connect()
    sql = [con.execute(
        f"SELECT len(regexp_extract_all(?, '{pat}'))", [t]).fetchone()[0]
        for t in texts]
    assert got == sql
