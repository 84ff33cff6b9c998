"""Corpus-level text statistics for training-data pipelines.

Three operators a pretraining-data curation stack runs constantly,
each fully streaming and DuckDB-oracle-expressible:

  top_terms               global term-frequency top-k (the wordcount
                          shape): per-batch ``value_counts`` combiner
                          -> tiny (term, cnt) shuffle -> groupby-sum
                          -> sort/limit. The shuffle carries one row
                          per distinct term per batch — never the
                          token stream itself.
  stratified_sample_docs  deterministic per-stratum sampling: keep a
                          document iff its sha256-derived [0,100)
                          bucket is below the stratum's percentage
                          (reproducible across engines and runs,
                          unlike random_sample).
  redact_documents        vectorized RE2 redaction (emails, URLs,
                          numbers) with per-pattern hit counts — the
                          PII-scrub shape. The test corpus is word
                          soup, so the operator synthesizes a
                          deterministic contact string per document
                          (the ``url_shape_filter`` pattern) and
                          redacts that; on real data the same stage
                          points at the text column.

Tokenization parity: DuckDB ``regexp_extract_all(text, '\\S+')`` ==
Arrow ``split_pattern_regex(text, '\\s+')`` minus empty strings (both
are RE2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .curation import _sha256_buckets

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_PATTERN = r"https?://[^\s]+"
NUM_PATTERN = r"[0-9]+"


def _docs(sf_dir: str, columns):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ------------------------------------------------------------ top_terms

def top_terms(docs, k: int = 20):
    """-> Dataset of the k globally most frequent whitespace tokens
    (term, cnt), ordered by (cnt desc, term asc).

    Per-batch combiner: one vectorized split + ``value_counts`` per
    batch emits (term, partial-count) rows, so the groupby shuffle
    moves the per-batch VOCABULARY (sublinear in tokens), not the
    token stream. The final sort ranks the small distinct-term table.
    """

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(t.column("text"), r"\s+"))
        toks = toks.filter(pc.not_equal(toks, pa.scalar("")))
        vc = pc.value_counts(toks)
        return pa.table({
            "term": vc.field("values"),
            "cnt": pc.cast(vc.field("counts"), pa.int64()),
        })

    def block_topk(t: pa.Table) -> pa.Table:
        """Per-block partial top-k AFTER the groupby: the shuffle
        hash-partitions terms, so each term's global count lives in
        exactly one block — the global top-k is a subset of the union
        of per-block top-ks, and the final sort ranks blocks x k rows
        instead of the whole vocabulary."""
        if t.num_rows == 0:  # empty-schema shuffle block
            return pa.table({"term": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        t = pa.table({"term": t.column("term"),
                      "cnt": t.column("sum(cnt)")})
        if t.num_rows <= k:
            return t
        cnt = t.column("cnt").to_numpy()
        order = np.lexsort((np.asarray(t.column("term").to_pylist(),
                                       dtype=object), -cnt))[:k]
        return t.take(pa.array(np.sort(order)))

    return (docs.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("term").sum("cnt")
            .map_batches(block_topk, batch_format="pyarrow",
                         zero_copy_batch=True)
            .sort(["cnt", "term"], descending=[True, False])
            .limit(k))


TOP_TERMS_SQL = r"""
    SELECT term, COUNT(*) AS cnt
    FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS term
          FROM documents)
    GROUP BY term
    ORDER BY cnt DESC, term ASC
    LIMIT {k}
"""


# ------------------------------------------- stratified hash sampling

def stratified_sample_docs(sf_dir: str,
                           pcts: dict[str, int] | None = None,
                           default_pct: int = 50):
    """-> Dataset of (doc_id, lang) kept by a per-language
    deterministic sample: bucket = sha256(text) mod 100, keep iff
    bucket < pct(lang).

    One streaming filter pass, no shuffle; the per-row work is the
    sha256 digests (C-backed, no batch kernel exists) — the bucket
    compare and stratum lookup are vectorized.
    """
    pcts = pcts if pcts is not None else {"en": 20, "de": 80}

    def flt(t: pa.Table) -> pa.Table:
        bucket = _sha256_buckets(t.column("text").to_pylist())
        lang = t.column("lang")
        pct = np.full(t.num_rows, default_pct, dtype=np.int64)
        for lg, p in pcts.items():
            m = pc.equal(lang, pa.scalar(lg)).to_numpy(
                zero_copy_only=False)
            pct[m] = p
        keep = pa.array(bucket < pct)
        return pa.table({"doc_id": t.column("doc_id"),
                         "lang": lang}).filter(keep)

    return _docs(sf_dir, ["doc_id", "lang", "text"]).map_batches(
        flt, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample_sql(pcts: dict[str, int], default_pct: int) -> str:
    cases = " ".join(f"WHEN '{lg}' THEN {p}" for lg, p in
                     sorted(pcts.items()))
    return f"""
        SELECT doc_id, lang FROM documents
        WHERE CAST(('0x' || substr(sha256(text), 1, 8)) AS UBIGINT)
              % 100 < CASE lang {cases} ELSE {default_pct} END
    """


# ------------------------------------------------------------ redaction

def redact_documents(sf_dir: str):
    """-> Dataset of (doc_id, redacted, n_emails, n_urls): RE2
    redaction of emails -> <EMAIL>, URLs -> <URL>, then numbers ->
    <NUM>, with pre-redaction hit counts.

    All four scans/replaces are single C-level RE2 kernels per batch.
    The input string is synthesized deterministically per document
    (source/lang/doc_id contact line) because the synthetic corpus
    contains no PII; the redaction stage itself is column-agnostic.
    """

    def redact(t: pa.Table) -> pa.Table:
        did = pc.cast(t.column("doc_id"), pa.string())
        msg = pc.binary_join_element_wise(
            "contact ", t.column("source"), did, "@example.com see ",
            "https://", t.column("lang"), ".example.com/", did,
            " ref ", did, "")
        n_emails = pc.cast(
            pc.count_substring_regex(msg, EMAIL_PATTERN), pa.int64())
        n_urls = pc.cast(
            pc.count_substring_regex(msg, URL_PATTERN), pa.int64())
        red = pc.replace_substring_regex(msg, EMAIL_PATTERN, "<EMAIL>")
        red = pc.replace_substring_regex(red, URL_PATTERN, "<URL>")
        red = pc.replace_substring_regex(red, NUM_PATTERN, "<NUM>")
        return pa.table({"doc_id": t.column("doc_id"),
                         "redacted": red,
                         "n_emails": n_emails,
                         "n_urls": n_urls})

    return _docs(sf_dir, ["doc_id", "source", "lang"]).map_batches(
        redact, batch_format="pyarrow", zero_copy_batch=True)


REDACT_SQL = r"""
    WITH msgs AS (
        SELECT doc_id,
               'contact ' || source || CAST(doc_id AS VARCHAR)
               || '@example.com see https://' || lang
               || '.example.com/' || CAST(doc_id AS VARCHAR)
               || ' ref ' || CAST(doc_id AS VARCHAR) AS msg
        FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(msg,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g'),
               'https?://[^\s]+', '<URL>', 'g'),
               '[0-9]+', '<NUM>', 'g') AS redacted,
           len(regexp_extract_all(msg,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               AS n_emails,
           len(regexp_extract_all(msg, 'https?://[^\s]+')) AS n_urls
    FROM msgs
"""


def tfidf_top_terms(docs, k: int = 5, join_partitions: int | None = None):
    """Per-document top-``k`` terms by (tf DESC, term ASC) with the
    term's global document frequency attached — the exact-integer
    core of TF-IDF (idf = ln(N/df) is the caller's one float; keeping
    (tf, df) integral makes the result value-hashable across
    engines). Returns a Dataset (doc_id, term, tf, df).

    Scale shape: ONE vectorized pass computes per-(doc, term) counts
    AND the per-doc rank (arrow group_by + np.lexsort inside the
    batch — each document lives in one row, so its tf table is
    batch-local and exact). The groupby shuffle then moves one row
    per DISTINCT (doc, term) pair (sublinear in tokens) to build df,
    and only the ≤ k·docs top rows enter the df join.
    """
    from ..stages.join import default_join_partitions, hash_join

    i64 = pa.int64()

    def tf_rank(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], i64),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], i64),
                             "rank": pa.array([], i64)})
        toks = pc.split_pattern_regex(t.column("text"), r"\s+")
        idx = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, pa.scalar(""))
        pairs = pa.table({"i": idx.filter(keep),
                          "term": flat.filter(keep)})
        g = pairs.group_by(["i", "term"]).aggregate([("term", "count")])
        i = g.column("i").to_numpy()
        tf = g.column("term_count").to_numpy().astype(np.int64)
        terms = np.asarray(g.column("term").to_pylist(), dtype=object)
        order = np.lexsort((terms, -tf, i))
        i, tf, terms = i[order], tf[order], terms[order]
        # rank within doc: position minus the doc's first position
        starts = np.flatnonzero(np.diff(i, prepend=i[:1] - 1))
        rank = np.arange(len(i)) - np.repeat(
            starts, np.diff(np.append(starts, len(i))))
        doc_ids = t.column("doc_id").to_numpy()[i]
        return pa.table({"doc_id": pa.array(doc_ids, i64),
                         "term": pa.array(terms, pa.string()),
                         "tf": pa.array(tf),
                         "rank": pa.array(rank)})

    tf_full = docs.map_batches(tf_rank, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    def _df(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"dterm": pa.array([], pa.string()),
                             "df": pa.array([], i64)})
        return pa.table({"dterm": t.column("term"),
                         "df": pc.cast(t.column("count()"), i64)})

    df_ds = tf_full.groupby("term").count().map_batches(
        _df, batch_format="pyarrow", zero_copy_batch=True)

    def _topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], i64),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], i64)})
        t = t.filter(pc.less(t.column("rank"), pa.scalar(k)))
        return pa.table({"doc_id": t.column("doc_id"),
                         "term": t.column("term"),
                         "tf": t.column("tf")})

    topk = tf_full.map_batches(_topk, batch_format="pyarrow",
                               zero_copy_batch=True)
    nparts = join_partitions or default_join_partitions()
    joined = hash_join(
        topk.repartition(nparts), df_ds, on=("term",),
        right_on=("dterm",),
        left_schema=[("doc_id", i64), ("term", pa.string()),
                     ("tf", i64)],
        right_schema=[("dterm", pa.string()), ("df", i64)])

    def _final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], i64),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], i64),
                             "df": pa.array([], i64)})
        return pa.table({"doc_id": t.column("doc_id"),
                         "term": t.column("term"),
                         "tf": t.column("tf"),
                         "df": t.column("df")})

    return joined.map_batches(_final, batch_format="pyarrow",
                              zero_copy_batch=True)


# ------------------------------------------- bigram collocations

def bigram_collocations(docs, k: int = 20):
    """Top-``k`` adjacent-token bigrams with both unigram counts
    attached — the exact-integer core of PMI collocation mining
    (PMI = ln(cnt·N / (c1·c2)) is the caller's one float; keeping
    (cnt, c1, c2) integral makes the value hash engine-stable).
    Returns a driver ``pa.Table`` (w1, w2, cnt, c1, c2) ordered by
    (cnt DESC, w1 ASC, w2 ASC) — a total order.

    Scale shape: ONE vectorized pass emits per-batch bigram partial
    counts (adjacent FILTERED tokens within a document; arrow
    group_by) and the same pass's unigram combiner rides the
    ``top_terms`` machinery — both shuffles carry per-batch
    vocabularies, never the token stream. Only the k winners and
    their ≤ 2k distinct words reach the driver (broadcast key fetch
    for the unigram counts).
    """
    i64 = pa.int64()

    def bigram_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "cnt": pa.array([], i64)})
        if t.num_rows == 0:
            return empty
        toks = pc.split_pattern_regex(t.column("text"), r"\s+")
        par = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, pa.scalar(""))
        par = par.filter(keep).to_numpy(zero_copy_only=False)
        w = flat.filter(keep)
        if len(par) < 2:
            return empty
        same = par[1:] == par[:-1]
        if not same.any():
            return empty
        idx = np.flatnonzero(same)
        pairs = pa.table({"w1": w.take(pa.array(idx)),
                          "w2": w.take(pa.array(idx + 1))})
        g = pairs.group_by(["w1", "w2"]).aggregate([("w1", "count")])
        return pa.table({"w1": g.column("w1"),
                         "w2": g.column("w2"),
                         "cnt": pc.cast(g.column("w1_count"), i64)})

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "cnt": pa.array([], i64)})
        t = pa.table({"w1": t.column("w1"), "w2": t.column("w2"),
                      "cnt": t.column("sum(cnt)").cast(i64)})
        if t.num_rows <= k:
            return t
        cnt = t.column("cnt").to_numpy()
        o = np.lexsort((np.asarray(t.column("w2").to_pylist(),
                                   dtype=object),
                        np.asarray(t.column("w1").to_pylist(),
                                   dtype=object), -cnt))[:k]
        return t.take(pa.array(np.sort(o)))

    docs = docs.materialize()
    top = (docs.map_batches(bigram_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby(["w1", "w2"]).sum("cnt")
           .map_batches(block_topk, batch_format="pyarrow",
                        zero_copy_batch=True)
           .sort(["cnt", "w1", "w2"], descending=[True, False, False])
           .limit(k).to_pandas())

    # unigram counts for ONLY the winners' words: the top_terms
    # combiner + a broadcast word-set filter after the groupby
    import ray as _ray

    words = sorted(set(top["w1"]) | set(top["w2"]))
    wref = _ray.put(pa.array(words, pa.string()))

    def uni_partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(t.column("text"), r"\s+"))
        toks = toks.filter(pc.not_equal(toks, pa.scalar("")))
        vc = pc.value_counts(toks)
        return pa.table({"term": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), i64)})

    def keep_winners(t: pa.Table, *, wref) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "cnt": pa.array([], i64)})
        ws = _ray.get(wref) if isinstance(
            wref, _ray.ObjectRef) else wref
        t = pa.table({"term": t.column("term"),
                      "cnt": t.column("sum(cnt)").cast(i64)})
        return t.filter(pc.is_valid(pc.index_in(t.column("term"),
                                                value_set=ws)))

    uni = (docs.map_batches(uni_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("term").sum("cnt")
           .map_batches(keep_winners, fn_kwargs={"wref": wref},
                        batch_format="pyarrow")
           .to_pandas())
    cmap = dict(zip(uni["term"], uni["cnt"]))
    return pa.table({
        "w1": pa.array(list(top["w1"]), pa.string()),
        "w2": pa.array(list(top["w2"]), pa.string()),
        "cnt": pa.array(top["cnt"].to_numpy(), i64),
        "c1": pa.array([int(cmap[w]) for w in top["w1"]], i64),
        "c2": pa.array([int(cmap[w]) for w in top["w2"]], i64),
    })


BIGRAM_SQL = r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                  x -> x <> '')) AS w,
               unnest(range(len(list_filter(
                   regexp_split_to_array(text, '\s+'),
                   x -> x <> '')))) AS i
        FROM documents),
    bg AS (SELECT a.w AS w1, b.w AS w2, COUNT(*) AS cnt
           FROM toks a JOIN toks b
             ON b.doc_id = a.doc_id AND b.i = a.i + 1
           GROUP BY a.w, b.w),
    uni AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w)
    SELECT bg.w1, bg.w2, bg.cnt, u1.c AS c1, u2.c AS c2
    FROM bg JOIN uni u1 ON u1.w = bg.w1
            JOIN uni u2 ON u2.w = bg.w2
    ORDER BY bg.cnt DESC, bg.w1 ASC, bg.w2 ASC
    LIMIT {k}
"""


def cooccurrence_terms(docs, window: int = 4, k: int = 20):
    """Top-``k`` unordered term pairs co-occurring within ``window``
    token positions of each other (the skip-gram / word-embedding
    co-occurrence primitive; each (i, j) position pair with
    0 < j - i <= window counts once). Identical-word pairs are
    dropped (they carry no association signal). Returns a driver
    ``pa.Table`` (w1, w2, cnt) with w1 < w2, ordered by
    (cnt DESC, w1 ASC, w2 ASC) — a total order.

    Scale shape: one vectorized pass per batch emits canonicalized
    pair partial counts (``window`` shifted comparisons over the
    flattened token stream, arrow group_by combiner), so the shuffle
    carries per-batch pair vocabularies, never the token stream; a
    per-block top-k after the groupby bounds the final sort input to
    k rows per block.
    """
    i64, s = pa.int64(), pa.string()
    empty = pa.table({"w1": pa.array([], s), "w2": pa.array([], s),
                      "cnt": pa.array([], i64)})

    def pair_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        toks = pc.split_pattern_regex(t.column("text"), r"\s+")
        par = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, pa.scalar(""))
        par = par.filter(keep).to_numpy(zero_copy_only=False)
        w = flat.filter(keep).combine_chunks()
        n = len(par)
        if n < 2:
            return empty
        lo_parts, hi_parts = [], []
        for d in range(1, window + 1):
            if n <= d:
                break
            same = par[d:] == par[:-d]
            if not same.any():
                continue
            idx = pa.array(np.flatnonzero(same))
            a = w.take(idx)
            b = w.take(pc.add(idx, pa.scalar(d, pa.int64())))
            neq = pc.not_equal(a, b)
            a, b = a.filter(neq), b.filter(neq)
            swap = pc.greater(a, b)
            lo_parts.append(pc.if_else(swap, b, a))
            hi_parts.append(pc.if_else(swap, a, b))
        if not lo_parts:
            return empty
        pairs = pa.table({
            "w1": pa.concat_arrays([p.combine_chunks()
                                    if isinstance(p, pa.ChunkedArray)
                                    else p for p in lo_parts]),
            "w2": pa.concat_arrays([p.combine_chunks()
                                    if isinstance(p, pa.ChunkedArray)
                                    else p for p in hi_parts])})
        g = pairs.group_by(["w1", "w2"]).aggregate([("w1", "count")])
        return pa.table({"w1": g.column("w1"), "w2": g.column("w2"),
                         "cnt": pc.cast(g.column("w1_count"), i64)})

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = pa.table({"w1": t.column("w1"), "w2": t.column("w2"),
                      "cnt": t.column("sum(cnt)").cast(i64)})
        if t.num_rows <= k:
            return t
        cnt = t.column("cnt").to_numpy()
        o = np.lexsort((np.asarray(t.column("w2").to_pylist(),
                                   dtype=object),
                        np.asarray(t.column("w1").to_pylist(),
                                   dtype=object), -cnt))[:k]
        return t.take(pa.array(np.sort(o)))

    top = (docs.map_batches(pair_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby(["w1", "w2"]).sum("cnt")
           .map_batches(block_topk, batch_format="pyarrow",
                        zero_copy_batch=True)
           .sort(["cnt", "w1", "w2"], descending=[True, False, False])
           .limit(k).to_pandas())
    return pa.table({
        "w1": pa.array(list(top["w1"]), s),
        "w2": pa.array(list(top["w2"]), s),
        "cnt": pa.array(top["cnt"].to_numpy(), i64)})


COOCCURRENCE_SQL = r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                  x -> x <> '')) AS w,
               unnest(range(len(list_filter(
                   regexp_split_to_array(text, '\s+'),
                   x -> x <> '')))) AS i
        FROM documents)
    SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2,
           COUNT(*) AS cnt
    FROM toks a JOIN toks b
      ON b.doc_id = a.doc_id
     AND b.i > a.i AND b.i <= a.i + {window}
     AND a.w <> b.w
    GROUP BY 1, 2
    ORDER BY cnt DESC, w1 ASC, w2 ASC
    LIMIT {k}
"""


def heavy_hitter_terms(docs, k: int = 12, width: int | None = None):
    """EXACT top-``k`` most frequent tokens computed WITHOUT a
    vocabulary-scale shuffle — the two-pass heavy-hitter pattern:

    Pass 1 (candidates): each batch keeps only its ``width`` locally
    most frequent terms (a truncated summary with the Misra-Gries
    guarantee: an item dropped by a batch loses at most
    N_batch/(width+1) count there, so total underestimate
    <= N/(width+1)); the candidate union is blocks x width rows —
    sketch-scale, not vocabulary-scale. Pass 2 (exact recount): the
    candidate set broadcasts via ray.put and one filtered
    value_counts pass + a candidate-sized groupby recovers EXACT
    counts; the same pass counts N for free.

    The result is provably the true top-k iff the k-th exact count
    exceeds N/(width+1) — asserted, so a too-narrow width fails
    loudly instead of silently returning near-misses. Returns
    (term, cnt) ordered by (cnt DESC, term ASC); identical to
    ``top_terms`` output (equality-tested), at sketch-sized shuffle
    cost. ``width`` defaults to 8k."""
    import ray as _ray

    i64, s = pa.int64(), pa.string()
    w = width or 8 * k

    def candidates(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(t.column("text"), r"\s+"))
        toks = toks.filter(pc.not_equal(toks, pa.scalar("")))
        vc = pc.value_counts(toks)
        terms = vc.field("values")
        cnt = vc.field("counts").to_numpy(zero_copy_only=False)
        if len(cnt) > w:
            keep = np.argpartition(-cnt, w - 1)[:w]
            terms = terms.take(pa.array(np.sort(keep)))
        return pa.table({"term": terms})

    cand = (docs.map_batches(candidates, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("term").count())
    cand_terms = cand.to_pandas()["term"] if cand.count() else []
    cref = _ray.put(pa.array(list(cand_terms), s))

    def recount(t: pa.Table, *, cref) -> pa.Table:
        cs = _ray.get(cref) if isinstance(cref, _ray.ObjectRef) else cref
        toks = pc.list_flatten(
            pc.split_pattern_regex(t.column("text"), r"\s+"))
        toks = toks.filter(pc.not_equal(toks, pa.scalar("")))
        n_total = len(toks)
        toks = toks.filter(pc.is_valid(pc.index_in(toks,
                                                   value_set=cs)))
        vc = pc.value_counts(toks)
        return pa.table({
            "term": pa.concat_arrays(
                [vc.field("values").combine_chunks()
                 if isinstance(vc.field("values"), pa.ChunkedArray)
                 else vc.field("values"),
                 pa.array([""], s)]),
            "cnt": pa.concat_arrays(
                [pc.cast(vc.field("counts"), i64).combine_chunks()
                 if isinstance(vc.field("counts"), pa.ChunkedArray)
                 else pc.cast(vc.field("counts"), i64),
                 pa.array([0], i64)]),
            "n_tok": pa.concat_arrays(
                [pa.array(np.zeros(len(vc), np.int64)),
                 pa.array([n_total], i64)])})

    agg = (docs.map_batches(recount, fn_kwargs={"cref": cref},
                            batch_format="pyarrow")
           .groupby("term").sum(["cnt", "n_tok"]))
    t = agg.to_pandas()
    n_tokens = int(t["sum(n_tok)"].sum())
    t = t[t["term"] != ""]
    order = np.lexsort((t["term"].to_numpy(dtype=object),
                        -t["sum(cnt)"].to_numpy()))[:k]
    t = t.iloc[np.asarray(order)]
    # Certification: every never-candidate term has true count
    # <= N/(w+1). With >= k rows the k-th exact count must clear that
    # bound; with FEWER than k rows a dropped term could still belong
    # in the top-k unless nothing can have been dropped (N/(w+1) < 1,
    # i.e. candidates = full vocabulary).
    kth = int(t["sum(cnt)"].iloc[-1]) if len(t) >= k else 0
    uncertified = (kth * (w + 1) <= n_tokens if len(t) >= k
                   else n_tokens >= w + 1)
    if uncertified:
        raise RuntimeError(
            f"heavy_hitter_terms width={w} cannot certify the top-{k}:"
            f" kth count {kth} (rows={len(t)}) <= N/(width+1) ="
            f" {n_tokens/(w+1):.1f}; pass a larger width")
    return pa.table({
        "term": pa.array(t["term"].to_numpy(dtype=object), s),
        "cnt": pa.array(t["sum(cnt)"].to_numpy().astype(np.int64),
                        i64)})


# ------------------------------------------------- inverted_index_stats

_FP_MOD = 2147483647  # 2^31 - 1: posting sums stay in int64 up to
#                       2^32 postings per term before the final mod


def inverted_index_stats(docs, k: int = 50):
    """Top-``k`` inverted-index summary rows (term, df, tf,
    posting_fp) by (df DESC, tf DESC, term ASC — a total order, so
    the LIMIT is exact): document frequency, total term frequency,
    and an ORDER-INVARIANT exact fingerprint of the posting list —
    sum over posting doc_ids of splitmix64(doc_id) mod 2^31-1 (a
    commutative hash, so no engine needs to materialize or sort the
    posting list to agree on it; the DuckDB oracle replays splitmix64
    in HUGEINT via ``sketch.splitmix64_subquery``). The fingerprint
    certifies the full index CONTENT while the contract result stays
    k rows.

    Scale shape: one vectorized pass per batch (RE2 split +
    list_parent_indices + arrow group_by) reduces the token stream
    to distinct (doc, term) rows batch-locally — each document lives
    in one row, so its tf table is batch-local and exact (the
    tfidf_top_terms discipline) — then per-batch per-term partials
    (df, tf, fp) bound the shuffle to the batch vocabulary. One
    groupby-sum + a final mod + sort/limit. The posting lists
    themselves never ship anywhere."""
    from ..functions.sketch import splitmix64

    i64, s = pa.int64(), pa.string()
    empty = pa.table({"term": pa.array([], s),
                      "df": pa.array([], i64),
                      "tf": pa.array([], i64),
                      "fp": pa.array([], i64)})

    def term_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        toks = pc.split_pattern_regex(t.column("text"), r"\s+")
        idx = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, pa.scalar(""))
        pairs = pa.table({"i": idx.filter(keep),
                          "term": flat.filter(keep)})
        if pairs.num_rows == 0:
            return empty
        # distinct (doc, term) + tf, exact batch-locally (one doc ==
        # one row)
        g = pairs.group_by(["i", "term"]).aggregate([("term", "count")])
        di = g.column("i").to_numpy(zero_copy_only=False).astype(np.int64)
        doc = t.column("doc_id").to_numpy()[di]
        hm = (splitmix64(doc.astype(np.uint64))
              % np.uint64(_FP_MOD)).astype(np.int64)
        tf = g.column("term_count").to_numpy(zero_copy_only=False
                                             ).astype(np.int64)
        # per-batch per-term partials: the shuffle carries one row
        # per distinct term per batch
        part = pa.table({
            "term": g.column("term"),
            "df": pa.array(np.ones(len(tf), np.int64), i64),
            "tf": pa.array(tf, i64),
            "fp": pa.array(hm, i64),
        }).group_by(["term"]).aggregate(
            [("df", "sum"), ("tf", "sum"), ("fp", "sum")])
        return pa.table({"term": part.column("term"),
                         "df": part.column("df_sum"),
                         "tf": part.column("tf_sum"),
                         "fp": part.column("fp_sum")})

    agg = (docs.map_batches(term_partials, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("term")
           .aggregate(rd.aggregate.Sum("df", alias_name="df"),
                      rd.aggregate.Sum("tf", alias_name="tf"),
                      rd.aggregate.Sum("fp", alias_name="fp")))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"term": pa.array([], s),
                             "df": pa.array([], i64),
                             "tf": pa.array([], i64),
                             "posting_fp": pa.array([], i64)})
        return pa.table({
            "term": t.column("term"),
            "df": t.column("df"),
            "tf": t.column("tf"),
            "posting_fp": pa.array(
                t.column("fp").to_numpy(zero_copy_only=False)
                % _FP_MOD, i64)})

    return (agg.map_batches(finish, batch_format="pyarrow",
                            zero_copy_batch=True)
            .sort(["df", "tf", "term"],
                  descending=[True, True, False]).limit(k))


def inverted_index_sql(k: int = 50) -> str:
    from ..functions.sketch import splitmix64_subquery
    subq = splitmix64_subquery(
        "doc_id", "(SELECT DISTINCT doc_id FROM documents)")
    return rf"""
    WITH tok AS (SELECT doc_id,
                        unnest(regexp_extract_all(text, '\S+')) AS term
                 FROM documents),
         td AS (SELECT term, doc_id, COUNT(*) AS tf
                FROM tok GROUP BY 1, 2),
         hh AS (SELECT key AS doc_id,
                       CAST(h % {_FP_MOD} AS BIGINT) AS hm
                FROM {subq} q),
         agg AS (SELECT td.term,
                        COUNT(*) AS df,
                        CAST(SUM(td.tf) AS BIGINT) AS tf,
                        CAST(SUM(hh.hm) % {_FP_MOD} AS BIGINT)
                            AS posting_fp
                 FROM td JOIN hh USING (doc_id)
                 GROUP BY 1)
    SELECT term, df, tf, posting_fp FROM agg
    ORDER BY df DESC, tf DESC, term
    LIMIT {k}
"""
