"""Query predicate, synonym expansion, score boost (SURVEY.md M4/M5/A6).

M4 — term predicate (reference doctest truth table,
/root/reference/pagerank.py:196-242 and the non-expanded variant
pagerank2.py:220-237): any positive term substring-present => True,
empty positive set => True, any negative ("-term") present => False
overriding everything.

M5 — synonym expansion. The reference loads GloVe via gensim at module
import (pagerank.py:13-16); gensim and the network are unavailable
in-sandbox, so ``SynonymExpander`` is a deterministic stub with the
same interface (term -> [(synonym, similarity)]) backed by a fixed
table, overridable by the caller. It is also usable as a stateful
map_batches class (table "loaded" once per actor in __init__ — the
ST1 actor-pool pattern; swap the stub loader for a real model load on
a cluster with the model available).

A6 — pagerank2's synonym score boost (pagerank2.py:171-201):
score(node) = new_n * (s_weight·[query match] + Σ sim^power per
synonym match) added to the rank before top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Deterministic stand-in for the GloVe neighborhoods (fixed similarity
# schedule mirrors most_similar's descending scores).
_DEFAULT_SYNONYMS: dict[str, list[tuple[str, float]]] = {
    "covid": [("coronavirus", 0.92), ("pandemic", 0.88), ("virus", 0.85),
              ("vaccine", 0.80), ("outbreak", 0.78)],
    "trump": [("president", 0.90), ("donald", 0.89), ("administration", 0.82),
              ("election", 0.80), ("impeachment", 0.76)],
    "security": [("defense", 0.91), ("cyber", 0.87), ("intelligence", 0.84),
                 ("military", 0.81), ("surveillance", 0.79)],
    "law": [("legal", 0.93), ("court", 0.88), ("justice", 0.85),
            ("statute", 0.80), ("constitution", 0.77)],
    "menu": [("m0", 0.95), ("index", 0.85), ("main", 0.80),
             ("home", 0.75), ("root", 0.70)],
}


def parse_terms(query: str) -> tuple[list[str], list[str]]:
    """-> (positive_terms, negative_terms) with '-' stripped."""
    pos, neg = [], []
    for t in query.split():
        if t.startswith("-"):
            neg.append(t[1:])
        else:
            pos.append(t)
    return pos, neg


def url_satisfies_query(url: str, query: str,
                        extra_terms: list[str] | None = None) -> bool:
    """Per-row M4 predicate (reference truth table, FIXTURES.md F4).

    ``extra_terms`` are pre-expanded synonyms folded in with the same
    positive/negative treatment the reference applies to expanded
    terms (pagerank.py:224-242).
    """
    terms = query.split() + list(extra_terms or [])
    satisfies = False
    num_pos = 0
    for t in terms:
        if not t.startswith("-"):
            num_pos += 1
            if t in url:
                satisfies = True
    if num_pos == 0:
        satisfies = True
    for t in terms:
        if t.startswith("-") and t[1:] in url:
            return False
    return satisfies


def satisfies_query_batch(names, query: str,
                          extra_terms: list[str] | None = None):
    """Vectorized M4 over an Arrow string array -> BooleanArray.

    One pc.match_substring per term — each a C-level scan, no Python
    per-row loop (the form the hot search path uses).
    """
    terms = query.split() + list(extra_terms or [])
    pos = [t for t in terms if not t.startswith("-")]
    neg = [t[1:] for t in terms if t.startswith("-")]
    n = len(names)
    if pos:
        sat = pa.array(np.zeros(n, dtype=bool))
        for t in pos:
            sat = pc.or_(sat, pc.match_substring(names, t))
    else:
        sat = pa.array(np.ones(n, dtype=bool))
    for t in neg:
        sat = pc.and_(sat, pc.invert(pc.match_substring(names, t)))
    return sat


class SynonymExpander:
    """Deterministic M5 expander (gensim stub; ST1 actor-pool shape).

    Driver-side: ``expander.expand_terms(query, topn)`` for predicate
    expansion; ``expander.most_similar(term, topn)`` mirrors gensim's
    KeyedVectors.most_similar return shape.
    As a map_batches class it expands a ``query`` column to an
    ``expanded_terms`` list column.
    """

    def __init__(self, table: dict | None = None):
        # On a real cluster this is the per-actor model load.
        self.table = dict(_DEFAULT_SYNONYMS if table is None else table)

    def most_similar(self, term: str, topn: int = 5):
        return list(self.table.get(term, []))[:topn]

    def expand_terms(self, query: str, topn: int = 5) -> list[str]:
        """Reference v1 expansion: per-term top-n synonyms appended as
        plain terms (pagerank.py:224-227); unknown terms expand to []."""
        out: list[str] = []
        for term in query.split():
            out.extend(s for s, _ in self.most_similar(term, topn))
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["expanded_terms"] = [
            self.expand_terms(q) for q in batch["query"]]
        return batch


def synonym_boost_batch(batch: pa.Table, query: str,
                        synonyms: list[tuple[str, float]],
                        s_weight: float = 0.03,
                        power: int = 30) -> pa.Table:
    """A6 (pagerank2.py:171-201): add new_n * w_weight to each rank.

    new_n counts predicate matches over [query] + 10 synonyms;
    w_weight accumulates s_weight for a query match and sim**power per
    synonym match. Vectorized: one match pass per term.
    """
    names = batch.column("node")
    new_n = np.zeros(batch.num_rows, dtype=np.float64)
    w_weight = np.zeros(batch.num_rows, dtype=np.float64)

    m = np.asarray(satisfies_query_batch(names, query))
    new_n += m
    w_weight += m * s_weight
    for syn, sim in synonyms[:10]:
        ms = np.asarray(satisfies_query_batch(names, syn))
        new_n += ms
        w_weight += ms * (sim ** power)

    boosted = batch.column("rank").to_numpy() + new_n * w_weight
    return batch.set_column(
        batch.schema.get_field_index("rank"), "rank", pa.array(boosted))
