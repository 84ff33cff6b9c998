"""Search over ranked nodes (SURVEY.md T1/T2, §3 stage 5).

Filter-then-sort-then-limit — distributed filter first so the sort
(the shuffle) only sees matching rows, the opposite of the reference's
full torch.topk-then-walk (/root/reference/pagerank.py:175-193) which
is the right trade single-node but not distributed.

Tiebreak: (rank desc, node asc) — documented deterministic order (the
reference inherits torch.topk's index-stable order instead).

``search`` reproduces v1 semantics (expanded predicate, pagerank.py:
191), ``search_boosted`` reproduces v2 (A6 score boost with the
non-expanded predicate for boosting and the expanded one for the final
filter, pagerank2.py:188,215).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ..functions.query import (SynonymExpander, satisfies_query_batch,
                               synonym_boost_batch)


def _to_ds(ranks) -> "rd.Dataset":
    if isinstance(ranks, pa.Table):
        return rd.from_arrow(ranks)
    return ranks


def search(ranks, query: str = "", max_results: int = 10,
           expander: SynonymExpander | None = None,
           expand: bool = True) -> pa.Table:
    """ranks: Dataset or Table with (node, rank). Returns top-k matches."""
    ds = _to_ds(ranks)
    extra = (expander or SynonymExpander()).expand_terms(query) \
        if expand and query else []

    def flt(t: pa.Table) -> pa.Table:
        return t.filter(satisfies_query_batch(t.column("node"), query,
                                              extra))

    out = (ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)
           .sort(["rank", "node"], descending=[True, False])
           .limit(max_results))
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def search_boosted(ranks, query: str = "", max_results: int = 10,
                   expander: SynonymExpander | None = None,
                   s_weight: float = 0.03, power: int = 30) -> pa.Table:
    """v2 search: boost ranks by synonym-match score, then filtered top-k."""
    ds = _to_ds(ranks)
    exp = expander or SynonymExpander()
    synonyms = []
    for term in query.split():
        synonyms.extend(exp.most_similar(term, topn=10))
    synonyms = synonyms[:10]
    extra = exp.expand_terms(query) if query else []

    def boost_then_filter(t: pa.Table) -> pa.Table:
        t = synonym_boost_batch(t, query, synonyms, s_weight, power)
        return t.filter(satisfies_query_batch(t.column("node"), query,
                                              extra))

    out = (ds.map_batches(boost_then_filter, batch_format="pyarrow",
                          zero_copy_batch=True)
           .sort(["rank", "node"], descending=[True, False])
           .limit(max_results))
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def format_results(table: pa.Table) -> list[str]:
    """Golden-log formatting shim (reference S3, pagerank.py:192)."""
    return [
        f"rank={i} pagerank={row['rank']:0.4e} url={row['node']}"
        for i, row in enumerate(table.to_pylist())
    ]
