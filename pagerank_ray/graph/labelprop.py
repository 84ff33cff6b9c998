"""Community label propagation (synchronous LPA, SURVEY.md §2.8).

Synchronous rounds over the UNDIRECTED graph: every node adopts the
most frequent label among its neighbors' PREVIOUS-round labels
(tiebreak: minimum label; isolated nodes keep their label). A fixed
round count (default 10, FIXTURES.md F5) gives exact reproducibility —
asynchronous LPA is scheduling-dependent, so the engine pins the
synchronous variant and the oracle matches it exactly.

The per-round exchange ships (dst_local, label) COUNT partials —
pre-aggregated per shard with np.unique before the all-to-all
(combiner-style partial aggregation), then merged + argmaxed on the
destination shard. ``lpa_commit`` is the synchronous barrier: all
shards compute next labels from the old state before any swap.
"""

from __future__ import annotations

import pyarrow as pa

import ray

from . import build as gb
from .actors import create_shards, kill_shards
from .components import _collect_labels
from .pagerank import _routed


def label_propagation(graph_dir: str, rounds: int = 10,
                      actors=None) -> pa.Table:
    """Returns (id, node, label) after ``rounds`` synchronous rounds."""
    meta = gb.read_meta(graph_dir)
    assert meta.get("undirected"), \
        "label_propagation requires a graph built with undirected=True"
    own = actors is None
    A = actors or create_shards(graph_dir, meta)[0]
    P = meta["num_parts"]
    try:
        ray.get([a.lpa_init.remote() for a in A])
        for _ in range(rounds):
            if P == 1:
                refs = [a.lpa_contribs.remote() for a in A]
            else:
                refs = [a.lpa_contribs.options(num_returns=P).remote()
                        for a in A]
            ray.get([A[k].lpa_apply.remote(_routed(refs, k, P))
                     for k in range(P)])
            ray.get([a.lpa_commit.remote() for a in A])
        return _collect_labels(A)
    finally:
        if own:
            kill_shards(A)
